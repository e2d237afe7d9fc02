"""IVF ANN query declarations.

q49 is the raw IVF result — since r11 EXACTLY oracle-checked (the centroid
sample hashes vec_id, which renders identically in any engine, and all
similarity arithmetic is quantized-int64 + IEEE ops — see ``_ivf_oracle``);
q140 wraps the SAME pipeline in an
oracle-checkable ERROR CONTRACT (the q81/q151 discipline applied to ANN):
recall@k of the IVF answer against the exact brute-force top-k, emitted as
integer counts plus a pinned ``recall ≥ bound`` boolean — so the driver
gate certifies the ANN pipeline end-to-end, not just its row count."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query
from .similarity.cosine import cosine_topk
from .similarity.ivf import build_ivf_index, ivf_topk


def _qdot_sql(va: str, vb: str, dim: int = 64) -> str:
    """DuckDB mirror of the engine's quantized-int64 dot product (q31's)."""
    prods = (
        f"[CAST(floor(CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE)"
        f" * 1e12 + 0.5) AS BIGINT) for i in range(1, {dim + 1})]"
    )
    return f"(CAST(CAST(list_sum({prods}) AS BIGINT) AS DOUBLE) / 1e12)"


def _ivf_assign_cte(
    n_cells: int = 16, dim: int = 64, seed: int = 42, where: str = ""
) -> str:
    """CTE body (``ord``/``cent``/``asg0``/``asg``) mirroring the IVF index
    build: seeded-sample centroids keyed on md5(seed||vec_id) and
    nearest-cell assignment as argmin over (−sim, cell) — shared by the
    q49 oracle and the q252 cell-diagnostics oracle. ``where`` restricts
    the SOURCE corpus (centroid sample AND assignment) — the q271
    incremental-ingest oracle trains on the base slice only; the default
    renders byte-identical SQL to the pre-parameterized form, so the
    certified q49/q252/q260 oracle strings are unchanged."""
    src = f"(SELECT * FROM embeddings WHERE {where})" if where else "embeddings"
    sim_vc = (
        f"{_qdot_sql('e.embedding', 'c.cvec', dim)}"
        f" / (sqrt({_qdot_sql('e.embedding', 'e.embedding', dim)})"
        f" * sqrt({_qdot_sql('c.cvec', 'c.cvec', dim)}))"
    )
    return f"""ord AS (
      SELECT vec_id, embedding,
             ROW_NUMBER() OVER (
               ORDER BY md5('{seed}' || CAST(vec_id AS VARCHAR)), vec_id) AS rn
      FROM {src}),
    cent AS (SELECT CAST(rn - 1 AS BIGINT) AS cell, embedding AS cvec
             FROM ord WHERE rn <= {n_cells}),
    asg0 AS (SELECT e.vec_id AS id, e.embedding AS vec, c.cell,
                    {sim_vc} AS sim
             FROM {src} e CROSS JOIN cent c),
    asg AS (SELECT id, vec, cell FROM (
              SELECT id, vec, cell,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY sim DESC, cell ASC) AS arn
              FROM asg0) WHERE arn = 1)"""


def _ivf_oracle(
    k: int = 5, n_probe: int = 4, n_cells: int = 16, dim: int = 64,
    seed: int = 42, nq: int = 10,
) -> str:
    """Full SQL mirror of the IVF pipeline (VERDICT r10 #4 — graduates q49
    from rows-only): the shared assignment CTE plus n_probe nearest cells
    per query and the probed-cells top-k. Every similarity uses the same
    quantized-int64 dot product as the q31 oracle, so the doubles are
    bit-identical: exact integer dot / (sqrt · sqrt) in the engine's
    operand order."""

    def qdot(va: str, vb: str) -> str:
        return _qdot_sql(va, vb, dim)

    sim_qc = (
        f"{qdot('q.qvec', 'c.cvec')} / (sqrt({qdot('q.qvec', 'q.qvec')})"
        f" * sqrt({qdot('c.cvec', 'c.cvec')}))"
    )
    cos_nq = (
        f"{qdot('vec', 'qvec')} / (sqrt({qdot('vec', 'vec')})"
        f" * sqrt({qdot('qvec', 'qvec')}))"
    )
    return f"""
    WITH {_ivf_assign_cte(n_cells, dim, seed)},
    q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
          WHERE vec_id < {nq}),
    pc0 AS (SELECT q.query_id, q.qvec, c.cell, {sim_qc} AS sim
            FROM q CROSS JOIN cent c),
    probes AS (SELECT query_id, qvec, cell FROM (
                 SELECT query_id, qvec, cell,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY sim DESC, cell ASC) AS prn
                 FROM pc0) WHERE prn <= {n_probe}),
    cand AS (SELECT p.query_id, p.qvec, a.id, a.vec
             FROM asg a JOIN probes p USING (cell)
             WHERE a.id != p.query_id),
    scored AS (SELECT query_id, id AS neighbor_id, {cos_nq} AS cosine
               FROM cand),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC,
                                                  neighbor_id ASC) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


@query("q49_ivf_topk", oracle=_ivf_oracle())
def q49_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: 16-cell coarse quantizer, 4-probe search — the
    similarity-search scale path (probes shrink the scanned corpus ~4×
    here, ~n_cells/n_probe× in general; at 100 TB the cells are partition
    keys and probes become pruned scans). Exactly oracle-checked since r11:
    the centroid sample hashes vec_id (engine-portable) and every float op
    downstream of the exact integer dot products is IEEE-deterministic, so
    the DuckDB mirror reproduces assignment, probing, and ranking
    bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = build_ivf_index(emb, n_cells=16)
    # Materialize the assignment ONCE (the standing-index shape the
    # docstrings describe for 100 TB — there it is a bucketed table keyed
    # by cell): the nearest-cell argmax is a higher-order-function
    # expression Spark evaluates interpreted, so leaving it lazy re-runs
    # 16 quantized dots per corpus row in every consumer stage (measured
    # 10.2 s → 3.5 s on the sf1.0 probe phase).
    assigned = assigned.localCheckpoint(eager=True)
    return ivf_topk(
        assigned, centroids, emb.filter(F.col("vec_id") < 10), k=5, n_probe=4
    )


_RC_K = 5
_RC_PROBE = 4
_RC_CELLS = 16
_RC_PCT = 25  # pinned recall floor (percent); empirical: 32% at sf0.001,
# 40% at sf0.01/sf0.1 with the 16-cell/4-probe sampled quantizer — the
# floor leaves headroom for data regeneration, like q151's 0.30 vs 0.235


# Fixed CAP on the verification query sample. A pure 1% sample grows with
# the corpus, so the brute-force exact side of the recall contracts is
# O(n²/100) — measured 32× at the 10× sf1.0 bench (BENCH_SF1_r08.json).
# `vec_id % 100 = 0 AND vec_id < 100·64` keeps at most 64 queries at ANY
# scale: the exact side is O(64·n) and the range predicate is
# min/max-prunable at the scan. At the certification scales the cap is
# INERT (max vec_id is 20/200/2 000 at sf0.001/0.01/0.1 — at most 21
# sampled ids, all < 6 400), so driver results are bit-identical; it
# binds only on 10×+ corpora, where it converts the contract from
# quadratic to linear.
_RC_QCAP = 64


@query(
    "q140_ivf_recall_contract",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(*) * {_RC_K} AS BIGINT) AS n_exact,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < {100 * _RC_QCAP}
    """,
)
def q140_ivf_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN recall contract (graduates q49 from rows-only, VERDICT r5
    item 6): run the 16-cell / 4-probe IVF search AND the exact
    brute-force top-k (q31's quantized-cosine machinery — deterministic in
    any engine) over the same 1%-sample query set, count the overlap, and
    pin ``recall ≥ {_RC_PCT}%`` as an integer comparison
    (100·hits ≥ pct·exact — no float in the verdict). The oracle knows the
    exact-side counts (n_exact = k per query — corpus ≫ k) and asserts the
    contract boolean; the hit count itself is centroid-dependent and
    stays engine-side, exactly like q81's sketch bounds. At 100 TB the
    brute-force verification runs on this same bounded query sample while
    production traffic takes the probe path alone. The sample is capped
    at {_RC_QCAP} queries (see _RC_QCAP) and checkpointed once — it feeds
    the probe search, the exact side, and the n_queries aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = (
        emb.filter(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 100 * _RC_QCAP)
        )
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    centroids, assigned = build_ivf_index(emb, n_cells=_RC_CELLS)
    # Standing-index materialization — same rationale as q49: the inline
    # nearest-cell expression is interpreted per consumer stage otherwise.
    assigned = assigned.localCheckpoint(eager=True)
    approx = ivf_topk(
        assigned, centroids, qs, k=_RC_K, n_probe=_RC_PROBE
    ).select("query_id", "neighbor_id")
    exact = cosine_topk(emb, qs, k=_RC_K).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)  # read twice: count + hit join
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return (
        qs.agg(F.count("*").cast("long").alias("n_queries"))
        .crossJoin(exact.agg(F.count("*").cast("long").alias("n_exact")))
        .crossJoin(hits.agg(F.count("*").cast("long").alias("n_hits")))
        .select(
            "n_queries",
            "n_exact",
            (100 * F.col("n_hits") >= _RC_PCT * F.col("n_exact")).alias(
                "recall_ok"
            ),
        )
    )


_CSCALE = 1_000_000  # 1e-6 quantization — see graph/pagerank.py determinism note


@query(
    "q72_embedding_centroids",
    oracle=f"""
    WITH pe AS (SELECT label, i - 1 AS pos,
                       CAST(embedding[i] AS DOUBLE) AS v
                FROM embeddings,
                     unnest(range(1, len(embedding) + 1)) AS t(i))
    SELECT label, pos,
           CAST(SUM(CAST(floor(v * {_CSCALE} + 0.5) AS BIGINT)) AS DOUBLE)
             / {_CSCALE} / COUNT(*) AS centroid_val,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM pe GROUP BY label, pos
    """,
)
def q72_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, dimension-wise: posexplode → one
    (label, pos) aggregation — the distributed mean-vector shape (class
    prototypes, cluster refinement, drift monitoring). The shuffle carries
    |labels|·dim partial sums, independent of corpus size; sums are
    quantized-int64 so results are bit-identical across partitionings and
    engines (double sums are not — see graph/pagerank.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    return pe.groupBy("label", F.col("pos").cast("long").alias("pos")).agg(
        (
            F.sum(F.floor(F.col("v") * _CSCALE + F.lit(0.5)).cast("long")).cast(
                "double"
            )
            / _CSCALE
            / F.count("*")
        ).alias("centroid_val"),
        F.count("*").alias("n_vectors"),
    )


_PQ_M = 8
_PQ_K = 16
_PQ_SHORTLIST = 100
_PQ_TOPK = 5
_PQ_PCT = 30  # pinned recall floor (percent); empirical 50-80% across
# sf0.001/0.01/0.1 with the m=8 / k=16 sampled codebook + 100-shortlist


@query(
    "q172_pq_recall_contract",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(*) * {_PQ_TOPK} AS BIGINT) AS n_exact,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < {100 * _RC_QCAP}
    """,
)
def q172_pq_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization retrieval with the q140 error-contract
    discipline, exercising the FULL production pipeline: PQ-encode the
    corpus (64 floats → 8 codes, 32× smaller), ADC-scan for a
    {100}-candidate shortlist (m table lookups per corpus row — the
    compressed-domain first pass), exact-rerank the shortlist against the
    raw vectors, and pin recall@{5} of the reranked result vs the global
    exact top-{5} at ≥ {30}% (integer comparison). Codebook = md5-sampled
    corpus anchors (deterministic index metadata); every distance is an
    exact integer sum of squared quantized differences, so the whole
    pipeline is bit-reproducible and only the recall margin is data-
    dependent. At 100 TB the ADC scan reads ONLY the codes column — the
    raw embeddings are touched for |shortlist| rows per query."""
    from .similarity.pq import (
        exact_l2_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
        rerank_shortlist,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb, m=_PQ_M, k=_PQ_K)
    enc = pq_encode(emb, cb).localCheckpoint(eager=True)
    # The query sample is consumed 4× (ADC shortlist, exact rerank,
    # exact top-k, final n_queries agg); bare, each consumption re-scanned
    # the full embeddings parquet (9 opens measured at r7,
    # REPLAY_AUDIT_r07.json — ~5 legitimate). Checkpoint it once. The
    # _RC_QCAP bound (inert at certification scales) keeps the exact
    # rerank side O(cap·n) instead of O(n²/100) — the q140 sf1.0 finding.
    qs = (
        emb.filter(
            (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 100 * _RC_QCAP)
        )
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    shortlist = pq_adc_topk(enc, qs, cb, k=_PQ_SHORTLIST).select(
        "query_id", "neighbor_id"
    )
    # exact rerank touches raw vectors for |shortlist| rows only
    reranked = rerank_shortlist(shortlist, emb, qs, k=_PQ_TOPK).select(
        "query_id", "neighbor_id"
    )
    exact = exact_l2_topk(emb, qs, k=_PQ_TOPK).select(
        "query_id", "neighbor_id"
    ).localCheckpoint(eager=True)
    hits = exact.join(reranked, ["query_id", "neighbor_id"], "left_semi")
    return (
        qs.agg(F.count("*").cast("long").alias("n_queries"))
        .crossJoin(exact.agg(F.count("*").cast("long").alias("n_exact")))
        .crossJoin(hits.agg(F.count("*").cast("long").alias("n_hits")))
        .select(
            "n_queries",
            "n_exact",
            (100 * F.col("n_hits") >= _PQ_PCT * F.col("n_exact")).alias(
                "recall_ok"
            ),
        )
    )
