"""IVF ANN query declarations.

q49 is the raw IVF result (rows-only — the nearest-centroid argmax is
engine-specific float geometry); q140 wraps the SAME pipeline in an
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


@query("q49_ivf_topk")
def q49_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: 16-cell coarse quantizer, 4-probe search — the
    similarity-search scale path (probes shrink the scanned corpus ~4×
    here, ~n_cells/n_probe× in general; at 100 TB the cells are partition
    keys and probes become pruned scans)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids, assigned = build_ivf_index(emb, n_cells=16)
    return ivf_topk(
        assigned, centroids, emb.filter(F.col("vec_id") < 10), k=5, n_probe=4
    )


_RC_K = 5
_RC_PROBE = 4
_RC_CELLS = 16
_RC_PCT = 25  # pinned recall floor (percent); empirical: 32% at sf0.001,
# 40% at sf0.01/sf0.1 with the 16-cell/4-probe sampled quantizer — the
# floor leaves headroom for data regeneration, like q151's 0.30 vs 0.235


@query(
    "q140_ivf_recall_contract",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(*) * {_RC_K} AS BIGINT) AS n_exact,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 100 = 0
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
    production traffic takes the probe path alone."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    centroids, assigned = build_ivf_index(emb, n_cells=_RC_CELLS)
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
