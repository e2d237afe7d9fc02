"""Corpus fingerprinting / vocabulary / embedding-LSH queries (round 4).

North-star training-pipeline operators over `documents` and `embeddings`:
winnowing fingerprints (the SIGMOD'03 plagiarism/overlap primitive), corpus
bigram vocabulary (BPE/vocab-prep), signed-random-projection LSH signatures
and bucket-verified near-pairs (cosine LSH without all-pairs), and
equi-depth length deciles (length bucketing for packing/curriculum).

The reference has no text or embedding surface (SURVEY §2.8: string ops
stop at CASE labels); these extend the north-star set in BASELINE.json.
Every query is exact-oracle-checked: hashing is md5 (engine-portable),
embedding math is quantized-integer (order-independent), ties are broken
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.text import tokens
from .functions.winnow import (
    oracle_winnow_overlap_sql,
    oracle_winnow_sql,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from .queries import query
from .similarity.srp import (
    oracle_srp_signature_sql,
    quantize_embedding,
    srp_banded_pairs,
    srp_signature,
    srp_signs,
)

_NORM = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')"
)
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x != '')"

# ---------------------------------------------------------------------------
# q100 — winnowing fingerprints
# ---------------------------------------------------------------------------

_WK, _WW = 4, 5


@query("q100_winnow_fingerprints", oracle=oracle_winnow_sql(_WK, _WW))
def q100_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (k=4-gram hashes, window w=5) for every
    document — guarantees a shared fingerprint for any copied passage of
    ≥ k+w−1 tokens. Per-row k-gram hashing is a pure projection; the window
    minimum is one per-document window (single shuffle on doc_id); at
    100 TB the fingerprint SET (|docs|·O(len/w) rows of (id, 16-byte hash))
    is ~2/w of the token count — the standard winnowing density bound."""
    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(d, "doc_id", "text", k=_WK, w=_WW)


# ---------------------------------------------------------------------------
# q101 — corpus bigram vocabulary (top-k)
# ---------------------------------------------------------------------------

_TOPN = 50


@query(
    "q101_bigram_vocab",
    oracle=f"""
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT tk[i] || ' ' || tk[i + 1] AS bigram
      FROM (SELECT {_TOKS} AS tk FROM documents),
           UNNEST(range(1, len(tk))) AS u(i)
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT {_TOPN}
    """,
)
def q101_bigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{50} corpus bigrams — the first step of vocabulary/BPE-merge
    preparation. Bigrams are built from the STAGED token array (one
    regex pass per document, not per gram), exploded before the shuffle so
    only (bigram) strings move, counted with map-side partial aggregation,
    and top-k compiles to TakeOrderedAndProject (no global sort). Tie-break
    on the bigram string keeps the cut deterministic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tokens("text").alias("tk"))
    # Guard <2-token docs: F.sequence defaults to step -1 when start > stop,
    # so an unguarded sequence(1, size-1) on a 0/1-token doc yields [1, 0]
    # and element_at(tk, 0) throws INVALID_INDEX_OF_ZERO — same n≥k guard
    # as winnow.kgram_hashes_from_tokens.
    gram_idx = F.when(
        F.size("tk") >= 2, F.sequence(F.lit(1), F.size("tk") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigrams = toks.select(
        F.explode(
            F.transform(
                gram_idx,
                lambda i: F.concat(
                    F.element_at(F.col("tk"), i), F.lit(" "),
                    F.element_at(F.col("tk"), i + 1),
                ),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(_TOPN)
    )


# ---------------------------------------------------------------------------
# q102 / q103 — SRP (random-hyperplane) embedding LSH
# ---------------------------------------------------------------------------

_SRP_BITS, _SRP_DIM = 16, 64
_SRP_SIGNS = srp_signs(_SRP_BITS, _SRP_DIM)
_SRP_BANDS = 4
_SRP_TAU = 0.4


@query(
    "q102_srp_signatures",
    oracle=f"""
    SELECT vec_id, {oracle_srp_signature_sql(_SRP_SIGNS)} AS sig
    FROM embeddings
    """,
)
def q102_srp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit signed-random-projection signatures per embedding — the
    cosine-LSH analogue of SimHash (q30) for dense vectors. The hyperplane
    sign matrix is a deterministic md5-derived literal shared with the
    oracle; projections are exact int64 dot products over floor(x·10⁶)
    quantized components. Pure per-row projection: zero shuffle at any
    scale."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", srp_signature("embedding", _SRP_SIGNS).alias("sig"))


def _oracle_srp_pairs(signs=None, n_bands=None, tau=None) -> str:
    signs = signs if signs is not None else _SRP_SIGNS
    n_bands = n_bands if n_bands is not None else _SRP_BANDS
    tau = tau if tau is not None else _SRP_TAU
    dim = _SRP_DIM
    bw = len(signs) // n_bands
    mask = (1 << bw) - 1
    bands = ", ".join(str(b) for b in range(n_bands))
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> sa.q[i] * sb.q[i]))"
    na = f"list_sum(list_transform(range(1, {dim + 1}), i -> sa.q[i] * sa.q[i]))"
    nb = f"list_sum(list_transform(range(1, {dim + 1}), i -> sb.q[i] * sb.q[i]))"
    return f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(range(1, {dim + 1}),
                 i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                           AS BIGINT)) AS q,
             {oracle_srp_signature_sql(signs)} AS sig
      FROM embeddings
    ), bands AS (
      SELECT vec_id, b AS band, (sig >> (b * {bw})) & {mask} AS bval
      FROM s, UNNEST([{bands}]) AS t(b)
    ), cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, cosine_q FROM (
      SELECT a_id, b_id,
             CAST({dot} AS DOUBLE)
               / sqrt(CAST({na} AS DOUBLE))
               / sqrt(CAST({nb} AS DOUBLE)) AS cosine_q
      FROM cand JOIN s sa ON sa.vec_id = a_id JOIN s sb ON sb.vec_id = b_id)
    WHERE cosine_q >= {tau}
    """


@query("q103_srp_near_pairs", oracle=_oracle_srp_pairs())
def q103_srp_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-neighbour pairs: SRP-banded candidates (4 bands × 4
    bits — a pair is a candidate if ANY band of the 16-bit signature
    matches, the MinHash-LSH banding discipline applied to cosine space)
    verified by the EXACT quantized cosine ≥ 0.4. At 100 TB the candidate
    step is equi self-joins on (band, value) — never all-pairs — the
    id-pair distinct carries two bigints (vectors re-attach by id after),
    AQE splits skewed buckets, and the hot-bucket cap (inert here) drops
    degenerate mass."""
    e = load_table(spark, sf_dir, "embeddings")
    return srp_banded_pairs(
        e, "vec_id", "embedding", _SRP_SIGNS,
        n_bands=_SRP_BANDS, min_cosine=_SRP_TAU,
    )


# The PRODUCTION band configuration: 32-bit signatures in 4 bands of 8
# bits. Collision rate per band for unrelated vectors is 2^-8, so the
# candidate volume is ~4·n²/256 instead of q103's ~4·n²/16 — the knob the
# q103/srp docstrings document as data-dependent, pinned here as a
# certified query. Found the hard way: benching q103's 4-bit demo bands
# against a 10×-tiled sf1.0 corpus (20k vectors, every one with 9 exact
# duplicates) produced ~50M candidate pairs, each carrying two 512-byte
# quantized vectors through the verify joins — >80 GB of shuffle spill.
_SRP32_SIGNS = srp_signs(32, _SRP_DIM)
_SRP32_BANDS = 4


@query(
    "q229_srp_near_pairs_scaled",
    oracle=_oracle_srp_pairs(signs=_SRP32_SIGNS, n_bands=_SRP32_BANDS),
)
def q229_srp_near_pairs_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q103's SRP near-pair sweep under the PRODUCTION band width (4×8-bit
    bands from a 32-bit signature): same exact-verify semantics, same
    helper, but the per-band random-collision rate drops 16× (2⁻⁸ vs
    2⁻⁴), which is the difference between ~linear and quadratic candidate
    volume on a duplicate-heavy corpus. Recall at the τ=0.4 operating
    point is lower by design (banding recall curves steepen with band
    width); exact duplicates and very-high-cosine pairs still collide on
    every band. The certification corpus is small enough that the demo
    and production configurations are BOTH exactly oracle-checked — scale
    behavior is measured by the sf1.0 bench (BENCH_SF1_r08.json), where
    this variant replaces q103.

    Reference parity: same SRP family as q102/q103
    (`/root/reference/` has no vector ops; SURVEY §2.14 beyond-reference
    inventory)."""
    e = load_table(spark, sf_dir, "embeddings")
    return srp_banded_pairs(
        e, "vec_id", "embedding", _SRP32_SIGNS,
        n_bands=_SRP32_BANDS, min_cosine=_SRP_TAU,
    )


# ---------------------------------------------------------------------------
# q104 — equi-depth length deciles
# ---------------------------------------------------------------------------

@query(
    "q104_length_deciles",
    oracle="""
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM (
      SELECT n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents)
    GROUP BY decile
    ORDER BY decile
    """,
)
def q104_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth document-length deciles (bucket boundaries + counts) —
    the length-bucketing step before sequence packing / curriculum
    sampling. NTILE over a TOTAL order (n_chars, doc_id) makes bucket
    assignment deterministic across engines even on ties. The single
    unpartitioned window is the known serial point: at 100 TB you'd swap
    NTILE for approx_percentile boundaries (the documented approx path in
    q44/q81) — this query certifies the exact semantics."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        d.select("n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q119 — winnowing overlap pairs (MOSS)
# ---------------------------------------------------------------------------

_WSH = 2


@query(
    "q119_winnow_overlap_pairs",
    oracle=oracle_winnow_overlap_sql(_WK, _WW, _WSH),
)
def q119_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing ≥ 2 winnowing fingerprints with containment
    score — the MOSS overlap detector over q100's fingerprint sets. The
    candidate step is an inverted-index equi join on the fingerprint (never
    all-pairs); winnowing density (~2/w of grams) keeps the index small."""
    d = load_table(spark, sf_dir, "documents")
    return winnow_overlap_pairs(d, "doc_id", "text", k=_WK, w=_WW, min_shared=_WSH)


# ---------------------------------------------------------------------------
# q121 — ANN top-k with an EXACT oracle (SRP-cell partitioned search)
# ---------------------------------------------------------------------------

_ANN_K = 3
_ANN_CELL_BITS = 4  # low 4 signature bits partition the corpus into 16 cells


def _oracle_ann_topk() -> str:
    dim = _SRP_DIM
    mask = (1 << _ANN_CELL_BITS) - 1
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> sq.q[i] * sc.q[i]))"
    nq = f"list_sum(list_transform(range(1, {dim + 1}), i -> sq.q[i] * sq.q[i]))"
    nc = f"list_sum(list_transform(range(1, {dim + 1}), i -> sc.q[i] * sc.q[i]))"
    return f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(range(1, {dim + 1}),
                 i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                           AS BIGINT)) AS q,
             ({oracle_srp_signature_sql(_SRP_SIGNS)}) & {mask} AS cell
      FROM embeddings
    ), scored AS (
      SELECT sq.vec_id AS query_id, sc.vec_id AS neighbor_id,
             CAST({dot} AS DOUBLE)
               / sqrt(CAST({nq} AS DOUBLE))
               / sqrt(CAST({nc} AS DOUBLE)) AS cosine_q
      FROM s sq JOIN s sc
        ON sq.cell = sc.cell AND sq.vec_id <> sc.vec_id
      WHERE sq.vec_id % 100 = 0
    )
    SELECT query_id, neighbor_id, cosine_q, CAST(rk AS INT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine_q DESC, neighbor_id) AS rk
      FROM scored)
    WHERE rk <= {_ANN_K}
    """


@query("q121_ann_topk_exact", oracle=_oracle_ann_topk())
def q121_ann_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k with an EXACT cross-engine oracle — the deterministic
    counterpart to q49's IVF path (rows-only because k-means centroids are
    float/engine-specific). Here the coarse partition is the low
    {4} bits of the SRP signature (pure integer arithmetic, engine-exact),
    candidates are same-cell vectors only (the IVF probe shape: the query
    never scans the corpus, just its cell), and reranking is the exact
    quantized cosine with (score DESC, id) total order. Every stage —
    assignment, candidate join, rerank — is bit-reproducible, so the driver
    gate certifies the full ANN pipeline, not just its row count."""
    e = load_table(spark, sf_dir, "embeddings")
    mask = (1 << _ANN_CELL_BITS) - 1
    sigs = e.select(
        "vec_id",
        quantize_embedding("embedding").alias("q"),
        srp_signature("embedding", _SRP_SIGNS).bitwiseAND(F.lit(mask)).alias("cell"),
    ).withColumn(
        "nrm",
        F.sqrt(
            F.aggregate(
                F.transform("q", lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
        ),
    )
    qs = sigs.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("nq"),
        "cell",
    )
    corpus = sigs.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("qc"),
        F.col("nrm").alias("nc"),
        "cell",
    )
    dot = F.aggregate(
        F.zip_with("qq", "qc", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        qs.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_q", dot.cast("double") / F.col("nq") / F.col("nc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_q").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _ANN_K)
        .select("query_id", "neighbor_id", "cosine_q", "rk")
    )
