"""Product quantization (PQ) for compressed-domain nearest-neighbor search
(Jégou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): split each vector into ``m`` subvectors, quantize
every subvector against a ``k``-entry per-subspace codebook, and search by
ADC (asymmetric distance computation) — the query precomputes an m×k
lookup table of exact subspace distances and every corpus vector is scored
with m table lookups over its 1-byte codes.

This is the memory-side companion to the IVF cell path
(``similarity/ivf.py``): IVF prunes WHICH vectors are scanned, PQ shrinks
WHAT is scanned (64 floats → 8 codes = 32× smaller at m=8). At 100 TB the
codes table replaces the raw embedding column for first-pass retrieval and
candidates re-rank against the raw vectors.

Determinism contract (the repo's similarity discipline): vectors are
quantized to int64 at 1e6 (``srp.quantize_embedding`` — float32 widened to
double BEFORE scaling), the codebook entries are DETERMINISTIC corpus
anchors (md5-ordered ids — index metadata, like the IVF sampled
centroids), and every distance is an EXACT integer sum of squared int64
differences, so encoding, LUTs, ADC scores, and ranks are bit-identical
across runs, partitionings, and engines. Ties break toward the smaller
centroid index / neighbor id via struct ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .srp import quantize_embedding


def pq_codebook(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
) -> list[list[list[int]]]:
    """Train (sample) the PQ codebook: ``codebook[s][j]`` = quantized
    subvector ``j`` of subspace ``s``, taken from ``k`` deterministic
    corpus anchor vectors (md5-ordered ids — one tiny TakeOrdered +
    ≤k-row metadata collect, the documented index-build materialization
    point shared with ``ivf.build_ivf_index``)."""
    anchors = (
        df.select(
            F.col(id_col).alias("id"), quantize_embedding(vec_col).alias("q")
        )
        .orderBy(
            F.md5(F.concat(F.lit(f"pq:{seed}:"), F.col("id").cast("string"))),
            "id",
        )
        .limit(k)
        .collect()
    )
    if len(anchors) < k:
        raise ValueError(f"corpus has {len(anchors)} < k={k} vectors")
    dim = len(anchors[0]["q"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [[int(x) for x in r["q"][s * sub : (s + 1) * sub]] for r in anchors]
        for s in range(m)
    ]


def _codebook_df(spark, codebook: list[list[list[int]]]) -> DataFrame:
    """Codebook as a broadcastable ``(s, j, cvec)`` frame. m·k rows of
    index METADATA — a literal-inlined formulation (one expression per
    (s, j)) was measured COMPILE-bound: 15 s of analysis/codegen at any
    data size for m=8, k=16; the join formulation plans in milliseconds
    and scales to the k=256 codebooks real PQ uses (the
    ``ivf._assign_cells_broadcast`` rationale)."""
    rows = [
        (s, j, [int(x) for x in codebook[s][j]])
        for s in range(len(codebook))
        for j in range(len(codebook[s]))
    ]
    return spark.createDataFrame(rows, "s int, j int, cvec array<bigint>")


def _subspace_rows(
    df: DataFrame, id_col: str, vec_col: str, m: int, sub: int, out_id: str
) -> DataFrame:
    """Explode each vector into its ``m`` quantized subvectors →
    ``(out_id, s, subv)``."""
    q = quantize_embedding(vec_col)
    subs = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("s"),
                F.slice(q, s * sub + 1, sub).alias("subv"),
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col).alias(out_id), F.explode(subs).alias("x")).select(
        out_id, F.col("x.s").alias("s"), F.col("x.subv").alias("subv")
    )


_SQDIST = lambda a_col, b_col: F.aggregate(  # noqa: E731
    F.zip_with(a_col, b_col, lambda a, b: (a - b) * (a - b)),
    F.lit(0).cast("long"),
    lambda acc, x: acc + x,
)


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector → ``(id, codes array<int>)``: per subspace, the
    argmin-distance centroid index (tie → smaller index, via struct
    ordering). Broadcast join against the m·k codebook frame, then ONE
    map-side-combinable aggregate back to a row per id — the m·k-way
    blowup collapses before the exchange, so the shuffle carries one
    narrow row per vector."""
    m = len(codebook)
    sub = len(codebook[0][0])
    cb = F.broadcast(_codebook_df(df.sparkSession, codebook))
    sv = _subspace_rows(df, id_col, vec_col, m, sub, "id")
    d = sv.join(cb, "s").select(
        "id", "s", "j", _SQDIST(F.col("subv"), F.col("cvec")).alias("d")
    )
    per = d.groupBy("id").agg(
        *[
            F.min(
                F.when(
                    F.col("s") == s, F.struct(F.col("d"), F.col("j"))
                )
            ).alias(f"_c{s}")
            for s in range(m)
        ]
    )
    return per.select(
        "id", F.array(*[F.col(f"_c{s}")["j"] for s in range(m)]).alias("codes")
    )


def pq_adc_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebook: list[list[list[int]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: the per-query m×k LUT of exact subspace distances is a
    tiny (|queries|·m·k row) broadcast frame; every corpus code row joins
    its LUT entry by (s, code) and the per-(query, neighbor) sum — the
    asymmetric distance — reduces with map-side combine before its
    exchange. Returns ``(query_id, neighbor_id, adc_dist, rank)``;
    self-matches excluded; (dist, id) total order."""
    m = len(codebook)
    sub = len(codebook[0][0])
    cb = F.broadcast(_codebook_df(encoded.sparkSession, codebook))
    qsv = _subspace_rows(queries, id_col, vec_col, m, sub, "query_id")
    lut = qsv.join(cb, "s").select(
        "query_id", "s", "j", _SQDIST(F.col("subv"), F.col("cvec")).alias("d")
    )
    ccodes = encoded.select(
        "id", F.posexplode("codes").alias("s", "code")
    )
    scored = ccodes.join(
        F.broadcast(lut),
        (ccodes.s == lut.s)
        & (F.col("code") == F.col("j"))
        & (F.col("id") != F.col("query_id")),
    )
    sums = scored.groupBy(
        "query_id", F.col("id").alias("neighbor_id")
    ).agg(F.sum("d").alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return sums.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def rerank_shortlist(
    shortlist: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact quantized-L2 rerank of ``(query_id, neighbor_id)`` candidate
    pairs — the second stage of the PQ pipeline: only |shortlist| rows
    re-attach the RAW embedding column (by neighbor id — at 100 TB this
    is the point: the ADC scan read codes only), the exact integer
    distance is computed per pair, and top-``k`` survive per query with
    the (dist, id) total order."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_embedding(vec_col).alias("cq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_embedding(vec_col).alias("qq")
    )
    joined = shortlist.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
    dist = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", "neighbor_id", dist.alias("l2_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def exact_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact quantized-L2 top-k (the ground truth PQ recall is measured
    against): integer sum of squared int64 component differences — the
    same metric ADC approximates, bit-identical in any engine."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_embedding(vec_col).alias("cq"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize_embedding(vec_col).alias("qq")
    )
    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    dist = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", "neighbor_id", dist.alias("l2_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
