"""Similarity search over embedding columns (``array<float>``).

Two paths:

* ``cosine_topk`` — exact brute-force top-k for a set of query vectors.
  Implemented as a broadcast of the (small) query set against the corpus,
  with the dot product computed positionally and accumulated as quantized
  int64 (same engine-portable determinism trick as PageRank — see
  ``graph/pagerank.py``). The per-group top-k is a ranking window, which
  Spark executes without a global sort.

* ``embedding_near_dup_pairs`` — corpus×corpus near-duplicate pairs above a
  cosine threshold, LSH-bucketed by random-hyperplane SimHash so the join is
  an equi join on bucket bits instead of O(N²). The hyperplanes derive from
  md5 hashing (deterministic, engine-portable, no stored model).

At 100 TB the brute-force path is the per-query fallback; the bucketed path
is the scale path — both avoid any driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QSCALE = 1e12  # quantization for dot/norm accumulation (|dot| < ~4e3 ⇒ exact)


def _pos_products(vec_a: Column, vec_b: Column) -> Column:
    """Element-wise products as an array<double>, positions zipped."""
    return F.zip_with(vec_a, vec_b, lambda x, y: x.cast("double") * y.cast("double"))


def _qsum_array(arr: Column) -> Column:
    """Order-independent exact sum of an array<double>: quantize each element
    to int64 at ``_QSCALE``, integer-sum via aggregate, back to double."""
    q = F.transform(arr, lambda x: F.floor(x * F.lit(_QSCALE) + F.lit(0.5)).cast("long"))
    total = F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return total.cast("double") / F.lit(_QSCALE)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns ``(query_id, neighbor_id, cosine, rank)``; self-matches excluded;
    ties broken by neighbor id for determinism.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))

    joined = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    dot = _qsum_array(_pos_products(F.col("cvec"), F.col("qvec")))
    norm_c = F.sqrt(_qsum_array(_pos_products(F.col("cvec"), F.col("cvec"))))
    norm_q = F.sqrt(_qsum_array(_pos_products(F.col("qvec"), F.col("qvec"))))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (dot / (norm_c * norm_q)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signs(plane: int, dim: int) -> list[float]:
    """±1 hyperplane components derived from md5(plane:j) — computed ONCE in
    Python (hashlib.md5 ≡ any engine's md5) and inlined as literals, so no
    per-row hashing happens and the oracle SQL can embed the same constants.
    """
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[:15], 16) & 1
        else -1.0
        for j in range(dim)
    ]


def _hyperplane_bit(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of ⟨vec, h_plane⟩ — deterministic random-hyperplane LSH with
    no stored model."""
    # One-call list literal (array<double>) instead of dim F.lit round
    # trips — identical Literal values, ~dim× less py4j construction time
    # (optimization r13; the SRP/IVF builders got the same treatment).
    signs = F.lit(hyperplane_signs(plane, dim))
    dot = _qsum_array(F.zip_with(vec, signs, lambda x, s: x.cast("double") * s))
    return (dot >= 0).cast("int")


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a, id_b, cosine)`` with
    cosine ≥ ``threshold``, bucketed by ``num_planes``-bit hyperplane SimHash
    (pairs must share the full bucket — recall trades off with num_planes)."""
    sig = F.concat_ws(
        "",
        *[_hyperplane_bit(F.col(vec_col), p, dim).cast("string") for p in range(num_planes)],
    )
    # Norm per VECTOR, not per pair: a bucket of b rows yields b·(b−1)/2
    # candidates, and computing both norms inside the pair projection ran
    # THREE array folds per candidate instead of one (the dot). On a
    # duplicate-heavy corpus the buckets are exactly where the dups land,
    # so the per-pair constant is the whole game (r8 sf1.0 sweep: 32× at
    # 10× data before this). Same IEEE expression on the same vector →
    # bit-identical cosines, oracle text unchanged.
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sig.alias("bucket"),
    ).withColumn(
        "nrm", F.sqrt(_qsum_array(_pos_products(F.col("vec"), F.col("vec"))))
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    dot = _qsum_array(_pos_products(F.col("a.vec"), F.col("b.vec")))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
