"""SimHash fingerprints (Charikar) for near-duplicate detection.

A 32-bit SimHash over the canonical tokens: each token hashes to 32 bits
(md5-based, engine-portable); bit b of the fingerprint is 1 iff the majority
of tokens have bit b set. Near-duplicates = fingerprints within a small
Hamming distance.

Implementation is exploded-bit aggregation — tokens × 32 rows, summed with
map-side combine; the shuffle carries 32 longs per doc. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .minhash import _hash64

BITS = 32


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc SimHash: ``(doc, simhash)`` with a 32-bit fingerprint."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tok")
    )
    h = toks.withColumn("h", _hash64(F.col("tok"), 0))
    # For each bit: +1 if set else -1; majority vote = sign of the sum.
    bit_sums = h.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(BITS)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(BITS):
        sim = sim + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0)
    return bit_sums.select("doc", sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Blocking: split the fingerprint into ``max_hamming+1`` bands — any pair
    within the distance must agree exactly on ≥1 band (pigeonhole), so the
    join is an equi join on (band, band_bits), never O(N²).
    """
    sig = simhash64(df, text_col, id_col)
    bands = max_hamming + 1
    width = BITS // bands
    # Single-pass banding (array-of-structs + explode) and persist: a
    # union-of-selects would re-run the 32-aggregate signature build once
    # per band per join side (the recompute trap lsh_candidate_pairs
    # documents — 8x observed there).
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_bits"),
        )
        for i in range(bands)
    ]
    banded = (
        sig.select("doc", "simhash", F.explode(F.array(*band_structs)).alias("bk"))
        .select(
            "doc",
            "simhash",
            F.col("bk.band").alias("band"),
            F.col("bk.band_bits").alias("band_bits"),
        )
        .persist()
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    # Eagerly materialize the (tiny) pair result so the banded frame can be
    # unpersisted before returning — a leaked persist() lives in the
    # CacheManager forever and pollutes later jobs (see lsh_candidate_pairs).
    pairs = (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .localCheckpoint(eager=True)
    )
    banded.unpersist()
    return pairs
