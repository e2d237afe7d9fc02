"""MinHash signatures + banded LSH for near-duplicate detection at scale.

Pipeline: shingle → k min-hashes per doc → band the signature → bucket-join.
All hashing is md5-based (``hash_i(s) = int(md5(i ‖ ':' ‖ s)[:15 hex])``), so
signatures are engine-portable and stable across runs/versions — unlike
Spark's ``xxhash64``, whose seeds are JVM-specific, md5 exists everywhere the
oracle does.

Scale shape: the explode produces |docs|·|shingles| rows but the k mins are
computed with map-side partial aggregation, so the shuffle carries only
|docs|·k longs. The LSH bucket join is an equi join on (band, band_hash) —
the O(N²) comparison never happens; AQE splits hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import _doc_shingles


def _hash64(col, salt: int):
    """Portable 60-bit hash: first 15 hex chars of md5(salt:value)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col)), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature as ``num_hashes`` columns ``mh_00..``.

    Docs with no shingles (shorter than n words) get NULL signature columns.
    """
    # Staged-token shingling (see ngram.word_ngrams note: inlining the
    # tokenizer into the explode lambda costs O(tokens²) regex work).
    # distinct=False: MIN is duplicate-invariant, so the shingle dedup is
    # unnecessary — and a map-side array_distinct is a net LOSS here, not
    # a win (measured r13: within-doc duplicate shingles are 0.12% of the
    # stream, so the extra hash-set pass costs more than the duplicate
    # hash evaluations it saves). The only exchange carries k longs per
    # doc after map-side partial MIN.
    shingled = _doc_shingles(df, text_col, id_col, n, distinct=False)
    aggs = [
        F.min(_hash64(F.col("shingle"), i)).alias(f"mh_{i:02d}")
        for i in range(num_hashes)
    ]
    return shingled.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Banded LSH: docs sharing any band of their signature become a candidate
    pair ``(doc_a, doc_b, n_shared_bands)``. rows/band = num_hashes/bands.

    The band explosion is a SINGLE pass over the signatures (array-of-structs
    + ``explode``) and the bucket frame is persisted before the self-join —
    a union of per-band selects would recompute the full shingle→minhash
    lineage once per band per join side (observed 8× recompute, 73 s → ~7 s
    at sf0.1).

    HOT-BUCKET CAP: a bucket holding B docs emits B·(B-1)/2 pairs, so ONE
    degenerate bucket (e.g. every empty/boilerplate doc shares the NULL-
    signature band) goes quadratic at scale no matter how good the bands
    are. Buckets larger than ``max_bucket`` are dropped before the join —
    a bucket that popular has no discriminating power anyway (its members
    collide with everything; true near-dup pairs inside it still share
    their OTHER, selective bands). The cap is ``skew.drop_hot_buckets``
    (groupBy partial-agg + broadcast anti join — the count-window
    formulation sorted every partition and cost +1.3 s at sf0.1). Below
    the cap the output is IDENTICAL to the uncapped operator
    (equivalence + adversarial bound tested in tests/test_dedup_cap.py).

    EAGER + NON-RECOVERABLE: the returned frame is ``localCheckpoint``-ed —
    calling this function runs the full job NOW, and the result lives in
    executor block storage (not fault-tolerant: executor loss makes it
    unrecomputable; re-call the function in that case). This is the
    deliberate trade for cache hygiene: the intermediate bucket frame is
    persisted for the self-join and MUST be unpersisted before returning
    (a leaked ``persist()`` lives in the CacheManager forever and polluted
    every later job in round 2's bench), which requires the result to be
    materialized first. Compose lazily AROUND this operator, not through it.
    """
    rows_per_band = num_hashes // bands
    band_structs = []
    for band in range(bands):
        cols = [
            F.col(f"mh_{i:02d}")
            for i in range(band * rows_per_band, (band + 1) * rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(band).alias("band"),
                F.md5(F.concat_ws("|", *[c.cast("string") for c in cols])).alias(
                    "band_key"
                ),
            )
        )
    from ..operators.skew import drop_hot_buckets

    # Persist the BANDED frame (pre-cap): the cap's count pass and both
    # self-join sides all read it, and its lineage reaches back through
    # the full shingle→minhash shuffle.
    exploded = (
        signatures.select("doc", F.explode(F.array(*band_structs)).alias("bk"))
        .select("doc", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
        .persist()
    )
    buckets = drop_hot_buckets(exploded, ["band", "band_key"], max_bucket)

    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
        .localCheckpoint(eager=True)
    )
    exploded.unpersist()
    return pairs


def lsh_probe_pairs(
    index_sigs: DataFrame,
    probe_sigs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Incremental-ingest LSH: candidate pairs between a PROBE batch and an
    existing INDEX, ``(doc_probe, doc_index, n_shared_bands)`` — the daily
    crawl-ingestion shape, where a new batch is deduplicated against a
    standing corpus WITHOUT re-pairing the corpus with itself.

    Scale shape: both sides band-explode once (``bands`` rows per doc) and
    meet in a single equi join on ``(band, band_key)`` — work is
    probe-size × collision rate, never index × index. At 100 TB the index
    side's signatures/bands are a stored artifact (computed once at
    ingest); recomputing them here stands in for that read. The hot-bucket
    cap applies to the INDEX side only (a bucket that popular has no
    discriminating power; true near-dups still meet in their other,
    selective bands — the ``lsh_candidate_pairs`` argument), while probe
    docs emit at most ``bands`` rows each and need no cap.

    CAP ASYMMETRY vs the self-join: because only the index SPLIT is
    capped, a bucket over ``max_bucket`` in the full corpus but under it
    on the index side yields pairs the capped self-join would drop — the
    cross-pair equivalence to ``lsh_candidate_pairs`` holds exactly only
    while every shared bucket is under the cap on BOTH formulations
    (pinned both ways in tests/test_round9.py: exact equivalence below
    the cap, and the intended divergence above it).

    Probe and index ids may overlap (e.g. a re-ingested batch): a doc
    meeting ITSELF across the two sides is filtered out (``doc_probe !=
    doc_index``) rather than reported as a trivially-perfect match.

    The banding expressions deliberately mirror ``lsh_candidate_pairs``
    verbatim (kept separate so this addition leaves that operator's
    certified lineage untouched).
    """
    from ..operators.skew import drop_hot_buckets

    rows_per_band = num_hashes // bands

    def _banded(sigs: DataFrame) -> DataFrame:
        structs = []
        for band in range(bands):
            cols = [
                F.col(f"mh_{i:02d}")
                for i in range(band * rows_per_band, (band + 1) * rows_per_band)
            ]
            structs.append(
                F.struct(
                    F.lit(band).alias("band"),
                    F.md5(
                        F.concat_ws("|", *[c.cast("string") for c in cols])
                    ).alias("band_key"),
                )
            )
        return sigs.select("doc", F.explode(F.array(*structs)).alias("bk")).select(
            "doc",
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )

    # The cap's count pass and the join both read the index bands; persist
    # so the signature lineage runs once (unpersisted before returning —
    # the lsh_candidate_pairs cache-hygiene contract).
    ib = _banded(index_sigs).persist()
    index_buckets = drop_hot_buckets(ib, ["band", "band_key"], max_bucket)
    pairs = (
        _banded(probe_sigs)
        .alias("p")
        .join(
            index_buckets.alias("i"),
            (F.col("p.band") == F.col("i.band"))
            & (F.col("p.band_key") == F.col("i.band_key"))
            & (F.col("p.doc") != F.col("i.doc")),
        )
        .groupBy(
            F.col("p.doc").alias("doc_probe"), F.col("i.doc").alias("doc_index")
        )
        .agg(F.count("*").alias("n_shared_bands"))
        .localCheckpoint(eager=True)
    )
    ib.unpersist()
    return pairs
