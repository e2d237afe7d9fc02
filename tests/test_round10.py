"""Round-10 pins: ADVICE items on lsh_probe_pairs (self-pair guard,
cap-asymmetry divergence) and tooling robustness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _sigs(spark, rows):
    from bigdatafraude_ml_graphx_spark.dedup.minhash import minhash_signatures

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return minhash_signatures(df, num_hashes=8).localCheckpoint(eager=True)


def test_probe_pairs_overlapping_ids_emit_no_self_pairs(spark):
    """A re-ingested batch (probe ids overlap index ids) must not report a
    doc as a duplicate of ITSELF — only genuine cross-doc collisions."""
    from bigdatafraude_ml_graphx_spark.dedup.minhash import lsh_probe_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta"
    sigs = _sigs(spark, [(1, text), (2, text), (3, text)])
    pairs = lsh_probe_pairs(sigs, sigs, num_hashes=8, bands=4).collect()
    assert pairs, "identical docs must still collide cross-doc"
    assert all(r["doc_probe"] != r["doc_index"] for r in pairs)
    got = {(r["doc_probe"], r["doc_index"]) for r in pairs}
    assert got == {(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b}


def test_probe_pairs_cap_divergence_above_max_bucket(spark):
    """The cross-pair equivalence to the capped self-join holds only BELOW
    the cap: a bucket over max_bucket in the full corpus but under it on
    the index split yields probe pairs the self-join drops. Pin the
    intended divergence so it's a documented property, not an assumption."""
    from bigdatafraude_ml_graphx_spark.dedup.minhash import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
    )

    text = "one two three four five six seven eight nine ten"
    index = _sigs(spark, [(1, text), (2, text)])
    probe = _sigs(spark, [(3, text)])
    corpus = _sigs(spark, [(1, text), (2, text), (3, text)])

    # Full corpus: every band bucket holds 3 docs > cap=2 → self-join
    # drops the bucket entirely.
    full = lsh_candidate_pairs(corpus, num_hashes=8, bands=4, max_bucket=2)
    assert full.count() == 0

    # Index split: bucket holds 2 docs ≤ cap → kept; the probe doc pairs
    # with both — pairs the capped self-join does not produce.
    got = {
        (r["doc_probe"], r["doc_index"]): r["n_shared_bands"]
        for r in lsh_probe_pairs(
            index, probe, num_hashes=8, bands=4, max_bucket=2
        ).collect()
    }
    assert got == {(3, 1): 4, (3, 2): 4}


def test_flushed_cache_prunes_stale_siblings(tmp_path, sf_dir):
    """ADVICE r9: a data regeneration must not leak the previous
    fingerprint's /tmp cache dir forever — building the new key prunes
    stale siblings of the same (sf_dir, flush config)."""
    import os
    import shutil

    from bigdatafraude_ml_graphx_spark.streaming.events import (
        _flush_cache_dir,
    )

    staged = str(tmp_path / "sfcopy")
    os.makedirs(staged)
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(staged, "events.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    types = ("purchase", "pruneprobe")
    k1 = _flush_cache_dir(staged, None, types)
    os.makedirs(k1, exist_ok=True)
    open(os.path.join(k1, "marker"), "w").write("stale")

    part = dst
    if os.path.isdir(dst):
        part = next(
            os.path.join(r, f)
            for r, _, fs in os.walk(dst)
            for f in fs
            if f.endswith(".parquet")
        )
    os.utime(part, ns=(os.stat(part).st_mtime_ns + 10**9,) * 2)

    k2 = _flush_cache_dir(staged, None, types)
    assert k2 != k1
    assert not os.path.exists(k1), "stale sibling cache dir not pruned"
    # Unrelated flush configs share nothing: their dirs survive.
    other = _flush_cache_dir(staged, None, ("view",))
    assert os.path.dirname(other) == os.path.dirname(k2)


def test_srp_probe_pairs_matches_self_join_cross_subset(spark, sf_dir):
    """srp_probe_pairs(index, probe) must produce EXACTLY the cross-side
    subset of srp_banded_pairs' answer (same signs, bands, threshold)
    while every shared bucket is under the cap on both formulations —
    the q231-style no-loss contract, in embedding space."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.similarity.srp import (
        srp_banded_pairs,
        srp_probe_pairs,
        srp_signs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    signs = srp_signs(16, 64)
    full = {
        (r["a_id"], r["b_id"]): r["cosine_q"]
        for r in srp_banded_pairs(
            e, "vec_id", "embedding", signs, n_bands=4, min_cosine=0.3
        ).collect()
    }
    cross = {
        k: v
        for k, v in full.items()
        if (k[0] % 10 == 0) != (k[1] % 10 == 0)
    }
    got = {
        (min(r["id_probe"], r["id_index"]), max(r["id_probe"], r["id_index"])): r[
            "cosine_q"
        ]
        for r in srp_probe_pairs(
            e.filter("vec_id % 10 != 0"),
            e.filter("vec_id % 10 = 0"),
            "vec_id",
            "embedding",
            signs,
            n_bands=4,
            min_cosine=0.3,
        ).collect()
    }
    # Same PAIRS exactly; cosine values may differ in the last ulp because
    # the two operators divide by the norms in different orders (probe-first
    # vs lower-id-first) — q237's oracle mirrors the probe-first order, so
    # the driver gate pins the exact values; this contract pins the SET.
    assert set(got) == set(cross)
    assert all(abs(got[k] - cross[k]) <= 1e-12 * abs(cross[k]) for k in cross)


def test_srp_probe_pairs_overlapping_ids_emit_no_self_pairs(spark):
    from bigdatafraude_ml_graphx_spark.similarity.srp import (
        srp_probe_pairs,
        srp_signs,
    )

    vec = [0.5] * 64
    df = spark.createDataFrame(
        [(1, vec), (2, vec), (3, vec)], "vec_id long, embedding array<float>"
    )
    signs = srp_signs(16, 64)
    rows = srp_probe_pairs(
        df, df, "vec_id", "embedding", signs, n_bands=4, min_cosine=0.9
    ).collect()
    assert rows, "identical vectors must collide cross-id"
    assert all(r["id_probe"] != r["id_index"] for r in rows)


def test_duplicate_shingle_fraction_small_corpus(spark):
    """Two docs sharing one trigram exactly; a third disjoint doc."""
    from bigdatafraude_ml_graphx_spark import registry as q
    import os
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # trigrams: abg, bgd
            (2, "alpha beta gamma epsilon"),    # trigrams: abg, bge
            (3, "one two three four"),          # trigrams: ott, ttf
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")) \
     .withColumn("source", F.lit("t")) \
     .withColumn("n_chars", F.length("text")) \
     .coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc"]: (r["n_sh"], r["n_dup"], round(r["dup_frac"], 3))
        for r in q.QUERIES["q238_duplicate_shingle_fraction"](spark, d).collect()
    }
    assert out == {1: (2, 1, 0.5), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}
