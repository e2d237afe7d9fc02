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
