"""Hot-bucket cap tests for the LSH/SimHash banding joins.

One degenerate band bucket (every empty/boilerplate doc sharing a
signature) emits B·(B-1)/2 candidate pairs — quadratic blowup at scale.
The cap must (a) change NOTHING below the threshold (equivalence on clean
data) and (b) bound the candidate count on an adversarial fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from bigdatafraude_ml_graphx_spark.dedup.simhash import simhash_near_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def clean_docs(spark):
    # distinct-ish docs: no band bucket grows past a handful of members
    rows = [
        (i, f"alpha beta gamma delta {i} epsilon zeta eta theta word{i % 7}")
        for i in range(40)
    ] + [(100 + i, f"alpha beta gamma delta {i} epsilon zeta eta theta word{i % 7}")
         for i in range(5)]  # 5 exact near-dups of the first 5
    return _docs(spark, rows)


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    # 60 identical docs — every band bucket holds all 60 → 1770 pairs uncapped
    return _docs(spark, [(i, "same text every single time") for i in range(60)])


def test_lsh_cap_equivalence_on_clean_data(spark, clean_docs):
    sigs = minhash_signatures(clean_docs, num_hashes=16).localCheckpoint()
    uncapped = lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    capped = lsh_candidate_pairs(sigs, num_hashes=16, bands=4, max_bucket=10)
    a = {tuple(r) for r in uncapped.collect()}
    b = {tuple(r) for r in capped.collect()}
    assert a == b and len(a) >= 5


def test_lsh_cap_bounds_adversarial_bucket(spark, adversarial_docs):
    sigs = minhash_signatures(adversarial_docs, num_hashes=16).localCheckpoint()
    capped = lsh_candidate_pairs(sigs, num_hashes=16, bands=4, max_bucket=10)
    assert capped.count() == 0  # every bucket holds 60 > 10 → dropped
    uncapped = lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    assert uncapped.count() == 60 * 59 // 2  # proves the blowup the cap kills


def test_simhash_cap_equivalence_and_bound(spark, clean_docs, adversarial_docs):
    uncapped = simhash_near_pairs(clean_docs, max_hamming=3)
    capped = simhash_near_pairs(clean_docs, max_hamming=3, max_bucket=10)
    assert {tuple(r) for r in uncapped.collect()} == {
        tuple(r) for r in capped.collect()
    }
    adv = simhash_near_pairs(adversarial_docs, max_hamming=3, max_bucket=10)
    assert adv.count() == 0


def test_cap_leaves_no_persisted_blocks(spark, clean_docs):
    # the cap's window must not break the unpersist hygiene contract
    lsh_candidate_pairs(
        minhash_signatures(clean_docs, num_hashes=16), num_hashes=16, bands=4
    )
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    leaked = [r for r in jmap.values() if "localCheckpoint" not in r.toString()]
    assert not leaked


# --- q151 verification-join bounds (candidate_pair_shingle_stats) -------


def test_pair_stats_restricts_to_candidates_and_matches_bruteforce(
    spark, clean_docs
):
    """The verification join must (a) answer ONLY the candidate pairs even
    when many other corpus pairs overlap, and (b) match per-pair
    brute-force Jaccard statistics exactly below the cap."""
    from bigdatafraude_ml_graphx_spark.dedup.ngram import (
        _doc_shingles,
        candidate_pair_shingle_stats,
    )

    sh = _doc_shingles(clean_docs, "text", "doc_id", 3, distinct=True)
    cand = spark.createDataFrame(
        [(0, 100), (1, 101), (2, 37)], "doc_a long, doc_b long"
    )
    out = {
        (r.doc_a, r.doc_b): (r.sh_n, r.na, r.nb)
        for r in candidate_pair_shingle_stats(sh, cand, max_df=10_000).collect()
    }
    assert set(out) == {(0, 100), (1, 101), (2, 37)}  # candidates only
    by_doc = {}
    for r in sh.collect():
        by_doc.setdefault(r.doc, set()).add(r.shingle)
    for (a, b), (sh_n, na, nb) in out.items():
        assert sh_n == len(by_doc[a] & by_doc[b])
        assert (na, nb) == (len(by_doc[a]), len(by_doc[b]))
    assert out[(0, 100)][0] > 0  # the near-dups genuinely share shingles


def test_pair_stats_cap_bounds_adversarial_boilerplate(
    spark, adversarial_docs
):
    """One boilerplate shingle shared by B docs must never emit B·(B−1)/2
    self-join rows: above the DF cap the shingle is dropped on the JOIN
    INPUT, so the adversarial corpus produces zero verification rows
    (docs lose all their shingles → they leave the sizes frame too)."""
    from bigdatafraude_ml_graphx_spark.dedup.ngram import (
        _doc_shingles,
        candidate_pair_shingle_stats,
    )

    sh = _doc_shingles(adversarial_docs, "text", "doc_id", 3, distinct=True)
    cand = spark.createDataFrame([(0, 1), (2, 3)], "doc_a long, doc_b long")
    capped = candidate_pair_shingle_stats(sh, cand, max_df=10)
    assert capped.count() == 0
    # below-cap sanity: with a generous cap the same pairs verify fully
    full = candidate_pair_shingle_stats(sh, cand, max_df=1_000)
    rows = {(r.doc_a, r.doc_b): r for r in full.collect()}
    assert set(rows) == {(0, 1), (2, 3)}
    for r in rows.values():
        assert r.sh_n == r.na == r.nb  # identical docs → full overlap
