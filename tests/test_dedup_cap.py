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
