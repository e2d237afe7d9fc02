"""Property tests for the round-4 corpus operators: winnowing fingerprints
(shared-substring guarantee, density bound) and SRP embedding LSH
(signature determinism, banding recall vs brute force)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.functions.winnow import winnow_fingerprints
from bigdatafraude_ml_graphx_spark.similarity.srp import (
    srp_banded_pairs,
    srp_signature,
    srp_signs,
)

K, W = 4, 5


def test_winnow_shared_passage_guarantee(spark):
    """Any copied passage of ≥ k+w−1 tokens forces ≥1 shared fingerprint."""
    passage = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 = k+w-1
    docs = spark.createDataFrame(
        [
            (1, f"one two three {passage} four five six"),
            (2, f"{passage} nine ten eleven twelve thirteen fourteen"),
            (3, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    fp = winnow_fingerprints(docs, "doc_id", "text", k=K, w=W)
    a = {r.fingerprint for r in fp.filter("doc_id = 1").collect()}
    b = {r.fingerprint for r in fp.filter("doc_id = 2").collect()}
    c = {r.fingerprint for r in fp.filter("doc_id = 3").collect()}
    assert a & b, "copied passage must share a fingerprint"
    assert not (a & c) and not (b & c), "unrelated doc must not collide"


def test_winnow_density_and_coverage(spark, sf_dir):
    """Fingerprints per doc ≤ full-window count, ≥ 1 for any doc with a gram."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = winnow_fingerprints(d, "doc_id", "text", k=K, w=W)
    per_doc = fp.groupBy("doc_id").count()
    n_docs_with_grams = (
        d.filter(F.size(F.split(F.col("text"), r"\s+")) >= K).count()
    )
    assert per_doc.count() == n_docs_with_grams
    # winnowing can never select more fingerprints than windows
    grams = d.select(
        "doc_id", (F.size(F.split(F.col("text"), r"\s+")) - K + 1).alias("g")
    )
    joined = per_doc.join(grams, "doc_id").filter(F.col("count") > F.col("g"))
    assert joined.count() == 0


def test_srp_signature_deterministic_and_equal_for_identical(spark):
    signs = srp_signs(16, 4)
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125, 1.0]), (2, [0.5, -0.25, 0.125, 1.0]),
         (3, [-0.5, 0.25, -0.125, -1.0])],
        ["vec_id", "embedding"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    sig = df.select("vec_id", srp_signature("embedding", signs).alias("s"))
    rows = {r.vec_id: r.s for r in sig.collect()}
    assert rows[1] == rows[2]
    # a vector and its negation flip every nonzero projection
    assert rows[1] != rows[3]
    # re-running yields identical signatures (no runtime RNG)
    rows2 = {r.vec_id: r.s for r in sig.collect()}
    assert rows == rows2


@pytest.mark.parametrize("tau", [0.4])
def test_srp_banding_finds_top_bruteforce_pair(spark, sf_dir, tau):
    """The banded candidate step must surface the single most-similar pair
    (recall@top1 of the LSH stage) and never emit a pair below tau."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    signs = srp_signs(16, 64)
    pairs = srp_banded_pairs(
        e, "vec_id", "embedding", signs, n_bands=4, min_cosine=tau
    ).collect()
    assert all(p.cosine_q >= tau for p in pairs)
    if pairs:
        best_banded = max(p.cosine_q for p in pairs)
        # brute-force the true top pair cosine (500 vectors — cheap locally)
        import itertools

        import numpy as np

        vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
                for r in e.collect()}
        best = max(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            for a, b in itertools.combinations(vecs.values(), 2)
        )
        # quantization shifts cosine by <1e-5; banding must catch the top pair
        assert best_banded >= best - 1e-4


def test_winnow_overlap_detects_copied_passage(spark):
    """A pair sharing a long copied passage surfaces with high containment;
    unrelated docs never pair."""
    from bigdatafraude_ml_graphx_spark.functions.winnow import winnow_overlap_pairs

    passage = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa"
    )
    docs = spark.createDataFrame(
        [
            (1, f"{passage} one two three four five six seven eight"),
            (2, f"zero nine ten {passage} eleven twelve thirteen"),
            (3, "entirely different content with no shared grams whatsoever "
                "lorem ipsum dolor sit amet consectetur adipiscing"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.doc_a, r.doc_b): (r.shared, r.containment)
        for r in winnow_overlap_pairs(docs, "doc_id", "text", min_shared=2).collect()
    }
    assert (1, 2) in pairs
    shared, containment = pairs[(1, 2)]
    assert shared >= 2 and containment > 0.3
    assert not any(3 in p for p in pairs)


def test_winnow_overlap_cap_equivalence_and_bound(spark):
    """Hot-fingerprint cap: inert on clean data (identical output), bounds
    the candidate explosion when one boilerplate passage is in every doc."""
    from bigdatafraude_ml_graphx_spark.functions.winnow import (
        winnow_overlap_pairs,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel"
    clean = spark.createDataFrame(
        [
            (1, f"one two three {passage} four five six"),
            (2, f"{passage} nine ten eleven twelve thirteen fourteen"),
            (3, "completely different words with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    uncapped = winnow_overlap_pairs(clean, "doc_id", "text", k=K, w=W, min_shared=1)
    capped = winnow_overlap_pairs(
        clean, "doc_id", "text", k=K, w=W, min_shared=1, max_df=2
    )
    assert {tuple(r) for r in uncapped.collect()} == {
        tuple(r) for r in capped.collect()
    }
    # adversarial: the same boilerplate in all 40 docs -> every shared
    # fingerprint is hot -> capped join emits nothing (a fingerprint in
    # everything has no discriminating power), uncapped goes quadratic
    adv = spark.createDataFrame(
        [(i, f"{passage} unique{i} word{i} tail{i} suffix{i}") for i in range(40)],
        ["doc_id", "text"],
    )
    blown = winnow_overlap_pairs(adv, "doc_id", "text", k=K, w=W, min_shared=1)
    bounded = winnow_overlap_pairs(
        adv, "doc_id", "text", k=K, w=W, min_shared=1, max_df=10
    )
    assert blown.count() == 40 * 39 // 2
    assert bounded.count() == 0


def test_bigram_vocab_survives_short_docs(spark, monkeypatch):
    """q101 must not throw INVALID_INDEX_OF_ZERO on 0/1-token documents
    (F.sequence counts DOWN when start > stop)."""
    from bigdatafraude_ml_graphx_spark import queries_corpus as qc
    from bigdatafraude_ml_graphx_spark.registry import QUERIES

    docs = spark.createDataFrame(
        [(1, ""), (2, "single"), (3, "two tokens"), (4, "a b a b")],
        ["doc_id", "text"],
    )
    monkeypatch.setattr(
        qc, "load_table", lambda _spark, _sf, _name: docs
    )
    rows = {
        (r.bigram, r.n)
        for r in QUERIES["q101_bigram_vocab"](spark, "ignored").collect()
    }
    assert ("a b", 2) in rows and ("two tokens", 1) in rows
