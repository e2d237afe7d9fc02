"""Misra-Gries distributed heavy-hitters: the two theorem guarantees the
q178 contract pins, exercised on adversarial skew and arbitrary
partitionings."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.operators.heavyhitters import (
    misra_gries_candidates,
)


def _check(spark, items, k, parts):
    df = spark.createDataFrame(
        [(x,) for x in items], "tok string"
    ).repartition(parts)
    cand = {
        r["item"]: r["mg_count"]
        for r in misra_gries_candidates(df, "tok", k=k).collect()
    }
    assert len(cand) <= k - 1
    n = len(items)
    exact = {}
    for x in items:
        exact[x] = exact.get(x, 0) + 1
    for item, c in exact.items():
        if k * c > n:  # true heavy hitter
            assert item in cand, f"HH {item} missing (freq {c}, n {n})"
            assert k * (c - cand[item]) <= n, (item, c, cand[item])
    return cand


def test_mg_one_dominant_item_many_partitions(spark):
    rng = random.Random(11)
    items = ["hot"] * 3000 + [f"noise{rng.randint(0, 5000)}" for _ in range(7000)]
    rng.shuffle(items)
    for parts in (1, 3, 13):
        cand = _check(spark, items, k=16, parts=parts)
        assert "hot" in cand


def test_mg_several_hitters_and_uniform_tail(spark):
    rng = random.Random(23)
    items = []
    for i in range(5):
        items += [f"hh{i}"] * (800 - 50 * i)
    items += [f"t{rng.randint(0, 2000)}" for _ in range(4000)]
    rng.shuffle(items)
    _check(spark, items, k=12, parts=7)


def test_mg_uniform_no_hitters_is_still_bounded(spark):
    items = [f"u{i % 500}" for i in range(5000)]  # nobody exceeds n/k
    cand = _check(spark, items, k=8, parts=5)
    assert len(cand) <= 7
