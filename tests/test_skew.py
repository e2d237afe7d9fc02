"""Skew-mitigation correctness: salted operations must equal their unsalted
counterparts exactly; bucketed joins must plan without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the classic hot-key distribution.
    return (
        spark.range(20_000)
        .select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )


def test_salted_agg_equals_plain(skewed):
    plain = {
        (r["k"]): (r["s"], r["c"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"))
        .collect()
    }
    salted = {
        (r["k"]): (r["sum_v"], r["count_v"])
        for r in salted_agg(
            skewed, ["k"], {"v": "sum"} | {}, salt_factor=8
        )
        .join(
            salted_agg(skewed, ["k"], {"v": "count"}, salt_factor=8), "k"
        )
        .collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]  # counts exact
        assert plain[k][0] == pytest.approx(salted[k][0], rel=1e-12)


def test_salted_agg_rejects_non_reaggregatable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"v": "avg"})


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(0, 20_000, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    plain = skewed.join(dim, "k").agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    ).collect()[0]
    salted = salted_join(skewed, dim, "k", salt_factor=8).agg(
        F.count("*").alias("n"), F.sum("attr").alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"] and plain["s"] == salted["s"]


def test_salted_join_left_preserves_unmatched(spark, skewed):
    dim = spark.createDataFrame([(0, "hot")], "k long, name string")
    out = salted_join(skewed, dim, "k", salt_factor=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("name").isNull()).count() == skewed.filter(
        F.col("k") != 0
    ).count()
