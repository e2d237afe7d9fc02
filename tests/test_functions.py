"""Function-level tests: seeded rand determinism (F6), tag_events timestamps
(F7), deterministic aggregates under repartitioning, bucketize edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.functions.deterministic import davg, dsum
from bigdatafraude_ml_graphx_spark.operators import bucketize
from bigdatafraude_ml_graphx_spark.streaming import tag_events


def test_seeded_rand_deterministic(spark):
    """F.rand(seed) is reproducible given identical partitioning — the
    condition SURVEY §7.2 hard-part (4) pins: assert sizes/pinned seeds, not
    cross-partitioning memberships."""
    def sample():
        return (
            spark.range(0, 1000, 1, 4)
            .withColumn("r", F.rand(seed=7))
            .agg(F.sum("r"))
            .collect()[0][0]
        )

    assert sample() == sample()


def test_dsum_invariant_under_partitioning(spark, sf_dir):
    """The engine's core determinism claim: decimal-accumulated sums are
    bit-identical no matter how the data is partitioned."""
    li = load_table(spark, sf_dir, "lineitem")
    results = {
        li.repartition(n).agg(dsum("l_extendedprice", "s"), davg("l_discount", "a"))
        .collect()[0]
        for n in (1, 7, 32)
    }
    vals = {(r["s"], r["a"]) for r in results}
    assert len(vals) == 1


def test_plain_double_sum_is_why(spark, sf_dir):
    """Documenting the motivation: the NAIVE double sum is allowed to differ
    across partitionings (and on this data typically does in the last ulp) —
    if this ever becomes exactly stable Spark changed something interesting,
    but correctness never depends on it."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.repartition(1).agg(F.sum("l_extendedprice")).collect()[0][0]
    b = li.repartition(32).agg(F.sum("l_extendedprice")).collect()[0][0]
    assert a == pytest.approx(b, rel=1e-12)  # close, not necessarily equal


def test_bucketize(spark):
    df = spark.createDataFrame([(5.0,), (25.0,), (250.0,)], "x double")
    b = bucketize("x", [10, 100], ["low", "mid", "high"])
    got = [r["b"] for r in df.select(b.alias("b")).collect()]
    assert got == ["low", "mid", "high"]
    with pytest.raises(ValueError):
        bucketize("x", [10], ["only-one"])


def test_tag_events_null_safe_and_timestamped(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id long, value double")
    out = tag_events(df, fraud_when=F.col("value") > 1).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["value"] == 0.0  # coalesce null-fill (F4)
    assert by_id[1]["fraud_flag"] == 0 and by_id[2]["fraud_flag"] == 1
    assert all(r["processed_at"] is not None for r in out)  # F7
