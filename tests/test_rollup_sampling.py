"""Invariant tests for hierarchical rollup, hash sampling, and approximate
aggregates (the 100 TB substitutes for exact distinct/percentile)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.operators.rollup import hierarchical_rollup
from bigdatafraude_ml_graphx_spark.operators.sampling import hash_sample


def test_rollup_day_equals_direct_aggregation(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = hierarchical_rollup(ev, "ts", ["event_type"], "value", ["hour", "day"])
    day = out.filter(F.col("level") == "day")
    direct = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(
        F.count("*").alias("n"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )
    # derived day counts/min/max must equal a direct day aggregation of raw rows
    diff = (
        day.select("event_type", "bucket_start", "n", "value_min", "value_max")
        .exceptAll(direct.select("event_type", "bucket_start", "n", "value_min", "value_max"))
    )
    assert diff.count() == 0
    assert day.count() == direct.count()


def test_rollup_counts_conserved_across_levels(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = hierarchical_rollup(ev, "ts", ["event_type"], "value", ["hour", "day"])
    totals = (
        out.groupBy("level").agg(F.sum("n").alias("rows")).collect()
    )
    raw = ev.count()
    assert {r["level"]: r["rows"] for r in totals} == {"hour": raw, "day": raw}


def test_rollup_rejects_misordered_levels(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        hierarchical_rollup(ev, "ts", [], "value", ["day", "hour"])


def test_hash_sample_consistent_and_sized(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s1 = hash_sample(li, ["l_orderkey", "l_linenumber"], "1800")
    s2 = hash_sample(li, ["l_orderkey", "l_linenumber"], "1800")
    n, total = s1.count(), li.count()
    assert n == s2.count()  # same keys every run
    assert 0.05 < n / total < 0.15  # ~9.4% nominal
    # monotone: a larger threshold strictly contains the smaller sample
    s_big = hash_sample(li, ["l_orderkey", "l_linenumber"], "3000")
    assert s1.exceptAll(s_big).count() == 0


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """approx_count_distinct / approx percentile are the documented scale
    path for q39/q44 — bound their error against the exact values."""
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact_d"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_d"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
    ).collect()[0]
    assert abs(row["approx_d"] - row["exact_d"]) <= 0.06 * row["exact_d"]
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.02 * row["exact_p50"]


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    """Each stratum is sampled near its own rate; unlisted strata are kept
    whole; two runs select identical keys."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        stratified_hash_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": "4000", "zh": "8000"}
    s1 = stratified_hash_sample(docs, ["doc_id"], "lang", rates)
    total = dict(docs.groupBy("lang").count().collect())
    kept = dict(s1.groupBy("lang").count().collect())
    # en ~25%, zh ~50% (wide tolerance: small strata), others exactly 100%
    assert 0.05 <= kept["en"] / total["en"] <= 0.5
    assert 0.2 <= kept["zh"] / total["zh"] <= 0.8
    for lang in set(total) - set(rates):
        assert kept[lang] == total[lang]
    s2 = stratified_hash_sample(docs, ["doc_id"], "lang", rates)
    assert s1.select("doc_id").exceptAll(s2.select("doc_id")).count() == 0
