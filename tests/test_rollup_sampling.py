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


def test_hash_bucket_injective_encoding(spark):
    """('a', NULL) vs ('a',)-style and delimiter-straddling composites must
    hash differently (naive concat_ws collided both classes)."""
    from bigdatafraude_ml_graphx_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [("a-b", "c"), ("a", "b-c"), ("a", None), ("a-Z", None), ("a", "Z")],
        "k1 string, k2 string",
    )
    buckets = [
        r["b"]
        for r in df.select(
            hash_bucket([F.col("k1"), F.col("k2")], digits=8).alias("b")
        ).collect()
    ]
    assert len(set(buckets)) == len(buckets)


def test_hash_sample_matches_duckdb_on_tricky_keys(spark):
    """The Spark predicate and the DuckDB oracle predicate must agree on
    NULLs, delimiter characters, and non-ASCII — byte-for-byte hex/md5."""
    import duckdb
    import pandas as pd

    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        hash_sample,
        oracle_hash_sample_predicate,
    )

    pdf = pd.DataFrame(
        {
            "k1": ["a-b", "a", "a", None, "héllo", "z" * 50],
            "k2": ["c", "b-c", None, "x", "wörld", "-"],
            "v": [1, 2, 3, 4, 5, 6],
        }
    )
    df = spark.createDataFrame(pdf)
    kept_spark = sorted(
        r["v"] for r in hash_sample(df, ["k1", "k2"], "8000").select("v").collect()
    )
    pred = oracle_hash_sample_predicate(["k1", "k2"], "8000")
    con = duckdb.connect()
    con.register("t", pdf)
    kept_duck = sorted(
        r[0] for r in con.execute(f"SELECT v FROM t WHERE {pred}").fetchall()
    )
    assert kept_spark == kept_duck


def test_stratified_threshold_validation(spark):
    """Uppercase thresholds are normalized (not silently wrong); garbage is
    rejected. Pre-fix, an uppercase default like 'A000' dropped buckets
    a000-ffff because ASCII 'A' < 'a'."""
    import pytest as _pytest

    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        stratified_hash_sample,
    )

    df = spark.createDataFrame([("x", "en")] * 4, "doc_id string, lang string")
    upper = stratified_hash_sample(df, ["doc_id"], "lang", {}, default_hex="FFFF")
    lower = stratified_hash_sample(df, ["doc_id"], "lang", {}, default_hex="ffff")
    assert upper.count() == lower.count() == 4  # ffff keeps ~everything
    with _pytest.raises(ValueError, match="neither hex"):
        stratified_hash_sample(df, ["doc_id"], "lang", {}, default_hex="00zz")
    with _pytest.raises(ValueError, match="neither hex"):
        stratified_hash_sample(df, ["doc_id"], "lang", {"en": "xyzt"})


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


def test_weighted_sample_race_probability(spark):
    """P(weight-9 key wins the race vs weight-1 key) = 9/10 exactly; over
    200 independent trials (trial id in the draw key) the empirical win rate
    must land in a generous binomial band around 0.9."""
    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(t, key, 9 if key == "heavy" else 1)
            for t in range(200) for key in ("heavy", "light")]
    df = spark.createDataFrame(rows, "trial long, key string, w int")
    winners = weighted_sample_topk(
        df, key_cols=["key"], weight_col="w", k=1, group_cols=["trial"]
    )
    n_heavy = winners.filter(F.col("key") == "heavy").count()
    assert winners.count() == 200
    assert 160 <= n_heavy <= 198, n_heavy  # ~Binomial(200, 0.9)


def test_weighted_sample_rejects_unbounded_weights(spark):
    """The replication explode is Σ weights rows — the operator must FAIL,
    not silently blow up, when a weight exceeds the cap (executor-side
    raise_error, so the check is distributed and lazy)."""
    import pytest

    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, 10_000_000)], "id long, w long"
    )
    out = weighted_sample_topk(df, ["id"], "w", k=1, max_weight=100)
    # Spark 4 surfaces executor raise_error as SparkRuntimeException; older
    # clients as Py4JJavaError — match on the message, not the wrapper type
    with pytest.raises(Exception, match="max_weight"):
        out.collect()
    with pytest.raises(ValueError):
        weighted_sample_topk(df, ["id"], "w", k=1, max_weight=0)


def test_weighted_sample_ignores_nonpositive_weights(spark):
    """w <= 0 means zero draws: those rows must never be sampled. (Spark's
    sequence(1, w) counts DOWN for w <= 0 — the operator filters first so
    Spark matches SQL range(1, w+1) semantics.)"""
    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, 3), (2, 0), (3, -2), (4, 1)], "id long, w long"
    )
    ids = {r["id"] for r in weighted_sample_topk(df, ["id"], "w", k=10).collect()}
    assert ids == {1, 4}


def test_weighted_sample_ares_scale_path(spark):
    """A-Res variant: no explode, deterministic, same inclusion behavior in
    the aggregate — the weight-9 key beats weight-1 ~90% of trials."""
    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        weighted_sample_ares,
    )

    rows = [(t, key, 9.0 if key == "heavy" else 1.0)
            for t in range(200) for key in ("heavy", "light")]
    df = spark.createDataFrame(rows, "trial long, key string, w double")
    winners = weighted_sample_ares(
        df, key_cols=["key"], weight_col="w", k=1, group_cols=["trial"]
    )
    assert winners.count() == 200
    n_heavy = winners.filter(F.col("key") == "heavy").count()
    assert 160 <= n_heavy <= 198, n_heavy
    # deterministic across invocations; zero-weight rows excluded
    a = sorted(map(tuple, winners.collect()))
    b = sorted(map(tuple, weighted_sample_ares(
        df, key_cols=["key"], weight_col="w", k=1, group_cols=["trial"]
    ).collect()))
    assert a == b
    # float weights, no row replication: plan has no Generate/explode
    plan = winners._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan


def test_weighted_sample_deterministic_and_exhaustive(spark):
    from bigdatafraude_ml_graphx_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, 1 + i % 5) for i in range(30)], "id long, w int"
    )
    a = weighted_sample_topk(df, ["id"], "w", k=10).collect()
    b = weighted_sample_topk(df, ["id"], "w", k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    ranks = sorted(r["sample_rank"] for r in a)
    assert ranks == list(range(1, 11))
    # k >= population: everything is sampled, each exactly once
    full = weighted_sample_topk(df, ["id"], "w", k=100)
    assert full.count() == 30
    assert full.select("id").distinct().count() == 30
