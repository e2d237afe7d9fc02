"""Unit tests for temporal joins (as-of, keyed range, bucketed interval).

Crafted fixtures with hand-computed answers; oracle parity for q50-q53 is in
test_oracle_parity.py. Plan shape asserts keep the scale properties honest:
the as-of join must be a single shuffle, the keyed range join must not plan a
nested loop.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from bigdatafraude_ml_graphx_spark.operators.temporal import (
    asof_join,
    bucketed_interval_join,
    range_join,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def test_asof_join_picks_latest_at_or_before(spark):
    probe = spark.createDataFrame(
        [(1, _ts(10), 100, 1.0), (1, _ts(3), 101, 2.0), (2, _ts(5), 102, 3.0)],
        _SCHEMA,
    )
    build = spark.createDataFrame(
        # user 1: builds at minutes 2, 10 (tie: two rows at minute 10)
        [(1, _ts(2), 200, 10.0), (1, _ts(10), 201, 20.0), (1, _ts(10), 202, 30.0)],
        _SCHEMA,
    )
    out = asof_join(
        probe,
        build,
        key="user_id",
        probe_ts="ts",
        build_ts="ts",
        attach={"b_id": "event_id", "b_val": "value"},
        tie_break="event_id",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 3
    # probe at minute 10: both builds at minute 10 qualify; max event_id wins
    assert rows[100]["b_id"] == 202 and rows[100]["b_val"] == 30.0
    # probe at minute 3: only the minute-2 build precedes it
    assert rows[101]["b_id"] == 200
    # user 2 has no builds: nulls
    assert rows[102]["b_id"] is None and rows[102]["b_val"] is None


def test_asof_join_null_build_value_not_backfilled(spark):
    # The as-of build row has a legitimately NULL value column; a per-column
    # last(ignorenulls) would backfill it from the OLDER build row, mixing
    # values across build rows. The struct-packed attach must return the
    # as-of row's actual (NULL) value alongside its other columns.
    probe = spark.createDataFrame([(1, _ts(10), 100, 1.0)], _SCHEMA)
    build = spark.createDataFrame(
        [(1, _ts(2), 200, 99.0), (1, _ts(8), 201, None)], _SCHEMA
    )
    out = asof_join(
        probe,
        build,
        key="user_id",
        probe_ts="ts",
        build_ts="ts",
        attach={"b_id": "event_id", "b_val": "value"},
        tie_break="event_id",
    )
    row = out.collect()[0]
    assert row["b_id"] == 201  # the true as-of row...
    assert row["b_val"] is None  # ...and ITS value, not minute-2's 99.0


def test_asof_join_null_probe_key_gets_nulls(spark):
    # SQL equi-join semantics: NULL key never matches NULL key. A NULL-keyed
    # probe row must get NULL attachments even when NULL-keyed build rows
    # exist; NULL-keyed build rows must never attach to anything.
    probe = spark.createDataFrame(
        [(None, _ts(10), 100, 1.0), (1, _ts(10), 101, 1.0)], _SCHEMA
    )
    build = spark.createDataFrame(
        [(None, _ts(2), 200, 5.0), (1, _ts(2), 201, 7.0)], _SCHEMA
    )
    out = asof_join(
        probe, build, "user_id", "ts", "ts", {"b_id": "event_id"}, "event_id"
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[100]["b_id"] is None  # NULL key: no match, ever
    assert rows[101]["b_id"] == 201


def test_asof_join_single_shuffle(spark):
    probe = spark.createDataFrame([(1, _ts(1), 1, 1.0)], _SCHEMA)
    build = spark.createDataFrame([(1, _ts(0), 2, 2.0)], _SCHEMA)
    out = asof_join(
        probe, build, "user_id", "ts", "ts", {"b_id": "event_id"}, "event_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_range_join_keeps_zero_match_probe(spark):
    probe = spark.createDataFrame([(1, _ts(30), 1, 1.0), (2, _ts(30), 2, 1.0)], _SCHEMA)
    build = spark.createDataFrame(
        [(1, _ts(25), 10, 5.0), (1, _ts(29), 11, 7.0), (1, _ts(31), 12, 9.0)],
        _SCHEMA,
    )
    joined = range_join(
        probe,
        build,
        key="user_id",
        lower=F.col("b.ts") > F.col("p.ts") - F.expr("INTERVAL 10 MINUTES"),
        upper=F.col("b.ts") <= F.col("p.ts"),
        how="left",
    )
    agg = (
        joined.groupBy(F.col("p.event_id").alias("pid"))
        .agg(F.count("b.event_id").alias("n"))
        .collect()
    )
    counts = {r["pid"]: r["n"] for r in agg}
    assert counts == {1: 2, 2: 0}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_bucketed_interval_join_exact_containment(spark):
    probe = spark.createDataFrame(
        [(1, _ts(5), 1, 1.0), (2, _ts(45), 2, 1.0)], _SCHEMA
    )
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(10)), (11, _ts(40), _ts(50)), (12, _ts(6), _ts(7))],
        StructType(
            [
                StructField("ival_id", LongType()),
                StructField("lo", TimestampNTZType()),
                StructField("hi", TimestampNTZType()),
            ]
        ),
    )
    out = bucketed_interval_join(
        probe, intervals, probe_ts="ts", build_lo="lo", build_hi="hi", bucket_seconds=300
    )
    pairs = sorted((r["event_id"], r["ival_id"]) for r in out.collect())
    assert pairs == [(1, 10), (2, 11)]


def test_bucketed_interval_join_left_keeps_unmatched_probe(spark):
    import pytest

    probe = spark.createDataFrame(
        # minute 5 is inside [0, 10); minute 30 matches nothing
        [(1, _ts(5), 1, 1.0), (2, _ts(30), 2, 1.0)], _SCHEMA
    )
    intervals = spark.createDataFrame(
        [(10, _ts(0), _ts(10))],
        StructType(
            [
                StructField("ival_id", LongType()),
                StructField("lo", TimestampNTZType()),
                StructField("hi", TimestampNTZType()),
            ]
        ),
    )
    out = bucketed_interval_join(
        probe, intervals, "ts", "lo", "hi", bucket_seconds=300, how="left"
    )
    pairs = sorted(
        (r["event_id"], r["ival_id"]) for r in out.collect()
    )
    # unmatched probe row survives with a NULL build side (pre-fix it was
    # silently dropped by the post-join residual filter)
    assert pairs == [(1, 10), (2, None)]
    with pytest.raises(ValueError, match="inner"):
        bucketed_interval_join(
            probe, intervals, "ts", "lo", "hi", bucket_seconds=300, how="full"
        )
