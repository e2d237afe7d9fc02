"""Semantic unit tests for the event-analytics queries (q77-q80) on
hand-built micro-datasets — the oracle-parity gate checks exact values on the
real table; these pin the EDGE semantics (gap boundary, funnel ordering,
triangle canonicality) that random data may never exercise.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_sessionization_gap_boundary(spark):
    from bigdatafraude_ml_graphx_spark.queries_analytics import _GAP_S

    assert _GAP_S == 1800
    rows = [
        (1, _t("2024-01-01 10:00:00"), 1, "view"),
        # exactly 1800 s later -> SAME session (strict > breaks)
        (2, _t("2024-01-01 10:30:00"), 1, "view"),
        # 1801 s after event 2 -> NEW session
        (3, _t("2024-01-01 11:00:01"), 1, "view"),
    ]
    df = _ev(spark, rows)
    from pyspark.sql import Window

    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(win)
    flagged = df.select(
        "user_id",
        "ts",
        F.when(
            lag_ts.isNull()
            | (
                F.timestamp_diff(
                    "SECOND",
                    F.date_trunc("second", lag_ts),
                    F.date_trunc("second", F.col("ts")),
                )
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sessions = flagged.agg(F.sum("new_s")).collect()[0][0]
    assert sessions == 2  # events 1+2 together, event 3 alone


def test_funnel_requires_order(spark):
    from bigdatafraude_ml_graphx_spark.queries_analytics import q78_event_funnel

    rows = [
        # user 1: full ordered funnel
        (1, _t("2024-01-01 09:00:00"), 1, "view"),
        (2, _t("2024-01-01 09:05:00"), 1, "click"),
        (3, _t("2024-01-01 09:10:00"), 1, "purchase"),
        # user 2: purchase BEFORE view/click -> depth stops at 2
        (4, _t("2024-01-01 08:00:00"), 2, "purchase"),
        (5, _t("2024-01-01 09:00:00"), 2, "view"),
        (6, _t("2024-01-01 09:05:00"), 2, "click"),
        # user 3: never views -> depth 0
        (7, _t("2024-01-01 09:00:00"), 3, "click"),
    ]
    import os, tempfile

    # route through a parquet table the query loader can read
    d = tempfile.mkdtemp(prefix="funnel_t_")
    df = _ev(spark, rows).withColumn("value", F.lit(1.0)).withColumn(
        "props", F.lit("{}")
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["funnel_depth"]: r["n_users"]
        for r in q78_event_funnel(spark, d).collect()
    }
    assert out == {3: 1, 2: 1, 0: 1}


def test_triangle_count_on_known_graph(spark):
    from bigdatafraude_ml_graphx_spark.queries_analytics import _TRI_MIN_WEIGHT

    edges = spark.createDataFrame(
        # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)],
        "src long, dst long",
    )
    ab, bc, ac = edges.alias("ab"), edges.alias("bc"), edges.alias("ac")
    n = (
        ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
        .join(
            ac,
            (F.col("ac.src") == F.col("ab.src"))
            & (F.col("ac.dst") == F.col("bc.dst")),
        )
        .count()
    )
    assert n == 4  # C(4,3) triangles in K4; pendant edge adds none
    assert _TRI_MIN_WEIGHT >= 1


def _naive_triangles(spark, edges):
    ab, bc, ac = edges.alias("ab"), edges.alias("bc"), edges.alias("ac")
    return (
        ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
        .join(
            ac,
            (F.col("ac.src") == F.col("ab.src"))
            & (F.col("ac.dst") == F.col("bc.dst")),
        )
        .count()
    )


def test_compact_forward_matches_naive_on_random_graph(spark):
    """Degree-ordered counting is orientation-invariant: same total as the
    id-ordered naive enumeration on a pseudo-random graph."""
    import random

    from bigdatafraude_ml_graphx_spark.graph import triangle_count

    rng = random.Random(7)
    pairs = sorted(
        {(a, b) for _ in range(300)
         for a, b in [sorted(rng.sample(range(40), 2))]}
    )
    edges = spark.createDataFrame(pairs, "src long, dst long").localCheckpoint()
    got = triangle_count(edges).collect()[0]["n_triangles"]
    assert got == _naive_triangles(spark, edges)
    assert got > 0  # fixture dense enough to be a real check


def test_compact_forward_bounds_hub_wedges(spark):
    """Star fixture: hub 0 joined to 200 leaves (plus one leaf-leaf edge).
    Id-ordered enumeration builds ~C(200,2)=19900 wedges at the hub;
    degree-ordering points every edge AT the hub, whose out-degree is 0 —
    wedge-stage rows stay linear in |E|."""
    from bigdatafraude_ml_graphx_spark.graph import (
        orient_by_degree,
        triangle_count,
        wedges,
    )

    n = 200
    rows = [(0, i) for i in range(1, n + 1)] + [(1, 2)]
    edges = spark.createDataFrame(rows, "src long, dst long").localCheckpoint()
    oriented = orient_by_degree(edges).localCheckpoint()
    # every star edge orients leaf -> hub; each leaf has <= 2 out-edges
    assert wedges(oriented).count() <= n + 1
    assert triangle_count(edges).collect()[0]["n_triangles"] == 1  # {0,1,2}


def test_sketch_aggregates_contract_holds(spark, sf_dir):
    """q81 now emits the verified error contract: exact aggregates plus
    booleans asserting the HLL estimate and GK quantile ranks are in bound.
    All booleans must be TRUE (that's what the driver oracle pins) and the
    exact columns must match an independent exact aggregation."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.queries_analytics import (
        q81_sketch_aggregates,
    )

    out = {
        r["event_type"]: r for r in q81_sketch_aggregates(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et, a in out.items():
        assert a["exact_users"] == exact[et]["users"]
        assert a["n_events"] == exact[et]["n"]
        assert a["users_within_bound"] and a["p50_rank_ok"] and a["p95_rank_ok"], (
            et,
            a,
        )
