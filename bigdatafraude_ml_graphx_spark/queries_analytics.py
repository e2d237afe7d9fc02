"""Event-analytics query declarations: batch sessionization, funnel
analysis, retention cohorts, triangle counting.

The standard product/behavior-analytics suite over the ``events`` table —
operators a reference user runs downstream of the engine (the reference's
notebooks stop at per-class aggregates; these are the next queries any
fraud/behavior team writes). All four are exact-oracle checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

_GAP_S = 1800  # 30-minute inactivity gap ends a session


@query(
    "q77_batch_sessionization",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR date_diff('second', lag(ts) OVER w, ts) > {_GAP_S}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessioned AS (
        SELECT user_id, ts,
               CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_idx
        FROM flagged)
    SELECT user_id, session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_sec
    FROM sessioned GROUP BY user_id, session_idx
    """,
)
def q77_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (the batch twin of q43's streaming
    session windows): a session breaks after 30 min of inactivity. One hash
    shuffle on user_id; both windows and the final aggregate share that
    partitioning, so Catalyst plans a single Exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        # boundary-crossing seconds (endpoints truncated) — see duration_sec
        F.when(
            lag_ts.isNull()
            | (
                F.timestamp_diff(
                    "SECOND",
                    F.date_trunc("second", lag_ts),
                    F.date_trunc("second", F.col("ts")),
                )
                > _GAP_S
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sessioned = flagged.select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return sessioned.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        # DuckDB's date_diff counts second-BOUNDARY crossings; Spark's
        # timestamp_diff truncates elapsed time. Truncating both endpoints
        # to whole seconds first makes the two definitions coincide.
        F.timestamp_diff(
            "SECOND",
            F.date_trunc("second", F.min("ts")),
            F.date_trunc("second", F.max("ts")),
        )
        .cast("long")
        .alias("duration_sec"),
    )


_FUNNEL = ("view", "click", "purchase")


@query(
    "q78_event_funnel",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
           WHERE e.event_type = '{_FUNNEL[1]}' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
           WHERE e.event_type = '{_FUNNEL[2]}' GROUP BY e.user_id),
    depth AS (
        SELECT u.user_id,
               CASE WHEN t3 IS NOT NULL THEN 3
                    WHEN t2 IS NOT NULL THEN 2
                    WHEN t1 IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_depth
        FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
               LEFT JOIN s2 ON u.user_id = s2.user_id
               LEFT JOIN s3 ON u.user_id = s3.user_id)
    SELECT funnel_depth, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth GROUP BY funnel_depth
    """,
)
def q78_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage's earliest
    qualifying timestamp must not precede the previous stage's. Implemented
    as three stacked window minimums over ONE user_id partitioning — a
    single shuffle and a single scan of events (the equivalent
    per-stage-aggregate-and-join formulation scans events three times and
    plans 7 Exchanges). Each later stage's min conditions on the earlier
    stage's window value, so Catalyst chains the Window operators without
    re-partitioning; the per-user depth then reduces over |users| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    staged = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == _FUNNEL[0], F.col("ts"))).over(w)
    )
    staged = staged.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == _FUNNEL[1]) & (F.col("ts") >= F.col("t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    staged = staged.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == _FUNNEL[2]) & (F.col("ts") >= F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    depth = staged.groupBy("user_id").agg(
        F.max(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
        ).alias("funnel_depth")
    )
    return depth.groupBy("funnel_depth").agg(F.count("*").alias("n_users"))


@query(
    "q79_retention_cohorts",
    oracle="""
    WITH fw AS (SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
                FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events)
    SELECT fw.cohort_week,
           CAST(date_diff('day', fw.cohort_week, act.week) // 7 AS INTEGER)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act JOIN fw ON act.user_id = fw.user_id
    GROUP BY fw.cohort_week, week_offset
    """,
)
def q79_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted in
    each later active week. Two aggregates and one equi join keyed on
    user_id; inputs to the join are already |users| / |user-weeks| sized, so
    event volume only touches the first aggregation pass. The result is
    |weeks|² rows regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    fw = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        act.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query("q81_sketch_aggregates")
def q81_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the sketches that replace exact distinct
    counts and percentiles at 100 TB: HyperLogLog++ (`approx_count_distinct`,
    rsd 2%) and the Greenwald-Khanna quantile sketch (`approx_percentile`).
    Both are single-pass, mergeable, fixed-memory aggregates: partial
    sketches merge associatively across partitions, so the shuffle carries
    one sketch per group instead of the value set. No DuckDB oracle — sketch
    internals are engine-specific by nature; the error bound vs the exact
    answer is pinned in tests/test_analytics.py instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95], 10_000).alias("value_p50_p95"),
        F.count("*").alias("n_events"),
    ).select(
        "event_type",
        "approx_users",
        F.col("value_p50_p95")[0].alias("value_p50"),
        F.col("value_p50_p95")[1].alias("value_p95"),
        "n_events",
    )


_TRI_MIN_WEIGHT = 5


@query(
    "q80_triangle_count",
    oracle=f"""
    WITH b AS (SELECT DISTINCT user_id AS entity,
                      date_trunc('hour', ts) AS bucket, event_type
               FROM events),
    e0 AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2),
    e AS (SELECT src, dst FROM e0 WHERE weight >= {_TRI_MIN_WEIGHT})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e ab JOIN e bc ON ab.dst = bc.src
              JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
    """,
)
def q80_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the strong-tie co-occurrence graph (weight ≥ 5 —
    counting on the raw near-complete graph is wedge-quadratic; sparsify
    first, the standard practice). Canonical src<dst edges make each
    triangle appear exactly once as (a<b<c): two equi joins, no dedup pass.
    At scale, ordering endpoints by DEGREE instead of id (compact-forward,
    Latapy 2008) bounds the wedge work further; id order suffices on the
    thresholded graph."""
    from .graph import cooccurrence_edges

    # Materialize the (small) thresholded edge list before the triple
    # self-join: three aliases of a lazy frame would re-execute the whole
    # co-occurrence build once per join side (3 scans of events).
    e = (
        cooccurrence_edges(
            load_table(spark, sf_dir, "events"), "user_id", "ts", "hour",
            ("event_type",),
        )
        .filter(F.col("weight") >= _TRI_MIN_WEIGHT)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = ab.join(bc, F.col("ab.dst") == F.col("bc.src")).join(
        ac,
        (F.col("ac.src") == F.col("ab.src"))
        & (F.col("ac.dst") == F.col("bc.dst")),
    )
    return tri.agg(F.count("*").alias("n_triangles"))
