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


_SKETCH_RSD = 0.02  # HLL++ relative standard deviation
_RANK_EPS = 0.01  # GK rank-error budget
_GK_ACCURACY = 1_000  # guarantees 1e-3 rank error — 10× inside the budget.
# (accuracy 10k guaranteed 1e-4 but cost 4.1 s of the 4.9 s query at sf0.1;
# GK state manipulation scales with accuracy, not rows — don't raise it
# without re-profiling.)


@query(
    "q81_sketch_aggregates",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS users_within_bound,
           TRUE AS p50_rank_ok,
           TRUE AS p95_rank_ok
    FROM events GROUP BY event_type
    """,
)
def q81_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with an IN-QUERY verified error contract.

    HyperLogLog++ (`approx_count_distinct`, rsd 2%) and Greenwald-Khanna
    quantiles (`percentile_approx`) are the single-pass, mergeable,
    fixed-memory aggregates that replace exact distincts/percentiles at
    100 TB. Sketch VALUES are engine-specific, so instead of emitting them
    the query emits the CONTRACT: per group, booleans asserting (a) the HLL
    estimate is within 3·rsd of the exact distinct count and (b) the rank of
    each returned quantile value is within ±1% of its target. The DuckDB
    oracle computes the exact aggregates and pins the booleans to TRUE — a
    sketch drifting out of bound breaks the value hash and fails the driver
    gate. (The exact distinct / rank recheck is the verification cost; the
    production path uses the sketches alone.)
    """
    ev = load_table(spark, sf_dir, "events")
    sk = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=_SKETCH_RSD).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.percentile_approx("value", [0.5, 0.95], _GK_ACCURACY).alias("ps"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p95"),
            "n_events",
        )
    )
    # Re-rank the returned quantile values against the raw data: the GK
    # guarantee is on RANK (frac of values strictly below <= q + eps and
    # frac at-or-below >= q - eps), which unlike the values themselves is
    # checkable portably. Broadcast the per-group sketch row back onto the
    # events scan — one extra scan, no extra shuffle of events.
    checked = (
        ev.filter(F.col("value").isNotNull())
        .join(F.broadcast(sk), "event_type")
        .groupBy("event_type", "approx_users", "exact_users", "p50", "p95", "n_events")
        .agg(
            F.avg((F.col("value") < F.col("p50")).cast("int")).alias("lt50"),
            F.avg((F.col("value") <= F.col("p50")).cast("int")).alias("le50"),
            F.avg((F.col("value") < F.col("p95")).cast("int")).alias("lt95"),
            F.avg((F.col("value") <= F.col("p95")).cast("int")).alias("le95"),
        )
    )
    return checked.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(3 * _SKETCH_RSD) * F.col("exact_users")
        ).alias("users_within_bound"),
        (
            (F.col("lt50") <= 0.5 + _RANK_EPS) & (F.col("le50") >= 0.5 - _RANK_EPS)
        ).alias("p50_rank_ok"),
        (
            (F.col("lt95") <= 0.95 + _RANK_EPS) & (F.col("le95") >= 0.95 - _RANK_EPS)
        ).alias("p95_rank_ok"),
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
    first, the standard practice). Counted DEGREE-ORDERED (compact-forward,
    Latapy 2008 — see graph/triangles.py): edges orient low-degree →
    high-degree, so a hub vertex never fans out wedges and the wedge join's
    max per-key work is O(√|E|) regardless of skew. The undirected triangle
    count is orientation-invariant, so the id-ordered SQL oracle still
    matches exactly."""
    from .graph import cooccurrence_edges, triangle_count

    # Materialize the (small) thresholded edge list before the degree and
    # wedge joins: multiple join sides over a lazy frame would re-execute
    # the whole co-occurrence build once per side (3+ scans of events).
    e = (
        cooccurrence_edges(
            load_table(spark, sf_dir, "events"), "user_id", "ts", "hour",
            ("event_type",),
        )
        .filter(F.col("weight") >= _TRI_MIN_WEIGHT)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    return triangle_count(e)
