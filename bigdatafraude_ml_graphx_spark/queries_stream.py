"""Streaming query declaration: a REAL Structured Streaming query (file
replay → watermark → tumbling window → memory sink) whose drained result is
hash-checked against the DuckDB oracle — the strongest form of the
stream/batch equivalence test (SURVEY §5.4).

Tumbling 1-hour windows align to the epoch, so ``window_start`` equals
``date_trunc('hour', ts)`` and the oracle is plain SQL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.deterministic import dsum, oracle_dsum
from .queries import query
from .streaming.events import events_stream
from .streaming.sinks import memory_sink, run_available_now
from .streaming.windows import windowed_agg


@query(
    "q33_stream_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           {oracle_dsum('value')} AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def q33_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window aggregate, drained with
    ``availableNow`` into a memory sink. Implements for real what the
    reference only declares in config (watermark + windowed agg,
    ``streaming/streaming_config.yaml:16-18``)."""
    stream = events_stream(spark, sf_dir)
    # Complete-mode aggregation: no watermark (watermarks require LTZ
    # timestamps; this query keeps TIMESTAMP_NTZ so window_start is
    # timezone-independent and oracle-comparable). Watermark semantics are
    # exercised in tests/test_streaming.py on an LTZ stream.
    agg = windowed_agg(
        stream,
        ts_col="ts",
        window="1 hour",
        watermark=None,
        group_cols=("event_type",),
        aggs=(
            F.count("*").alias("n_events"),
            dsum("value", "total_value"),
        ),
    )
    name = f"q33_sink_{uuid.uuid4().hex[:8]}"
    q = memory_sink(agg, name, output_mode="complete", available_now=True)
    run_available_now(q)
    return spark.table(name).select(
        "window_start", "event_type", "n_events", "total_value"
    )


@query(
    "q118_stream_sessions",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, ts, value FROM events WHERE user_id % 13 = 0),
    m AS (
      SELECT *, CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {oracle_dsum('value')} AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def q118_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming SESSION windows (``F.session_window``, 30-minute
    gap), drained with ``availableNow`` and hash-checked against the batch
    islands formulation (lag-gap breaks + running session ids — q77's
    logic): the session-window stream/batch equivalence proof. Session
    state is Spark's native merging window store — at 100 TB the state is
    per-(user, open-session) and a watermark bounds it; here the replay
    drains complete-mode for oracle comparability."""
    stream = events_stream(spark, sf_dir).filter(F.col("user_id") % 13 == 0)
    agg = (
        stream.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "total_value"),
        )
    )
    name = f"q118_sink_{uuid.uuid4().hex[:8]}"
    q = memory_sink(agg, name, output_mode="complete", available_now=True)
    run_available_now(q)
    return spark.table(name).select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
        "total_value",
    )


@query(
    "q122_stream_static_enrich",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           {oracle_dsum('e.value')} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY c.c_mktsegment
    """,
)
def q122_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment, oracle-checked: purchase events replayed
    as a stream, broadcast-joined per micro-batch against the STATIC
    customer dimension (stateless — no state store), aggregated by market
    segment, drained with availableNow. The streamed result hash-matches
    the batch join SQL — the stream/batch equivalence proof for the
    enrichment pattern the reference approximates with a re-read loop
    (`streaming/spark_streaming.py`)."""
    from .catalog import load_table
    from .streaming.joins import stream_static_enrich

    stream = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = stream_static_enrich(stream, dim, on="user_id", how="inner")
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        dsum("value", "total_value"),
    )
    name = f"q122_sink_{uuid.uuid4().hex[:8]}"
    q = memory_sink(agg, name, output_mode="complete", available_now=True)
    run_available_now(q)
    return spark.table(name).select("c_mktsegment", "n_events", "total_value")


@query(
    "q138_stream_dedup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q138_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT dedup: ``dropDuplicates`` on (user_id, event_type)
    inside a real Structured Streaming replay, then a per-type count of
    the deduped stream — hash-equal to batch COUNT(DISTINCT): the
    stream/batch equivalence proof for the stateful dedup operator a
    streaming ingestion pipeline puts in front of every sink. State here
    is one entry per distinct key (exact, unbounded — the contract
    COUNT DISTINCT requires); the BOUNDED-state production variant is
    ``dropDuplicatesWithinWatermark`` (state evicted past the watermark,
    exact only for duplicates arriving within it) — exercised with a
    watermarked replay in tests/test_streaming_advanced.py, and kept out
    of this query because its output depends on arrival order, which no
    batch oracle can replay."""
    stream = events_stream(spark, sf_dir).select("user_id", "event_type")
    deduped = stream.dropDuplicates(["user_id", "event_type"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_users"))
    name = f"q138_sink_{uuid.uuid4().hex[:8]}"
    q = memory_sink(agg, name, output_mode="complete", available_now=True)
    run_available_now(q)
    return spark.table(name).select("event_type", "n_users").orderBy(
        "event_type"
    )


@query(
    "q146_stream_stream_join",
    oracle=f"""
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_attributed,
           {oracle_dsum('p.value')} AS attributed_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 5 MINUTE
     AND c.ts <= p.ts + INTERVAL 5 MINUTE
    GROUP BY c.user_id
    """,
)
def q146_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join (purchase ⋈ click within ±5 minutes per
    user — the attribution join), drained with availableNow and
    hash-checked against the batch time-range join: the stream/batch
    equivalence proof for the double-buffered stateful join, the one
    streaming operator the reference never attempts (SURVEY §2.9 'not
    present'). Watermarks on both sides + the symmetric time bound give
    Spark eviction guarantees on both state buffers; the single-batch
    replay makes the inner join drop-free, so the batch oracle replays it
    exactly."""
    from .streaming.joins import stream_stream_join

    # Watermarks require TIMESTAMP (LTZ): cast the NTZ event time on BOTH
    # sides — the session-timezone shift is identical left and right, so
    # the ±5-minute bound is invariant, and no timestamp reaches the
    # output (the q33 NTZ discipline only matters for emitted windows).
    purchases = events_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = events_stream(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    joined = stream_stream_join(
        purchases,
        clicks,
        on=F.col("p_user") == F.col("c_user"),
        left_ts="p_ts",
        right_ts="c_ts",
        watermark="10 minutes",
        max_lag="5 minutes",
    )
    # Stream-stream joins emit in APPEND mode only (no agg downstream in
    # the same streaming query): sink the joined rows, aggregate the
    # drained table batch-side — same split a production pipeline uses
    # (join in the stream, rollup in the serving layer).
    # A stateful stream pins one state store PER shuffle partition for
    # the life of the query — the partition count is a real streaming
    # tuning knob (state store count), not a throughput one. Bound it for
    # the join's micro-batch; restore afterwards so batch queries keep
    # the session's setting.
    name = f"q146_sink_{uuid.uuid4().hex[:8]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = memory_sink(
            joined.select("c_user", "p_value"), name,
            output_mode="append", available_now=True,
        )
        run_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.table(name)
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_attributed"),
            dsum("p_value", "attributed_value"),
        )
    )


@query(
    "q164_stream_outer_join",
    oracle=f"""
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN c.user_id IS NULL THEN 1 END), 0)
                AS BIGINT) AS n_unmatched,
           {oracle_dsum('p.value')} AS attributed_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 5 MINUTE
     AND c.ts <= p.ts + INTERVAL 5 MINUTE
    GROUP BY p.user_id
    """,
)
def q164_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM LEFT OUTER time-bounded join (q146's attribution
    join, now keeping the unmatched purchases — the 'orphan purchase'
    audit an attribution pipeline needs as much as the matches). Outer
    rows only emit when the WATERMARK passes their eviction bound, so a
    finite replay would swallow every unmatched purchase in the last
    ~watermark+lag of data: the flushed replay (``events_stream_flushed``)
    appends far-future sentinel rows on both sides that drive the final
    watermark past all real data — the heartbeat-record pattern — making
    the drain complete and the batch LEFT JOIN an exact oracle. Same
    double-buffered state/eviction plan as q146; the sentinels join only
    each other (user −1) and are filtered from the result."""
    from .streaming.events import events_stream_flushed
    from .streaming.joins import stream_stream_join

    purchases = events_stream_flushed(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = events_stream_flushed(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("timestamp").alias("c_ts"),
    )
    joined = stream_stream_join(
        purchases,
        clicks,
        on=F.col("p_user") == F.col("c_user"),
        left_ts="p_ts",
        right_ts="c_ts",
        watermark="10 minutes",
        max_lag="5 minutes",
        how="leftOuter",
    )
    name = f"q164_sink_{uuid.uuid4().hex[:8]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = memory_sink(
            joined.select("p_user", "p_value", "c_user"), name,
            output_mode="append", available_now=True,
        )
        run_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        spark.table(name)
        .filter(F.col("p_user") >= 0)  # drop the sentinel pair
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("c_user").isNull(), 1)), F.lit(0)
            ).cast("long").alias("n_unmatched"),
            dsum("p_value", "attributed_value"),
        )
    )


@query(
    "q184_stateful_running_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(COALESCE(value, 0.0) * 1000000 + 0.5)
                         AS BIGINT)) AS BIGINT) AS total_micros,
           CAST(CAST(SUM(CAST(floor(COALESCE(value, 0.0) * 1000000 + 0.5)
                              AS BIGINT)) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q184_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL operator certified against a batch oracle: per-user
    running (count, total) maintained by ``applyInPandasWithState`` —
    explicit Arrow-backed per-key state, the shape behind fraud velocity
    counters — drained with availableNow and hash-checked against plain
    GROUP BY. Determinism: the state accumulates int64 MICROS (one IEEE
    quantization per element, exact integer addition), so the final
    emission is identical for any arrival order or micro-batch split;
    update-mode re-emissions collapse via a monotone max-struct (totals
    only grow). One state store per shuffle partition → partitions
    bounded inside the query (try/finally), the q146 contract."""
    from .streaming.stateful import running_totals_exact

    stream = events_stream(spark, sf_dir).select("user_id", "value")
    name = f"q184_sink_{uuid.uuid4().hex[:8]}"
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = memory_sink(
            running_totals_exact(stream, "user_id", "value"),
            name,
            output_mode="update",
            available_now=True,
        )
        run_available_now(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    final = F.max(
        F.struct(F.col("n_events"), F.col("total_micros"))
    ).alias("f")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("f.n_events").alias("n_events"),
            F.col("f.total_micros").alias("total_micros"),
            (F.col("f.total_micros").cast("double") / 1_000_000.0).alias(
                "total_value"
            ),
        )
        .orderBy("user_id")
    )
