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
