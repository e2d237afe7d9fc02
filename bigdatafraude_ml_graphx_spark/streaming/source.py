"""Structured Streaming sources (SURVEY §2.9 / §2.1 S5).

The reference reads Kafka JSON (``/root/reference/streaming/spark_streaming.py:26-30``,
``kafka_to_influxdb.py:69-75``); the engine additionally offers file-replay
sources with declared schemas so streaming logic is testable deterministically
(``availableNow`` trigger over fixed files — SURVEY §5.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based stream with a DECLARED schema (streaming requires one —
    no inference, which is also the right call at 100 TB)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 1000,
) -> DataFrame:
    """Kafka source with the reference's rate-limit defaults
    (``maxOffsetsPerTrigger 1000``, ``streaming_config.yaml:11``). Returns the
    raw binary key/value frame; pair with
    :func:`..streaming.transform.parse_json_events`."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Synthetic rate source — the streaming analogue of the reference's
    ``spark.range`` feeder (``streaming/spark_to_postgres.py:11``)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
