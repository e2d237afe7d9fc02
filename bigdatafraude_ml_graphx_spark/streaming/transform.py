"""Stateless per-event stream transforms (SURVEY §2.9 T7).

Mirrors the reference's parse→tag shape: ``CAST(value AS STRING)`` →
``from_json`` → flatten → ``withColumn`` tags
(``/root/reference/streaming/spark_streaming.py:34-42``,
``kafka_to_influxdb.py:79-86``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_json_events(
    raw: DataFrame, schema: StructType | str, value_col: str = "value"
) -> DataFrame:
    """Binary/string JSON payloads → typed columns (struct flattened)."""
    return (
        raw.select(F.col(value_col).cast("string").alias("json_str"))
        .select(F.from_json("json_str", schema).alias("data"))
        .select("data.*")
    )


def tag_events(
    df: DataFrame,
    fraud_when: Column | None = None,
    amount_col: str = "value",
) -> DataFrame:
    """Attach processing-time + alert tags, null-safe on the amount column
    (``coalesce(col, lit(0))`` — reference ``spark_streaming.py:37``)."""
    out = (
        df.withColumn(amount_col, F.coalesce(F.col(amount_col), F.lit(0.0)))
        .withColumn("processed_at", F.current_timestamp())
        .withColumn("event_kind", F.lit("transaction"))
    )
    if fraud_when is not None:
        out = out.withColumn(
            "fraud_flag", F.when(fraud_when, F.lit(1)).otherwise(F.lit(0))
        )
    return out
