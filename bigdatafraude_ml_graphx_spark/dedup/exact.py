"""Exact deduplication at scale.

Hash-groupBy over a content fingerprint: one shuffle on the md5 key, partial
aggregation map-side. Never compares full text across the wire — only the
16-byte fingerprint moves, which is what makes this viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: ``(fingerprint, canonical_id, n_copies)``
    with ``canonical_id`` = min id in the group."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (the min-id one) per distinct normalized text."""
    w_fp = df.withColumn("fp", fingerprint(text_col))
    keep = w_fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return w_fp.join(keep, ["fp", id_col], "inner").drop("fp")
