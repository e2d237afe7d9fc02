"""Multimodal query declaration: binary-column plumbing with a DuckDB oracle
(byte length + content hash over utf-8 encoded text as the stand-in blob —
real media bytes would flow through the identical plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .multimodal import as_media, byte_stats
from .queries import query


@query(
    "q34_multimodal_bytes",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_md5,  -- md5 over the same utf-8 bytes
           'text/plain' AS mime
    FROM documents
    """,
)
def q34_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary content + typed metadata struct; byte length and md5
    computed JVM-side on the binary column (the media dedup key)."""
    d = load_table(spark, sf_dir, "documents")
    media = as_media(d, F.encode(F.col("text"), "UTF-8"), mime="text/plain")
    return byte_stats(media).select(
        "doc_id", "byte_len", "content_md5", F.col("meta.mime").alias("mime")
    )
