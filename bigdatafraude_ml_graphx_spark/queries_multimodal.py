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


@query("q59_multimodal_decode")
def q59_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full media kernel pipeline — synthesize RAW8 'images' from document
    bytes, nearest-neighbor resize 16x16 → 4x4, decode metadata — every stage
    a real Arrow-batched ``mapInPandas`` kernel (rows-only check: binary
    decode has no SQL oracle). Swapping RAW8 for JPEG changes one line per
    kernel; the Spark plan is production-shaped already."""
    from collections.abc import Iterator

    import pandas as pd

    from .multimodal import decode_raw8, encode_raw8, resize_raw8

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, bufs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")[:256]
                px = np.frombuffer(raw.ljust(256, b"\0"), dtype=np.uint8)
                ids.append(i)
                bufs.append(encode_raw8(16, 16, px.reshape(16, 16)))
            yield pd.DataFrame({"img_id": ids, "content": bufs})

    imgs = d.select("doc_id", "text").mapInPandas(synth, "img_id long, content binary")
    return decode_raw8(resize_raw8(imgs, "img_id", 4, 4), "img_id")
