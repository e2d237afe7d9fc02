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


@query("q109_video_frame_sampling")
def q109_video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level video frame sampling — synthesize RAWV 'videos' (4 frames
    of 8×8 from document bytes), extract every 2nd frame as a standalone
    RAW8 image, resize each sampled frame 8×8 → 4×4, and report per-doc
    frame counts + mean pixel. Every stage is a real Arrow ``mapInPandas``
    kernel (rows-only: byte kernels have no SQL oracle); swapping RAWV for
    MP4 changes one frombuffer line."""
    from collections.abc import Iterator

    import pandas as pd

    from .multimodal import (
        decode_raw8,
        encode_rawv,
        extract_rawv_frames,
        resize_raw8,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 23 == 0)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, bufs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")[:256]
                px = np.frombuffer(raw.ljust(256, b"\0"), dtype=np.uint8)
                ids.append(i)
                bufs.append(encode_rawv(8, 8, px.reshape(4, 8, 8)))
            yield pd.DataFrame({"vid_id": ids, "content": bufs})

    vids = d.select("doc_id", "text").mapInPandas(
        synth, "vid_id long, content binary"
    )
    frames = extract_rawv_frames(vids, "vid_id", stride=2)
    small = resize_raw8(
        frames.select("vid_id", F.col("frame").alias("content")),
        "vid_id", 4, 4,
    )
    decoded = decode_raw8(small, "vid_id")
    return decoded.groupBy("vid_id").agg(
        F.count("*").alias("n_sampled_frames"),
        F.round(F.avg("mean_pixel"), 6).alias("avg_frame_mean"),
    )


@query("q110_audio_features")
def q110_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction — synthesize PCM8 'audio' from document
    bytes (8 kHz mono), compute RMS / zero-crossing-rate / duration in one
    Arrow kernel (rows-only: byte kernels have no SQL oracle). The features
    are the standard silence/energy screens a speech-data pipeline applies
    before transcription."""
    from collections.abc import Iterator

    import pandas as pd

    from .multimodal import encode_pcm8, pcm8_features

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 29 == 0)

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, bufs = [], []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")[:400]
                samples = np.frombuffer(raw.ljust(400, b"\x80"), dtype=np.uint8)
                ids.append(i)
                bufs.append(encode_pcm8(8000, samples))
            yield pd.DataFrame({"clip_id": ids, "content": bufs})

    clips = d.select("doc_id", "text").mapInPandas(
        synth, "clip_id long, content binary"
    )
    return pcm8_features(clips, "clip_id")
