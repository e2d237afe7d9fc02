"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

North-star surface (BASELINE.json): the reference has no media handling; a
training-data pipeline at 100 TB treats media as binary columns with a struct
of typed metadata, and runs decode / feature-extract / resize / frame-sample
as Arrow-batched Pandas functions over ``mapInPandas`` — data never leaves the
executors, batches arrive as pandas DataFrames sized by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual pixel/sample decode requires image/audio libraries that are NOT in
this environment, so the decode kernels are STUBBED (clearly marked
``NotImplementedError`` behind an import-try). Everything Spark-side — schema,
partitioning, UDF signatures, batch shapes, and the byte-level feature path
(histograms, lengths, hashes — real, not stubs) — is fully implemented and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<mime:string, width:int, height:int, duration_s:double>"
)


def as_media(
    df: DataFrame,
    content: Column,
    mime: str,
    width: Column | None = None,
    height: Column | None = None,
    duration_s: Column | None = None,
) -> DataFrame:
    """Attach the canonical media columns: ``content binary`` + ``meta``
    struct. Any source column convertible to binary works (real pipelines
    read blobs from parquet/object storage; tests encode text)."""
    meta = F.struct(
        F.lit(mime).alias("mime"),
        (width if width is not None else F.lit(None).cast("int")).alias("width"),
        (height if height is not None else F.lit(None).cast("int")).alias("height"),
        (
            duration_s if duration_s is not None else F.lit(None).cast("double")
        ).alias("duration_s"),
    )
    return df.withColumn("content", content.cast("binary")).withColumn("meta", meta)


def byte_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM-side binary column stats — no Python in the loop: byte length +
    md5 content hash (the dedup key for media)."""
    return df.withColumn("byte_len", F.length(F.col(content_col))).withColumn(
        "content_md5", F.md5(F.col(content_col))
    )


_HIST_BINS = 16


def byte_histogram_features(
    df: DataFrame, id_col: str, content_col: str = "content"
) -> DataFrame:
    """Real (non-stub) feature extraction: a 16-bin byte-value histogram as
    ``array<double>`` per row, computed with Arrow-batched ``mapInPandas``.

    This is the template every decode kernel follows: iterator of pandas
    batches in, iterator of pandas batches out, output schema declared — so
    swapping the histogram for a real pixel decoder changes only the kernel.
    """
    import numpy as np

    schema = f"{id_col} long, features array<double>, byte_len long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, lens = [], []
            for buf in pdf[content_col]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=_HIST_BINS).astype("float64")
                total = max(len(arr), 1)
                feats.append((hist / total).tolist())
                lens.append(len(arr))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats, "byte_len": lens}
            )

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def decode_image(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Decode image bytes → (width, height, mean_pixel). STUB: requires an
    image library absent from this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "decode_image requires Pillow; not available in this environment. "
            "The mapInPandas plumbing is identical to byte_histogram_features."
        ) from exc

    schema = f"{id_col} long, width int, height int, mean_pixel double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import numpy as np
        import PIL.Image

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                img = PIL.Image.open(io.BytesIO(bytes(buf)))
                arr = np.asarray(img)
                rows.append((i, img.width, img.height, float(arr.mean())))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_pixel"])

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def resize_image(
    df: DataFrame, id_col: str, width: int, height: int, content_col: str = "content"
) -> DataFrame:
    """Resize compressed image bytes. STUB — same gating as
    :func:`decode_image` (for the library-free real path see
    :func:`resize_raw8`)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "resize_image requires Pillow; not available in this environment."
        ) from exc
    raise NotImplementedError("kernel identical in shape to decode_image")


# ---------------------------------------------------------------------------
# RAW8: a trivial uncompressed image format (8-byte header: width/height as
# little-endian uint32, then width*height grayscale bytes). Because it needs
# no codec, the decode and resize kernels below are REAL end-to-end
# mapInPandas implementations — the Arrow batch shape, declared schemas, and
# numpy math all run and are tested in this environment; swapping RAW8 for
# JPEG means changing only the np.frombuffer lines to a codec call.
# ---------------------------------------------------------------------------

RAW8_HEADER_BYTES = 8


def encode_raw8(width: int, height: int, pixels) -> bytes:
    """Build a RAW8 buffer from a width×height uint8 array (test/feed helper)."""
    import numpy as np

    arr = np.asarray(pixels, dtype="uint8").reshape(height, width)
    return (
        int(width).to_bytes(4, "little")
        + int(height).to_bytes(4, "little")
        + arr.tobytes()
    )


def decode_raw8(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Decode RAW8 bytes → (width, height, sum_pixels, n_pixels,
    mean_pixel). Real kernel: header parse + sums are numpy over the Arrow
    batch; malformed buffers yield nulls (never a task failure — at 100 TB
    some corrupt blobs are a certainty and one bad row must not kill a
    10k-task stage).

    ``sum_pixels``/``n_pixels`` are EXACT INTEGER features (the mean is
    their ratio): integer features replay bit-identically in any engine,
    which is what lets the RAWV pipeline (q109) carry a cross-engine SQL
    oracle instead of a rows-only check.
    """
    import numpy as np

    schema = (
        f"{id_col} long, width int, height int, "
        "sum_pixels long, n_pixels long, mean_pixel double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                if len(b) < RAW8_HEADER_BYTES:
                    rows.append((i, None, None, None, None, None))
                    continue
                w = int.from_bytes(b[0:4], "little")
                h = int.from_bytes(b[4:8], "little")
                if len(b) != RAW8_HEADER_BYTES + w * h:
                    rows.append((i, None, None, None, None, None))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8, offset=RAW8_HEADER_BYTES)
                if not arr.size:
                    rows.append((i, w, h, None, None, None))
                    continue
                s = int(arr.sum(dtype=np.int64))
                rows.append((i, w, h, s, arr.size, s / arr.size))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height",
                    "sum_pixels", "n_pixels", "mean_pixel",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def pixel_histogram_raw8(
    df: DataFrame,
    id_col: str,
    n_bins: int = 4,
    content_col: str = "content",
) -> DataFrame:
    """Per-image pixel-intensity histogram over RAW8 content —
    ``n_bins`` equal-width intensity buckets (power of two, bucket =
    pixel >> (8 − log₂ bins)) as EXACT INTEGER counts, the brightness /
    exposure feature a vision-data curation pipeline filters on before
    training. Real numpy kernel over the Arrow batch (``np.bincount`` on
    the shifted bytes); malformed buffers yield null counts, never a
    task failure (the decode_raw8 corrupt-blob contract). Columns:
    ``(id, bin_0 … bin_{n-1}, dominant_bin)`` with the dominant bin
    breaking ties toward the darker bucket (np.argmax = first maximum),
    so every output replays bit-identically from the source bytes."""
    import numpy as np

    if n_bins & (n_bins - 1) or not 0 < n_bins <= 256:
        raise ValueError("n_bins must be a power of two in [1, 256]")
    shift = 8 - (n_bins.bit_length() - 1)
    bin_cols = [f"bin_{k}" for k in range(n_bins)]
    schema = f"{id_col} long, " + ", ".join(
        f"{c} long" for c in bin_cols
    ) + ", dominant_bin int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                if len(b) < RAW8_HEADER_BYTES:
                    rows.append((i, *([None] * n_bins), None))
                    continue
                w = int.from_bytes(b[0:4], "little")
                h = int.from_bytes(b[4:8], "little")
                if w * h == 0 or len(b) != RAW8_HEADER_BYTES + w * h:
                    rows.append((i, *([None] * n_bins), None))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8, offset=RAW8_HEADER_BYTES)
                counts = np.bincount(arr >> shift, minlength=n_bins)
                rows.append(
                    (i, *(int(c) for c in counts), int(np.argmax(counts)))
                )
            yield pd.DataFrame(rows, columns=[id_col, *bin_cols, "dominant_bin"])

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def resize_raw8(
    df: DataFrame,
    id_col: str,
    out_width: int,
    out_height: int,
    content_col: str = "content",
) -> DataFrame:
    """Nearest-neighbor resize of RAW8 images — a real, deterministic pixel
    kernel (pure numpy index arithmetic, bit-identical everywhere). Output is
    RAW8 again so resize stages compose; malformed inputs yield null."""
    import numpy as np

    schema = f"{id_col} long, content binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                ids.append(i)
                if len(b) < RAW8_HEADER_BYTES:
                    outs.append(None)
                    continue
                w = int.from_bytes(b[0:4], "little")
                h = int.from_bytes(b[4:8], "little")
                if w == 0 or h == 0 or len(b) != RAW8_HEADER_BYTES + w * h:
                    outs.append(None)
                    continue
                arr = np.frombuffer(
                    b, dtype=np.uint8, offset=RAW8_HEADER_BYTES
                ).reshape(h, w)
                ys = (np.arange(out_height) * h) // out_height
                xs = (np.arange(out_width) * w) // out_width
                resized = arr[ys][:, xs]
                outs.append(encode_raw8(out_width, out_height, resized))
            yield pd.DataFrame({id_col: ids, "content": outs})

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def sample_frames(
    df: DataFrame,
    every_s: float = 1.0,
    meta_col: str = "meta",
) -> DataFrame:
    """Frame-sampling plan for video: expands each row into (row, frame_ts)
    pairs from the duration metadata — pure Spark arithmetic (real, no stub);
    only the per-frame pixel decode would need a media library."""
    n_frames = F.greatest(
        F.floor(F.col(f"{meta_col}.duration_s") / F.lit(every_s)).cast("int"),
        F.lit(0),
    )
    return (
        df.withColumn("_n", n_frames)
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("_n"))))
        .withColumn("frame_ts", F.col("frame_idx") * F.lit(every_s))
        .drop("_n")
    )


# ---------------------------------------------------------------------------
# RAWV: uncompressed "video" (12-byte header: width/height/n_frames as
# little-endian uint32, then n_frames contiguous width*height grayscale
# frames) and PCM8: uncompressed "audio" (4-byte little-endian uint32 sample
# rate, then unsigned-8-bit mono samples centered at 128). Same policy as
# RAW8: real, tested Arrow kernels whose only stubbed part is the codec —
# swapping RAWV/PCM8 for MP4/WAV changes the np.frombuffer lines only.
# ---------------------------------------------------------------------------

RAWV_HEADER_BYTES = 12
PCM8_HEADER_BYTES = 4


def encode_rawv(width: int, height: int, frames) -> bytes:
    """Build a RAWV buffer from an (n_frames, height, width) uint8 array."""
    import numpy as np

    arr = np.asarray(frames, dtype="uint8")
    n = arr.shape[0]
    arr = arr.reshape(n, height, width)
    return (
        int(width).to_bytes(4, "little")
        + int(height).to_bytes(4, "little")
        + int(n).to_bytes(4, "little")
        + arr.tobytes()
    )


def extract_rawv_frames(
    df: DataFrame,
    id_col: str,
    stride: int = 1,
    content_col: str = "content",
) -> DataFrame:
    """Byte-level frame sampling: every ``stride``-th frame of each RAWV blob
    → one row (id, frame_idx, width, height, mean_pixel, frame) with the
    frame re-encoded as a standalone RAW8 image so downstream image kernels
    (``resize_raw8``, ``decode_raw8``) compose directly.

    This is the BYTE-plane complement of :func:`sample_frames` (which expands
    timestamps from metadata): the kernel slices the contiguous frame region
    with numpy strides — zero-copy views, one pass. Malformed buffers yield
    zero frames (never a task failure). At 100 TB, videos are the largest
    blobs in the lake: the select projects only (id, content), frames fan out
    inside the Arrow batch (no JVM-side row explosion of megabyte blobs), and
    the per-task memory bound is max_blob_size + one emitted batch.
    """
    import numpy as np

    schema = (
        f"{id_col} long, frame_idx int, width int, height int, "
        "mean_pixel double, frame binary"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                if len(b) < RAWV_HEADER_BYTES:
                    continue
                w = int.from_bytes(b[0:4], "little")
                h = int.from_bytes(b[4:8], "little")
                n = int.from_bytes(b[8:12], "little")
                if w == 0 or h == 0 or len(b) != RAWV_HEADER_BYTES + n * w * h:
                    continue
                arr = np.frombuffer(
                    b, dtype=np.uint8, offset=RAWV_HEADER_BYTES
                ).reshape(n, h, w)
                for fi in range(0, n, max(stride, 1)):
                    frame = arr[fi]
                    rows.append(
                        (
                            i,
                            fi,
                            w,
                            h,
                            float(frame.mean()),
                            encode_raw8(w, h, frame),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "width", "height", "mean_pixel", "frame",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(kernel, schema)


def encode_pcm8(sample_rate: int, samples) -> bytes:
    """Build a PCM8 buffer from a uint8 sample array (test/feed helper)."""
    import numpy as np

    arr = np.asarray(samples, dtype="uint8")
    return int(sample_rate).to_bytes(4, "little") + arr.tobytes()


def pcm8_features(
    df: DataFrame, id_col: str, content_col: str = "content"
) -> DataFrame:
    """Audio feature extraction: (sample_rate, duration_s, rms,
    zero_crossing_rate) per PCM8 blob — the standard cheap audio-quality /
    silence-detection features, all exact numpy integer math (samples are
    centered at 128; a zero crossing is a sign change of sample−128).
    Malformed buffers yield nulls. Same Arrow-batch shape as the image
    kernels: swapping PCM8 for WAV/FLAC changes the frombuffer line only.
    """
    import numpy as np

    schema = (
        f"{id_col} long, sample_rate int, n_samples long, duration_s double, "
        "sum_sq long, crossings long, rms double, zero_crossing_rate double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[content_col]):
                b = bytes(buf)
                if len(b) <= PCM8_HEADER_BYTES:
                    rows.append((i, None, None, None, None, None, None, None))
                    continue
                rate = int.from_bytes(b[0:4], "little")
                if rate == 0:
                    rows.append((i, None, None, None, None, None, None, None))
                    continue
                s = np.frombuffer(
                    b, dtype=np.uint8, offset=PCM8_HEADER_BYTES
                ).astype(np.int64) - 128
                # Integer cores (sum of squares, crossing count) are kept
                # as BIGINT outputs: the float rms/zcr are single
                # correctly-rounded IEEE ops over them (sqrt, divide), so
                # every column replays bit-identically cross-engine — the
                # basis of q110's exact oracle.
                sum_sq = int((s * s).sum(dtype=np.int64))
                rms = float(np.sqrt(sum_sq / len(s)))
                signs = np.sign(s)
                nz = signs[signs != 0]
                crossings = int(np.count_nonzero(np.diff(nz) != 0))
                zcr = crossings / max(len(s) - 1, 1)
                rows.append(
                    (i, rate, len(s), len(s) / rate,
                     sum_sq, crossings, rms, float(zcr))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_samples", "duration_s",
                    "sum_sq", "crossings", "rms", "zero_crossing_rate",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(kernel, schema)
