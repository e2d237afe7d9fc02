"""Multimodal plumbing tests: binary schema, Arrow-batched mapInPandas
kernel shapes, histogram invariants, frame-sampling arithmetic, and the
clearly-marked decode stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.multimodal import (
    as_media,
    byte_histogram_features,
    byte_stats,
    decode_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    return as_media(d, F.encode(F.col("text"), "UTF-8"), mime="text/plain")


def test_media_schema(media):
    schema = dict(media.dtypes)
    assert schema["content"] == "binary"
    assert schema["meta"].startswith("struct<mime:string")


def test_byte_stats_match_text_length(media):
    rows = byte_stats(media).select("doc_id", "byte_len", F.length("text").alias("tl")).collect()
    # ascii-ish synthetic text: utf-8 byte length ≥ char length, > 0
    assert all(r["byte_len"] >= r["tl"] > 0 for r in rows)


def test_byte_histogram_features(media):
    feats = byte_histogram_features(media, "doc_id").collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r["features"]) == 16
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized histogram
        assert r["byte_len"] > 0


def test_histogram_deterministic(media):
    a = {r["doc_id"]: r["features"] for r in byte_histogram_features(media, "doc_id").collect()}
    b = {r["doc_id"]: r["features"] for r in byte_histogram_features(media, "doc_id").collect()}
    assert a == b


def test_frame_sampling(spark):
    df = spark.createDataFrame([(1, 3.5), (2, 0.4)], "vid long, dur double")
    media = as_media(
        df, F.encode(F.lit("x"), "UTF-8"), mime="video/mp4",
        duration_s=F.col("dur"),
    )
    frames = sample_frames(media, every_s=1.0)
    per_vid = {
        r["vid"]: r["n"]
        for r in frames.groupBy("vid").agg(F.count("*").alias("n")).collect()
    }
    # duration 3.5s → frame_ts 0,1,2,3 (4 frames); 0.4s → just frame 0
    assert per_vid == {1: 4, 2: 1}
    ts = [r["frame_ts"] for r in frames.filter(F.col("vid") == 1).collect()]
    assert sorted(ts) == [0.0, 1.0, 2.0, 3.0]


def test_decode_stub_clearly_marked(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present; stub not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(media, "doc_id")


def test_raw8_decode_real_kernel(spark):
    from bigdatafraude_ml_graphx_spark.multimodal.binary import (
        decode_raw8,
        encode_raw8,
    )

    import numpy as np

    img = np.arange(12, dtype="uint8").reshape(3, 4)  # 4x3, mean 5.5
    rows = [
        (1, bytearray(encode_raw8(4, 3, img))),
        (2, bytearray(b"\x01\x02")),  # truncated header -> nulls
        (3, bytearray(encode_raw8(2, 2, [[8, 8], [8, 8]]))),
    ]
    df = spark.createDataFrame(rows, "img_id long, content binary").repartition(3)
    out = {r["img_id"]: r for r in decode_raw8(df, "img_id").collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["mean_pixel"]) == (4, 3, 5.5)
    assert out[2]["width"] is None and out[2]["mean_pixel"] is None
    assert (out[3]["width"], out[3]["mean_pixel"]) == (2, 8.0)


def test_raw8_resize_composes_and_is_deterministic(spark):
    from bigdatafraude_ml_graphx_spark.multimodal.binary import (
        decode_raw8,
        encode_raw8,
        resize_raw8,
    )

    import numpy as np

    # 4x4 image with distinct quadrants; nearest-neighbor 2x2 keeps corners
    img = np.array(
        [[0, 0, 100, 100], [0, 0, 100, 100], [200, 200, 50, 50], [200, 200, 50, 50]],
        dtype="uint8",
    )
    df = spark.createDataFrame(
        [(7, bytearray(encode_raw8(4, 4, img)))], "img_id long, content binary"
    )
    small = resize_raw8(df, "img_id", 2, 2)
    # output is RAW8 again: decode it back through the same kernel
    meta = decode_raw8(small, "img_id").collect()[0]
    assert (meta["width"], meta["height"]) == (2, 2)
    buf = bytes(small.collect()[0]["content"])
    pixels = np.frombuffer(buf, dtype=np.uint8, offset=8).reshape(2, 2)
    assert pixels.tolist() == [[0, 100], [200, 50]]


def test_rawv_frame_extraction_stride_and_compose(spark):
    """Every 2nd frame extracted with exact pixel means; sampled frames are
    valid RAW8 (decode composes); malformed blobs yield zero frames."""
    import numpy as np

    from bigdatafraude_ml_graphx_spark.multimodal import (
        decode_raw8,
        encode_rawv,
        extract_rawv_frames,
    )

    frames = np.stack([np.full((4, 4), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)])
    df = spark.createDataFrame(
        [(1, bytearray(encode_rawv(4, 4, frames))), (2, bytearray(b"bogus"))],
        "vid long, content binary",
    )
    out = extract_rawv_frames(df, "vid", stride=2).collect()
    got = {(r.vid, r.frame_idx): r.mean_pixel for r in out}
    assert got == {(1, 0): 10.0, (1, 2): 30.0, (1, 4): 50.0}
    # frames are standalone RAW8: decoding them reproduces the means
    frames_df = spark.createDataFrame(
        [(r.frame_idx, bytearray(r.frame)) for r in out],
        "fid long, content binary",
    )
    dec = {r.fid: r.mean_pixel for r in decode_raw8(frames_df, "fid").collect()}
    assert dec == {0: 10.0, 2: 30.0, 4: 50.0}


def test_pcm8_features_exact(spark):
    """RMS and zero-crossing rate computed exactly on a known square wave."""
    import numpy as np

    from bigdatafraude_ml_graphx_spark.multimodal import encode_pcm8, pcm8_features

    # square wave +/-50 around 128, period 4: zcr = crossings/(n-1)
    samples = np.tile([178, 178, 78, 78], 25).astype(np.uint8)  # 100 samples
    df = spark.createDataFrame(
        [(1, bytearray(encode_pcm8(8000, samples))), (2, bytearray(b"\x00\x00"))],
        "clip long, content binary",
    )
    rows = {r.clip: r for r in pcm8_features(df, "clip").collect()}
    r1 = rows[1]
    assert r1.sample_rate == 8000 and r1.n_samples == 100
    assert r1.duration_s == 100 / 8000
    assert r1.rms == 50.0
    assert abs(r1.zero_crossing_rate - 49 / 99) < 1e-12
    assert rows[2].sample_rate is None


def test_pixel_histogram_exact_counts_and_corrupt_null(spark):
    from bigdatafraude_ml_graphx_spark.multimodal.binary import (
        encode_raw8,
        pixel_histogram_raw8,
    )

    import numpy as np

    img = np.array([[0, 63, 64, 127], [128, 191, 192, 255]], dtype="uint8")
    rows = [
        (1, bytearray(encode_raw8(4, 2, img))),
        (2, bytearray(b"\x00")),  # truncated -> nulls
        (3, bytearray(encode_raw8(2, 1, [[200, 201]]))),  # all bin 3
    ]
    df = spark.createDataFrame(rows, "img_id long, content binary").repartition(2)
    out = {r["img_id"]: r for r in pixel_histogram_raw8(df, "img_id").collect()}
    assert [out[1][f"bin_{k}"] for k in range(4)] == [2, 2, 2, 2]
    assert out[1]["dominant_bin"] == 0  # tie -> first maximum (darkest)
    assert out[2]["bin_0"] is None and out[2]["dominant_bin"] is None
    assert out[3]["bin_3"] == 2 and out[3]["dominant_bin"] == 3


def test_pixel_histogram_rejects_bad_bins(spark):
    import pytest

    from bigdatafraude_ml_graphx_spark.multimodal.binary import (
        pixel_histogram_raw8,
    )

    df = spark.createDataFrame([(1, bytearray(b""))], "img_id long, content binary")
    with pytest.raises(ValueError):
        pixel_histogram_raw8(df, "img_id", n_bins=3)
