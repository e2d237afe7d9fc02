"""Stream-stream joins and applyInPandasWithState stateful operators."""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.streaming import (
    file_stream,
    memory_sink,
    run_available_now,
)
from bigdatafraude_ml_graphx_spark.streaming.joins import stream_stream_join
from bigdatafraude_ml_graphx_spark.streaming.stateful import running_totals


def _write_files(spark, d, spec):
    """spec: list of (name, rows, schema, mtime_offset)."""
    os.makedirs(d, exist_ok=True)
    base = time.time() - 1000
    for name, rows, schema, off in spec:
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_{name}")
        part = [f for f in os.listdir(f"{d}/_{name}") if f.endswith(".parquet")][0]
        os.rename(f"{d}/_{name}/{part}", f"{d}/{name}.parquet")
        os.utime(f"{d}/{name}.parquet", (base + off, base + off))


def test_stream_stream_join(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    _write_files(
        spark, clicks_dir,
        [("c0", [(1, t0), (2, t0.replace(minute=10))], "uid long, cts timestamp", 0)],
    )
    _write_files(
        spark, buys_dir,
        [("b0",
          [(1, t0.replace(minute=3)),          # within 5 min of uid1 click ✓
           (2, t0.replace(minute=40)),         # 30 min after uid2 click ✗
           (3, t0.replace(minute=1))],         # no matching click ✗
          "uid long, bts timestamp", 0)],
    )
    clicks = file_stream(spark, clicks_dir, "uid long, cts timestamp")
    buys = file_stream(spark, buys_dir, "uid long, bts timestamp")
    joined = stream_stream_join(
        clicks.withColumnRenamed("uid", "cuid"),
        buys,
        on=F.col("cuid") == F.col("uid"),
        left_ts="cts",
        right_ts="bts",
        watermark="10 minutes",
        max_lag="5 minutes",
    )
    q = memory_sink(joined, "ssj_sink", output_mode="append", available_now=True)
    run_available_now(q)
    rows = spark.table("ssj_sink").collect()
    assert len(rows) == 1
    assert rows[0]["cuid"] == 1


def test_apply_in_pandas_with_state_running_totals(spark, tmp_path):
    d = str(tmp_path / "events")
    _write_files(
        spark, d,
        [
            ("f0", [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double", 0),
            ("f1", [(1, 2.0), (3, 7.0)], "user_id long, value double", 100),
        ],
    )
    stream = file_stream(
        spark, d, "user_id long, value double", max_files_per_trigger=1
    )
    totals = running_totals(stream)
    q = memory_sink(totals, "state_sink", output_mode="update", available_now=True)
    run_available_now(q)
    rows = spark.table("state_sink").collect()
    # Last emission per user reflects accumulated state across batches.
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total"])
    assert final[1] == (3, 17.0)  # 2 events in batch0 + 1 in batch1
    assert final[2] == (1, 1.0)
    assert final[3] == (1, 7.0)


def test_stateful_is_streaming_only(spark):
    df = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    with pytest.raises(Exception):
        running_totals(df).collect()


def test_stream_static_enrich(spark, tmp_path):
    from bigdatafraude_ml_graphx_spark.streaming.joins import stream_static_enrich
    from bigdatafraude_ml_graphx_spark.streaming.source import file_stream

    d = str(tmp_path / "enrich_src")
    schema = "user_id BIGINT, amount DOUBLE"
    _write_files(
        spark,
        d,
        [("b1", [(1, 10.0), (2, 20.0), (3, 30.0)], schema, 0)],
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id BIGINT, tier STRING"
    )
    enriched = stream_static_enrich(file_stream(spark, d, schema), dim, "user_id")
    q = memory_sink(enriched, "enrich_sink", output_mode="append", available_now=True)
    run_available_now(q)
    rows = {r["user_id"]: r["tier"] for r in spark.table("enrich_sink").collect()}
    # left semantics: unmatched stream rows survive with null tier
    assert rows == {1: "gold", 2: "silver", 3: None}


def test_dedup_stream_exact_vs_fuzzy_ts(spark, tmp_path):
    import datetime as dt

    from bigdatafraude_ml_graphx_spark.streaming.source import file_stream
    from bigdatafraude_ml_graphx_spark.streaming.windows import (
        dedup_stream,
        dedup_stream_fuzzy_ts,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "k BIGINT, ts TIMESTAMP"
    rows = [
        (1, base),
        (1, base),                              # exact duplicate
        (1, base + dt.timedelta(seconds=30)),   # same key, jittered ts
        (2, base),
    ]
    d = str(tmp_path / "dedup_src")
    _write_files(spark, d, [("b1", rows, schema, 0)])

    exact = dedup_stream(file_stream(spark, d, schema), ("k",), "ts")
    q1 = memory_sink(exact, "dedup_exact_sink", available_now=True)
    run_available_now(q1)
    # exact mode keeps the jittered-ts row: 3 survivors
    assert spark.table("dedup_exact_sink").count() == 3

    fuzzy = dedup_stream_fuzzy_ts(file_stream(spark, d, schema), ("k",), "ts")
    q2 = memory_sink(fuzzy, "dedup_fuzzy_sink", available_now=True)
    run_available_now(q2)
    # fuzzy mode collapses the retransmission: one row per key
    assert spark.table("dedup_fuzzy_sink").count() == 2


def test_transform_with_state_running_totals(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API) matches the
    applyInPandasWithState contract on the same input, under the RocksDB
    state store provider it requires.

    The runtime needs ``google.protobuf`` (the state-server wire format);
    skip when the sandbox lacks it — same gating policy as PIL codecs.
    """
    pytest.importorskip("google.protobuf.descriptor")
    from bigdatafraude_ml_graphx_spark.streaming.stateful import running_totals_tws

    d = str(tmp_path / "events_tws")
    _write_files(
        spark, d,
        [
            ("f0", [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double", 0),
            ("f1", [(1, 2.0), (3, 7.0)], "user_id long, value double", 100),
        ],
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = file_stream(
            spark, d, "user_id long, value double", max_files_per_trigger=1
        )
        totals = running_totals_tws(stream)
        q = memory_sink(totals, "tws_sink", output_mode="update", available_now=True)
        run_available_now(q)
        final = {}
        for r in spark.table("tws_sink").collect():
            final[r["user_id"]] = (r["n_events"], r["total"])
        assert final[1] == (3, 17.0)
        assert final[2] == (1, 1.0)
        assert final[3] == (1, 7.0)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_flushed_cache_sentinel_gates_validity(spark, sf_dir):
    """The ADVICE-r6 crash window: a cache directory that already has its
    events symlink but LOST the sentinel (crash between symlink creation
    and the sentinel os.replace) must be treated as INVALID and rebuilt —
    a dir-non-empty check would accept it and every watermark-gated tail
    row would silently vanish from q164-class replays."""
    from bigdatafraude_ml_graphx_spark.streaming.events import (
        events_stream_flushed,
    )

    from bigdatafraude_ml_graphx_spark.streaming.events import (
        _flush_cache_dir,
    )

    # Distinct flush_types → distinct md5 cache key → isolated cache dir.
    types = ("purchase", "view")
    events_stream_flushed(spark, sf_dir, flush_types=types)
    d = _flush_cache_dir(sf_dir, None, types)
    sentinel = os.path.join(d, "sentinel.parquet")
    assert os.path.exists(sentinel)

    # Simulate the crash: symlink present, sentinel gone.
    os.remove(sentinel)
    assert os.path.islink(os.path.join(d, "events.parquet"))
    events_stream_flushed(spark, sf_dir, flush_types=types)
    assert os.path.exists(sentinel), "cache not rebuilt after sentinel loss"
    # The restored sentinel must carry exactly one row per flush type.
    rows = spark.read.parquet(sentinel).collect()
    assert sorted(r["event_type"] for r in rows) == sorted(types)
    assert all(r["user_id"] == -1 for r in rows)


def test_flushed_cache_key_tracks_data_fingerprint(tmp_path, sf_dir):
    """ADVICE r8: regenerating events.parquet at the same sf_dir must
    invalidate the adaptive-sentinel cache — the key folds in a data
    fingerprint (part-file sizes + newest mtime), so stale sentinels
    derived from the old max ts are never reused."""
    import shutil

    from bigdatafraude_ml_graphx_spark.streaming.events import (
        _flush_cache_dir,
    )

    staged = str(tmp_path / "sfcopy")
    os.makedirs(staged)
    src = os.path.join(sf_dir, "events.parquet")
    dst = os.path.join(staged, "events.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)

    types = ("purchase",)
    k1 = _flush_cache_dir(staged, None, types)
    assert k1 == _flush_cache_dir(staged, None, types)  # stable when unchanged

    # "Regenerate" the data: same path, different bytes/mtime.
    part = dst
    if os.path.isdir(dst):
        part = next(
            os.path.join(r, f)
            for r, _, fs in os.walk(dst)
            for f in fs
            if f.endswith(".parquet")
        )
    os.utime(part, ns=(os.stat(part).st_mtime_ns + 10**9,) * 2)
    assert _flush_cache_dir(staged, None, types) != k1


def test_flushed_cache_stale_flush_ts_raises(spark, sf_dir):
    """Build-time staleness guard (ADVICE r6): a flush_ts that does not
    postdate the real events must fail loudly at cache build, not
    silently swallow the watermark-gated tail."""
    from bigdatafraude_ml_graphx_spark.streaming.events import (
        events_stream_flushed,
    )

    with pytest.raises(ValueError, match="does not[\\s]+postdate|postdate"):
        events_stream_flushed(
            spark, sf_dir, flush_ts="2000-01-01 00:00:00",
            flush_types=("purchase",),
        )
