"""Streaming tests (SURVEY §5.4): stream/batch equivalence on replayed files,
real watermark semantics (window finalization + late-data drop), and the
distributed foreachBatch sink."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.streaming import (
    file_stream,
    foreach_batch_sink,
    memory_sink,
    run_available_now,
    windowed_agg,
)
from bigdatafraude_ml_graphx_spark.streaming.events import events_stream


def test_stream_batch_equivalence(spark, sf_dir):
    """availableNow replay of the events table through a tumbling window must
    equal the same aggregation computed in batch."""
    agg = windowed_agg(
        events_stream(spark, sf_dir),
        ts_col="ts",
        window="1 hour",
        watermark=None,
        group_cols=("event_type",),
        aggs=(F.count("*").alias("n_events"),),
    )
    q = memory_sink(agg, "equiv_sink", output_mode="complete", available_now=True)
    run_available_now(q)
    streamed = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("equiv_sink").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_agg(
            load_table(spark, sf_dir, "events"),
            ts_col="ts",
            window="1 hour",
            group_cols=("event_type",),
            aggs=(F.count("*").alias("n_events"),),
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0


@pytest.fixture()
def staged_files(spark, tmp_path):
    """Three files, mtime-ordered so the file source replays them in order:
    f0: events in hour 10; f1: event at 12:00 (advances watermark past 11:00);
    f2: a LATE event back in hour 10 (behind the watermark)."""
    d = str(tmp_path / "stream_src")
    os.makedirs(d)

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "ts timestamp, k string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_{name}")
        # move the part file into the source dir under a stable name
        part = [
            f for f in os.listdir(f"{d}/_{name}") if f.endswith(".parquet")
        ][0]
        os.rename(f"{d}/_{name}/{part}", f"{d}/{name}.parquet")
        os.utime(f"{d}/{name}.parquet", (mtime, mtime))

    import datetime as dt

    h10 = dt.datetime(2024, 1, 1, 10, 0, 0)
    base = time.time() - 1000
    write_file("f0", [(h10.replace(minute=5), "a"), (h10.replace(minute=50), "a")], base)
    # f1 pushes the watermark past 11:00; f1b triggers the batch in which the
    # hour-10 window is evicted+emitted (eviction happens at end-of-batch, so
    # a separate batch is needed); f2 is then genuinely late — its window is
    # already finalized and the row must be dropped, not re-aggregated.
    write_file("f1", [(dt.datetime(2024, 1, 1, 12, 0, 0), "a")], base + 100)
    write_file("f1b", [(dt.datetime(2024, 1, 1, 12, 30, 0), "a")], base + 200)
    write_file("f2", [(h10.replace(minute=30), "late")], base + 300)
    return d


def test_watermark_finalizes_and_drops_late(spark, staged_files):
    stream = file_stream(
        spark, staged_files, "ts timestamp, k string",
        max_files_per_trigger=1,
    )
    agg = windowed_agg(
        stream, ts_col="ts", window="1 hour", watermark="5 minutes",
        aggs=(F.count("*").alias("n"),),
    )
    q = memory_sink(agg, "wm_sink", output_mode="append", available_now=True)
    run_available_now(q)
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    rows = {
        r["window_start"]: r["n"] for r in spark.table("wm_sink").collect()
    }
    import datetime as dt

    h10 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # Hour-10 window finalized when the watermark passed 11:00 — and it must
    # NOT include the late f2 row, which the watermark drops.
    assert rows.get(h10) == 2
    assert dropped == 1
    # Hour-12 window never finalized (watermark never passed 13:00).
    assert dt.datetime(2024, 1, 1, 12, 0, 0) not in rows


def test_foreach_batch_distributed_write(spark, sf_dir, tmp_path):
    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")

    def write_batch(batch_df, batch_id):
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    stream = events_stream(spark, sf_dir)
    q = foreach_batch_sink(
        stream, write_batch, checkpoint=ckpt, available_now=True,
        output_mode="append",
    )
    run_available_now(q)
    written = spark.read.parquet(out)
    assert written.count() == load_table(spark, sf_dir, "events").count()
    assert "batch_id" in written.columns


class _RecordingReader:
    """Stand-in for spark.readStream that records the option plumbing —
    the sandbox has no Kafka broker, so we verify kafka_stream builds the
    exact reader the reference builds (spark_streaming.py:26-30,
    streaming_config.yaml:11) without calling load() against a broker."""

    def __init__(self):
        self.fmt = None
        self.options = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self, path=None):
        self.loaded = True
        return self


class _FakeSparkSession:
    def __init__(self, reader):
        self._reader = reader

    @property
    def readStream(self):
        return self._reader


def test_kafka_stream_option_plumbing():
    from bigdatafraude_ml_graphx_spark.streaming.source import kafka_stream

    rec = _RecordingReader()
    kafka_stream(
        _FakeSparkSession(rec),
        bootstrap_servers="broker1:9092,broker2:9092",
        topic="transactions",
        starting_offsets="earliest",
    )
    assert rec.fmt == "kafka"
    assert rec.options == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "transactions",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": 1000,  # reference's rate-limit default
    }
    assert rec.loaded


def test_kafka_stream_rate_limit_opt_out():
    from bigdatafraude_ml_graphx_spark.streaming.source import kafka_stream

    rec = _RecordingReader()
    kafka_stream(
        _FakeSparkSession(rec), "b:9092", "t", max_offsets_per_trigger=None
    )
    assert "maxOffsetsPerTrigger" not in rec.options


def test_parquet_sink_exactly_once_on_restart(spark, sf_dir, tmp_path):
    """The checkpointed parquet sink is exactly-once across restarts: a
    drained availableNow query writes the full source once; restarting the
    SAME query (same checkpoint) against an unchanged source commits nothing
    new — offsets are replayed from the checkpoint, not re-ingested."""
    from bigdatafraude_ml_graphx_spark.streaming import parquet_sink, run_available_now

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q1 = parquet_sink(events_stream(spark, sf_dir), out, ckpt)
    run_available_now(q1)
    batch_n = load_table(spark, sf_dir, "events").count()
    first = spark.read.parquet(out)
    assert first.count() == batch_n
    # every source row arrived exactly once
    assert first.select("event_id").distinct().count() == batch_n

    q2 = parquet_sink(events_stream(spark, sf_dir), out, ckpt)
    run_available_now(q2)
    assert spark.read.parquet(out).count() == batch_n  # no duplication
