"""Event-time windows + watermarks — the capability the reference DECLARES
but never implements (``watermark: "5 minutes"`` in
``/root/reference/streaming/streaming_config.yaml:17`` with no
``withWatermark`` anywhere; SURVEY §2.9 T4). Here it's real: late data beyond
the watermark is dropped from windowed aggregates, which is what bounds state
size on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "5 minutes",
    group_cols: tuple[str, ...] = (),
    aggs: tuple[Column, ...] = (),
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) event-time windowed aggregation.

    Works identically on a stream (stateful, watermark-bounded) and on a
    batch frame (plain group-by) — the batch path is how tests assert
    stream/batch equivalence (SURVEY §5.4). Output: ``window_start``,
    ``window_end``, group columns, then the aliased aggregates.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    agg_exprs = list(aggs) or [F.count("*").alias("n_events")]
    return (
        df.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(*agg_exprs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def dedup_stream(
    df: DataFrame, keys: tuple[str, ...], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon
    (``dropDuplicates`` with bounded state).

    State is bounded because ``ts_col`` is part of the dedup key, so entries
    older than the watermark are evicted — but that also means two events
    with the same keys and DIFFERENT timestamps both survive. For
    retransmission-style duplicates (same key, jittered ts) use
    :func:`dedup_stream_fuzzy_ts`."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.dropDuplicates([*keys, ts_col])


def dedup_stream_fuzzy_ts(
    df: DataFrame, keys: tuple[str, ...], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming dedup on ``keys`` alone: duplicates whose event times differ
    (retries, at-least-once sources) collapse to the first arrival, with
    state still bounded by the watermark — ``dropDuplicatesWithinWatermark``
    evicts a key's entry once the watermark passes its event time, so the
    store never grows beyond one horizon of distinct keys."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))
