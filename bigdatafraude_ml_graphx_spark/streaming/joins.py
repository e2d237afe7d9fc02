"""Stream-stream joins (SURVEY §2.9 'not present' row — the reference never
joins two streams; first-class here).

Spark requires watermarks on both sides plus a time-range condition so state
is bounded: each side buffers only rows younger than (watermark − range).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``on`` with the right event constrained to
    [left_ts − max_lag, left_ts + max_lag]. The symmetric time bound plus the
    two watermarks gives Spark a state-eviction guarantee on BOTH buffers.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    bound = (
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_lag}"))
    )
    return lw.join(rw, on & bound, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream against a static dimension table.

    The everyday streaming join the reference approximates by re-reading
    parquet in a while-loop (``streaming/.ipynb_checkpoints/
    spark_streaming-checkpoint.py:48-110``): here the static side is planned
    once per micro-batch with no state store at all (stream-static joins are
    stateless). ``broadcast_dim`` ships the dimension to executors instead of
    shuffling every micro-batch — right whenever the dim fits in memory;
    disable it for huge dims and pre-bucket both sides instead.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
