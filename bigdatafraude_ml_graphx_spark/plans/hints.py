"""Size-guarded join hints.

``F.broadcast(df)`` is an ORDER, not a suggestion: Spark will materialize
the frame on the driver and ship it to every executor no matter how big it
turns out to be. That is the right call for bounded dimensions (nation,
region — constant row counts at any scale factor) and provably tiny frames
(a top-k result, a one-row global aggregate). It is the WRONG call for any
table that grows linearly with scale factor (customer, supplier, part,
per-key aggregates over them): at sf0.1 the hint is free, at 100 TB it is a
driver/executor memory bomb.

:func:`broadcast_if_small` applies the hint only when Catalyst's own
optimized-plan size estimate is under the session's
``spark.sql.autoBroadcastJoinThreshold`` (or an explicit byte budget).
Above the budget the frame is returned UNHINTED — the static planner picks
sort-merge and AQE converts back to broadcast at runtime if the
post-filter size turns out small, which is exactly the decision order you
want at scale: estimates propose, runtime sizes dispose.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def parse_byte_conf(value: str) -> int:
    """Parse a Spark byte-size conf string ('10485760b', '10MB', '-1')."""
    m = re.fullmatch(r"\s*(-?\d+)\s*([a-zA-Z]*)\s*", str(value))
    if not m:
        raise ValueError(f"unparseable byte size: {value!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    if n < 0:
        return -1
    if unit and unit not in _UNITS:
        raise ValueError(f"unknown byte unit in {value!r}")
    return n * _UNITS.get(unit, 1)


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for ``df`` in bytes.

    File-backed scans use real file sizes; derived plans use Catalyst's
    propagation heuristics — coarse, but coarse-OVER-estimates only ever
    drop the hint (safe), never force a huge broadcast.
    """
    stats = df._jdf.queryExecution().optimizedPlan().stats()  # noqa: SLF001
    return int(str(stats.sizeInBytes()))


def broadcast_if_small(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast hint gated on the plan-size estimate.

    ``max_bytes`` defaults to the session's autoBroadcastJoinThreshold;
    pass an explicit budget to decouple from session conf. A non-positive
    budget (threshold -1 = broadcast disabled) always returns ``df``
    unhinted.
    """
    if max_bytes is None:
        conf = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760b"
        )
        max_bytes = parse_byte_conf(conf)
    if max_bytes <= 0:
        return df
    return F.broadcast(df) if plan_size_bytes(df) <= max_bytes else df
