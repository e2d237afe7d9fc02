"""Hierarchical time-bucket rollup (hypertable-style continuous aggregate).

The reference's only time bucketing is the hour collapse inside the
co-occurrence join (``notebooks/4_graphx.ipynb:200``, ``Time/3600``). A
time-series store generalizes this to multi-resolution rollups (minute → hour
→ day). The scale-critical property: each coarser level is derived from the
NEXT FINER level's partial aggregates, not from the raw table — at 100 TB the
raw scan happens exactly once, and every additional resolution costs only a
shuffle of the (already tiny) finer rollup.

That derivation is only correct for **mergeable aggregates**: count is a sum
of counts, sum a sum of sums, min a min of mins, max a max of maxes. Averages
are derived at the end (sum/count), never merged. Sums stay DECIMAL through
the hierarchy (:mod:`..functions.deterministic` — decimal addition is exact
and associative, so a day sum assembled from hour sums is bit-identical to a
day sum over raw rows) and are cast to double only at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# truncation labels in fine→coarse order, as accepted by F.date_trunc
_LEVEL_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]

_PREC = "decimal(28,6)"


def hierarchical_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    levels: list[str],
) -> DataFrame:
    """Multi-resolution rollup of ``value_col`` with count/sum/min/max.

    ``levels`` must be ordered fine→coarse (subset of minute/hour/day/week/
    month/quarter/year). Returns the union of all levels with columns
    ``(level, *key_cols, bucket_start, n, value_sum, value_min, value_max)``.
    Only the finest level scans ``df``; each coarser level re-aggregates the
    previous level's mergeable partials.
    """
    order = {name: i for i, name in enumerate(_LEVEL_ORDER)}
    if [order[lv] for lv in levels] != sorted(order[lv] for lv in levels):
        raise ValueError(f"levels must be fine->coarse: {levels}")

    finest = levels[0]
    current = df.groupBy(
        *key_cols, F.date_trunc(finest, F.col(ts_col)).alias("bucket_start")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast(_PREC)).alias("__dec_sum"),
        F.min(value_col).alias("value_min"),
        F.max(value_col).alias("value_max"),
    )

    def finalize(level_df: DataFrame, name: str) -> DataFrame:
        return level_df.select(
            F.lit(name).alias("level"),
            *key_cols,
            "bucket_start",
            "n",
            F.col("__dec_sum").cast("double").alias("value_sum"),
            "value_min",
            "value_max",
        )

    out = finalize(current, finest)
    for coarser in levels[1:]:
        current = current.groupBy(
            *key_cols, F.date_trunc(coarser, F.col("bucket_start")).alias("bucket_start")
        ).agg(
            F.sum("n").alias("n"),
            F.sum("__dec_sum").alias("__dec_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        out = out.unionByName(finalize(current, coarser))
    return out
