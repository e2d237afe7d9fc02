"""Composable relational operator builders (SURVEY §2.2, §2.4-2.6).

Each helper returns a DataFrame (a Catalyst plan) — nothing executes until an
action, so these compose freely and the optimizer sees the whole pipeline.
They capture the reference's recurring shapes once, instead of the notebook's
copy-pasted variants.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dstddev_samp, dsum


def null_census(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column null counts in ONE pass (P7/A4):
    ``/root/reference/notebooks/1_data_cleaning.ipynb:167-171``."""
    cols = list(cols or df.columns)
    return df.select(
        [F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls") for c in cols]
    )


def bucketize(
    col: Column | str, bounds: Sequence[float], labels: Sequence[str]
) -> Column:
    """CASE-WHEN range binning (P8): the reference's amount-range histograms
    (``notebooks/2_sql_analysis.ipynb:368-373``). ``len(labels)`` must be
    ``len(bounds) + 1``; bounds are upper-exclusive."""
    if len(labels) != len(bounds) + 1:
        raise ValueError("need len(bounds)+1 labels")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for bound, label in zip(bounds, labels[:-1]):
        expr = (
            F.when(c < bound, label)
            if expr is None
            else expr.when(c < bound, label)
        )
    return expr.otherwise(labels[-1])


def describe_stats(df: DataFrame, col: str) -> DataFrame:
    """Deterministic ``describe()`` (A5): count/mean/stddev/min/max as a
    plain aggregate with order-independent float math."""
    c = F.col(col)
    return df.agg(
        F.count(c).alias("cnt"),
        davg(c, "mean"),
        dstddev_samp(c, "stddev"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
    )


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (O4) — compiles to TakeOrderedAndProject: per-partition
    heaps + driver merge of k rows, never a full sort."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via ranking window (§2.5) — partition-local sort only."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def dedup_rows(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """distinct / dropDuplicates (P10)."""
    return df.dropDuplicates(list(cols)) if cols else df.distinct()


def agg_by(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    avg_cols: Sequence[str] = (),
    stddev_cols: Sequence[str] = (),
    count: bool = True,
) -> DataFrame:
    """The reference's multi-aggregate shape (A2,
    ``notebooks/2_sql_analysis.ipynb:237-256``) with deterministic float
    aggregates and generated-name-free aliases (fixes A6's
    ``withColumnRenamed("sum(amount)", ...)`` pattern)."""
    aggs: list[Column] = []
    if count:
        aggs.append(F.count("*").alias("n"))
    aggs += [dsum(c, f"sum_{c}") for c in sum_cols]
    aggs += [davg(c, f"avg_{c}") for c in avg_cols]
    aggs += [dstddev_samp(c, f"stddev_{c}") for c in stddev_cols]
    aggs += [F.min(c).alias(f"min_{c}") for c in sum_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in sum_cols]
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
