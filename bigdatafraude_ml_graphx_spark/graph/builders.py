"""Graph construction from relational tables.

The reference builds fraud co-occurrence edges with a theta self-join whose
only equi-component is the derived expression ``(Time/3600).cast(int)``
(``/root/reference/notebooks/4_graphx.ipynb:193-208, cell db571b76``) — at
scale that degenerates to a nested-loop join (SURVEY.md §4 "theta-join
avoidance"). The engine's formulation materializes the bucket as a real
column FIRST, so Catalyst provably plans an equi join (sort-merge / shuffled
hash, AQE-skew-splittable), then applies the residual predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    bucket: str = "hour",
    extra_keys: tuple[str, ...] = (),
    predicate: Column | None = None,
) -> DataFrame:
    """Build undirected co-occurrence edges: two entities are connected when
    they appear in the same time bucket (+ optional extra equi-keys).

    Returns ``(src, dst, weight)`` with ``src < dst`` (one canonical row per
    unordered pair) and ``weight`` = number of co-occurring bucket events.

    Scale notes: the join is a pure equi join on
    ``(bucket, *extra_keys)``; hot buckets are handled by AQE skew-join
    splitting. Pre-aggregation to one row per (entity, bucket) bounds the
    join input to distinct-pairs work instead of raw-row cross products.
    """
    bucketed = df.select(
        F.col(entity_col).alias("entity"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        *[F.col(k) for k in extra_keys],
    )
    if predicate is not None:
        bucketed = bucketed.filter(predicate)
    # One row per (entity, bucket[, keys]) — collapses duplicate events
    # before the quadratic pair build.
    bucketed = bucketed.distinct()

    keys = ["bucket", *extra_keys]
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    cond.append(F.col("a.entity") < F.col("b.entity"))
    return (
        a.join(b, cond, "inner")
        .groupBy(
            F.col("a.entity").alias("src"),
            F.col("b.entity").alias("dst"),
        )
        .agg(F.count("*").alias("weight"))
    )


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: each edge emitted in both directions.

    ``explode`` of the two orientations, not a two-branch union: Spark plans
    union branches independently, so a union re-executes the upstream edge
    lineage (often an expensive self-join) once per branch. The explode
    doubles rows in a single pass over one execution — same output, half the
    work, at any scale.
    """
    cols = edges.columns
    payload = [c for c in cols if c not in (src, dst)]
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
            )
        ).alias("__sym"),
        *payload,
    )
    return both.select(
        F.col("__sym.s").alias(src), F.col("__sym.d").alias(dst), *payload
    ).select(*cols)
