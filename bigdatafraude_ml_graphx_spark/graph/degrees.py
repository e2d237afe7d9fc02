"""Degree centrality as a plain DataFrame aggregation.

Reference: ``g.degrees`` + distribution analysis
(``/root/reference/notebooks/4_graphx.ipynb:354-378``). GraphFrames'
``degrees`` is exactly ``explode([src,dst]) → groupBy(id).count()`` — a
single shuffle, no graph library needed (SURVEY.md §2.10 G2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Total degree per vertex over a directed edge list: in + out.

    ``explode(array(src, dst))``, not a two-branch unionAll: Spark plans
    union branches independently, so a union would execute the upstream edge
    lineage (e.g. a co-occurrence self-join) twice. The explode reads each
    edge row once — one scan, one shuffle, at any scale.
    """
    ids = edges.select(F.explode(F.array(F.col(src), F.col(dst))).alias("id"))
    return ids.groupBy("id").agg(F.count("*").alias("degree"))


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    return edges.groupBy(F.col(src).alias("id")).agg(
        F.count("*").alias("out_degree")
    )


def in_degrees(edges: DataFrame, dst: str = "dst") -> DataFrame:
    return edges.groupBy(F.col(dst).alias("id")).agg(
        F.count("*").alias("in_degree")
    )
