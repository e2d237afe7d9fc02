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


def k_core(edges, k: int, max_rounds: int = 50):
    """Vertices of the k-core: the maximal subgraph where every vertex has
    degree ≥ ``k`` — computed by iterative peeling (delete under-degree
    vertices, recompute, repeat to fixpoint), the standard cohesion /
    collusion-ring filter (a k-clique survives the (k−1)-core; hangers-on
    peel away). Returns ``(id, core_degree)`` — each survivor's degree
    WITHIN the core.

    Per round: one degree aggregate + two semi joins on the (shrinking)
    edge list, ``localCheckpoint`` lineage truncation, two-scalar
    convergence fingerprint — the components/bfs discipline. Rounds =
    peeling depth (≤ graph degeneracy ordering length), usually far
    below the vertex count; a round that removes nothing is the
    fixpoint. Budgets EFFECTIVE rounds (the confirming no-change round
    is free); raises if the budget is exhausted mid-peel.
    """
    from pyspark.sql import functions as F

    from .builders import symmetrize

    # Lazy too: round 1's fingerprint aggregate materializes it (no
    # dedicated init job).
    sym = symmetrize(edges).select("src", "dst").localCheckpoint(eager=False)
    prev = None
    changes = 0
    while True:
        deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        new = (
            sym.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            # LAZY: the fingerprint aggregate below materializes the
            # checkpoint — one job per peel round instead of two (r14,
            # the components.py r13 fusion; truncation unchanged).
            .localCheckpoint(eager=False)
        )
        row = new.agg(
            F.count("*").alias("n"), F.sum(F.col("src") + F.col("dst")).alias("s")
        ).collect()[0]
        fp = (row["n"], row["s"])
        sym = new
        if fp == prev:
            break
        changes += 1
        if changes > max_rounds:
            raise RuntimeError(
                f"k_core: peeling did not stabilize within "
                f"max_rounds={max_rounds}; raise the budget."
            )
        prev = fp
    return sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("core_degree")
    )
