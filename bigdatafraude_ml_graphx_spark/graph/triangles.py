"""Degree-ordered (compact-forward) triangle counting.

The naive enumeration joins the edge list with itself twice; on a skewed
graph one hub vertex of degree d contributes d·(d-1)/2 wedges to a single
join key, so the wedge stage is quadratic in the maximum degree — at 100×
scale one celebrity vertex dominates a task while the rest of the cluster
idles. The published fix (Latapy 2008, "compact-forward"; also the
GraphX/Spark `TriangleCount` strategy) orients every undirected edge from
its LOWER-degree endpoint to its higher-degree endpoint (ties broken by
vertex id, making the orientation a total order and therefore acyclic).
Each triangle {a, b, c} with rank(a) < rank(b) < rank(c) is then counted
exactly once as the wedge (a→b, a→c) closed by (b→c), and the wedge fan-out
of any vertex is bounded by its OUT-degree — at most O(√|E|) for every
vertex regardless of skew (a vertex keeps an out-edge only toward
higher-ranked neighbors).

All DataFrame ops (two degree joins, one wedge self-join, one closing
equi-join) — no UDFs, no collect; AQE handles residual key skew.
Reference parity: the reference has no triangle operator (its graph
notebooks stop at degrees/PageRank, `notebooks/4_graphx.ipynb`); this is
part of the post-graph analytics suite a fraud team layers on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Reorient canonical undirected edges (src, dst) low-rank → high-rank.

    Rank is (degree, id) lexicographic. Returns columns
    ``(lo, hi, hi_deg)`` — ``hi_deg`` rides along so the wedge join can
    order the two far endpoints without re-joining degrees.
    """
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    ed = (
        edges.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    )
    src_is_lo = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return ed.select(
        F.when(src_is_lo, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_is_lo, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(src_is_lo, F.col("ddeg")).otherwise(F.col("sdeg")).alias("hi_deg"),
    )


def wedges(oriented: DataFrame) -> DataFrame:
    """All rank-ordered wedges (lo → b, lo → c) with rank(b) < rank(c).

    The join key is ``lo`` — by construction every vertex's out-degree is
    bounded (hubs have NO out-edges except toward even-higher-rank hubs),
    so no single key explodes. Exposed separately so tests can assert the
    wedge-stage row count on adversarial fixtures.
    """
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    rank_lt = (F.col("e1.hi_deg") < F.col("e2.hi_deg")) | (
        (F.col("e1.hi_deg") == F.col("e2.hi_deg"))
        & (F.col("e1.hi") < F.col("e2.hi"))
    )
    return e1.join(e2, (F.col("e1.lo") == F.col("e2.lo")) & rank_lt).select(
        F.col("e1.hi").alias("b"), F.col("e2.hi").alias("c")
    )


def triangle_count(edges: DataFrame, materialize: bool = True) -> DataFrame:
    """Total triangles in the undirected graph given canonical (src < dst)
    edges. One row, column ``n_triangles`` (bigint).

    The caller should materialize ``edges`` (cache / localCheckpoint) —
    the frame is referenced by three join sides and would otherwise
    recompute its lineage once per side.

    ``materialize=True`` (default) eagerly ``localCheckpoint``s the oriented
    edge list: it too feeds three join sides (both wedge aliases + the
    closing side), and recomputing its two degree joins per side would
    triple the shuffle volume. Same eager/non-recoverable contract as the
    dedup pair operators (see ``lsh_candidate_pairs``); pass ``False`` to
    stay fully lazy when composing.
    """
    oriented = orient_by_degree(edges)
    if materialize:
        oriented = oriented.localCheckpoint(eager=True)
    closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    return (
        wedges(oriented)
        .join(closing, ["b", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )


def triangle_edge_incidences(
    edges: DataFrame, materialize: bool = True
) -> DataFrame:
    """One row per (triangle, edge) incidence → ``(u, v, w)``: canonical
    edge (u < v) plus the triangle's third vertex ``w`` — i.e. the
    common-neighbor relation of every edge, enumerated through the
    compact-forward wedge join instead of a symmetric-adjacency self-join.

    Why it matters: the naive ``N(u) ∩ N(v)`` wedge join keys on raw
    vertices, so a degree-D hub contributes D² rows to one key; here every
    triangle is found once from its lowest-rank corner (wedge fan-out
    ≤ O(√E) per vertex) and then exploded into its 3 edge incidences —
    the hub-proof plan k-truss support and link-prediction features
    (q180/q182) build on."""
    oriented = orient_by_degree(edges)
    if materialize:
        oriented = oriented.localCheckpoint(eager=True)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    rank_lt = (F.col("e1.hi_deg") < F.col("e2.hi_deg")) | (
        (F.col("e1.hi_deg") == F.col("e2.hi_deg"))
        & (F.col("e1.hi") < F.col("e2.hi"))
    )
    tri = (
        e1.join(e2, (F.col("e1.lo") == F.col("e2.lo")) & rank_lt)
        .select(
            F.col("e1.lo").alias("a"),
            F.col("e1.hi").alias("b"),
            F.col("e2.hi").alias("c"),
        )
        .join(
            oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
            ["b", "c"],
        )
    )
    inc = lambda x, y, z: F.struct(  # noqa: E731
        F.least(x, y).alias("u"), F.greatest(x, y).alias("v"), z.alias("w")
    )
    return tri.select(
        F.explode(
            F.array(
                inc(F.col("a"), F.col("b"), F.col("c")),
                inc(F.col("a"), F.col("c"), F.col("b")),
                inc(F.col("b"), F.col("c"), F.col("a")),
            )
        ).alias("i")
    ).select("i.u", "i.v", "i.w")


def per_vertex_triangle_counts(edges: DataFrame, materialize: bool = True) -> DataFrame:
    """Triangles incident to each vertex → ``(id, n_triangles)``.

    Same compact-forward discipline as :func:`triangle_count`, but the
    closed wedge keeps its apex so the triple (a, b, c) can credit all
    three corners: one extra explode of the (tiny) triangle set, no new
    shuffle shape. Vertices on no triangle are absent (join back to a
    vertex frame for a dense census)."""
    oriented = orient_by_degree(edges)
    if materialize:
        oriented = oriented.localCheckpoint(eager=True)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    rank_lt = (F.col("e1.hi_deg") < F.col("e2.hi_deg")) | (
        (F.col("e1.hi_deg") == F.col("e2.hi_deg"))
        & (F.col("e1.hi") < F.col("e2.hi"))
    )
    wed = e1.join(e2, (F.col("e1.lo") == F.col("e2.lo")) & rank_lt).select(
        F.col("e1.lo").alias("a"),
        F.col("e1.hi").alias("b"),
        F.col("e2.hi").alias("c"),
    )
    closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wed.join(closing, ["b", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
