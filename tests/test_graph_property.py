"""Property-based check: connected_components vs a union-find reference.

Hypothesis drives random edge lists (self-loops, duplicate edges, isolated
vertices, single-node graphs); Spark's iterative min-label propagation must
produce exactly the union-find labeling (component id = min vertex id).
Each example runs a full multi-iteration Spark job, so examples are few but
adversarially shrunk — this is the harness that would have caught round-1's
string-id convergence defect with numeric-id analogues.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.graph.components import connected_components

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=15
)
_isolated = st.sets(st.integers(10, 14), max_size=3)


def _union_find(edges, vertices):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for v in vertices:
        roots.setdefault(find(v), []).append(v)
    return {v: min(members) for members in roots.values() for v in members}


@settings(max_examples=8, deadline=None)
@given(edges=_edges, isolated=_isolated)
def test_cc_matches_union_find(spark, edges, isolated):
    vertices = sorted({v for e in edges for v in e} | isolated)
    if not vertices:
        return
    edge_df = spark.createDataFrame(
        edges or [(None, None)], "src long, dst long"
    ).dropna()
    vert_df = spark.createDataFrame([(v,) for v in vertices], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edge_df, vertices=vert_df).collect()
    }
    assert got == _union_find(edges, vertices)


@settings(max_examples=8, deadline=None)
@given(edges=_edges, isolated=_isolated)
def test_cc_star_matches_union_find(spark, edges, isolated):
    from bigdatafraude_ml_graphx_spark.graph.components import (
        connected_components_star,
    )

    vertices = sorted({v for e in edges for v in e} | isolated)
    if not vertices:
        return
    edge_df = spark.createDataFrame(
        edges or [(None, None)], "src long, dst long"
    ).dropna()
    vert_df = spark.createDataFrame([(v,) for v in vertices], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(edge_df, vertices=vert_df).collect()
    }
    assert got == _union_find(edges, vertices)


def test_cc_star_long_chain(spark):
    """A 60-hop path — label propagation's worst case (O(diameter) rounds,
    here capped) is star contraction's best case (O(log) rounds)."""
    from bigdatafraude_ml_graphx_spark.graph.components import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    labels = connected_components_star(chain).collect()
    assert len(labels) == 61
    assert all(r["component"] == 0 for r in labels)
