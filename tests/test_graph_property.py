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


def test_k_truss_matches_bruteforce_on_random_graphs(spark):
    """Engine k-truss == a Python reference peel on random graphs —
    the union-find-style cross-check the CC algorithms carry."""
    import random

    from bigdatafraude_ml_graphx_spark.graph.truss import k_truss

    def brute_truss(edges, k):
        es = {tuple(sorted(e)) for e in edges}
        changed = True
        while changed:
            changed = False
            adj = {}
            for u, v in es:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            keep = set()
            for u, v in es:
                if len(adj[u] & adj[v]) >= k - 2:
                    keep.add((u, v))
            if keep != es:
                es, changed = keep, True
        return es

    rng = random.Random(41)
    for trial in range(3):
        n = 14
        edges = sorted(
            {
                tuple(sorted((rng.randint(0, n - 1), rng.randint(0, n - 1))))
                for _ in range(30)
            }
        )
        edges = [e for e in edges if e[0] != e[1]]
        df = spark.createDataFrame(edges, "src long, dst long")
        for k in (3, 4):
            got = {(r.src, r.dst) for r in k_truss(df, k).collect()}
            assert got == brute_truss(edges, k), (trial, k)


def test_random_walks_follow_edges_and_are_partition_invariant(spark):
    """Every consecutive walk pair must be a graph edge, and the walks
    must be identical under different partitionings (the md5-derandomized
    contract)."""
    from pyspark.sql import functions as F

    from bigdatafraude_ml_graphx_spark import registry as q

    out = q.QUERIES["q168_random_walks"](spark, "/root/testdata/sf0.01")
    rows = [(r.start, r.step, r.v) for r in out.collect()]
    # rebuild the edge set the query walks on
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.graph import (
        cooccurrence_edges,
        symmetrize,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    sym = symmetrize(
        cooccurrence_edges(ev, "user_id", "ts", "hour", ("event_type",))
        .filter(F.col("weight") >= 5)
        .select("src", "dst")
    )
    edges = {(r.src, r.dst) for r in sym.select("src", "dst").collect()}
    walks = {}
    for start, step, v in rows:
        walks.setdefault(start, {})[step] = v
    assert walks  # landmarks intersect the graph at sf0.01
    for start, path in walks.items():
        assert path[0] == start
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in edges, (start, t)
    again = {(r.start, r.step, r.v)
             for r in q.QUERIES["q168_random_walks"](spark, "/root/testdata/sf0.01").collect()}
    assert again == set(rows)
