"""Invariant tests for graph operators on a crafted graph with known
structure (SURVEY §5.3: cliques + singletons + a star hub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.graph import (
    connected_components,
    degrees,
    pagerank,
    symmetrize,
)


@pytest.fixture(scope="module")
def crafted(spark):
    # Components: clique {1,2,3}, path {10,11,12,13}, singleton edge {20,21},
    # star hub 30 with leaves 31..35.
    edges = [
        (1, 2), (1, 3), (2, 3),
        (10, 11), (11, 12), (12, 13),
        (20, 21),
        (30, 31), (30, 32), (30, 33), (30, 34), (30, 35),
    ]
    return spark.createDataFrame(edges, "src long, dst long")


def test_degrees(crafted):
    d = {r["id"]: r["degree"] for r in degrees(crafted).collect()}
    assert d[30] == 5  # star hub
    assert d[1] == d[2] == d[3] == 2  # clique
    assert d[31] == 1
    assert d[11] == 2 and d[10] == 1


def test_connected_components(crafted):
    cc = connected_components(crafted).collect()
    comp = {r["id"]: r["component"] for r in cc}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == comp[13] == 10
    assert comp[20] == comp[21] == 20
    assert all(comp[v] == 30 for v in (30, 31, 32, 33, 34, 35))
    assert len({comp[v] for v in comp}) == 4


def test_connected_components_string_ids(spark):
    # The reference's own graph casts vertex ids to STRING
    # (/root/reference/notebooks/4_graphx.ipynb:334-336). A label sum over
    # strings is NULL, so a naive sum-based convergence test exits after one
    # round; this path graph needs >=3 propagation rounds, so a premature
    # exit yields wrong labels. Components: path {u10..u13}, pair {u20,u21}.
    edges = [
        ("u10", "u11"), ("u11", "u12"), ("u12", "u13"),
        ("u20", "u21"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    comp = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert comp["u10"] == comp["u11"] == comp["u12"] == comp["u13"] == "u10"
    assert comp["u20"] == comp["u21"] == "u20"


def test_connected_components_isolated_vertices(spark, crafted):
    verts = spark.createDataFrame([(99,), (1,)], "id long")
    comp = {
        r["id"]: r["component"]
        for r in connected_components(crafted, vertices=verts).collect()
    }
    assert comp[99] == 99  # isolated singleton
    assert comp[1] == 1


def test_pagerank_ordering(crafted):
    # Uniform weights normalized per-src over the symmetrized edges.
    e = symmetrize(crafted.withColumn("weight", F.lit(1.0)))
    tot = e.groupBy("src").agg(F.sum("weight").alias("t"))
    e = e.join(tot, "src").select(
        "src", "dst", (F.col("weight") / F.col("t")).alias("weight")
    )
    pr = {r["id"]: r["pagerank"] for r in pagerank(e, max_iter=5).collect()}
    n = len(pr)
    assert n == 15
    # Teleport floor: every score >= alpha/n.
    assert all(v >= 0.15 / n - 1e-12 for v in pr.values())
    # The star hub dominates its leaves and everything else.
    assert pr[30] == max(pr.values())
    assert all(pr[30] > pr[v] for v in (31, 32, 33, 34, 35))
    # Symmetric roles within the clique get identical scores.
    assert abs(pr[1] - pr[2]) < 1e-15 and abs(pr[2] - pr[3]) < 1e-15


def test_property_graph_facade(spark, crafted):
    from bigdatafraude_ml_graphx_spark.graph import PropertyGraph

    g = PropertyGraph(None, crafted.withColumn("weight", F.lit(1.0)))
    assert {r["id"]: r["degree"] for r in g.degrees.collect()}[30] == 5
    comp = {r["id"]: r["component"] for r in g.connected_components().collect()}
    assert comp[31] == 30
    pr = {r["id"]: r["pagerank"] for r in g.page_rank(max_iter=3).collect()}
    assert pr[30] == max(pr.values())
    pr_u = {r["id"]: r["pagerank"] for r in g.page_rank(max_iter=3, weighted=False).collect()}
    assert pr_u[30] == max(pr_u.values())


def test_shortest_paths_matches_python_bfs(spark):
    """Hop distances equal a pure-Python BFS on a hand-checkable graph with
    a cycle, a chain, and an unreachable island."""
    from collections import deque

    from bigdatafraude_ml_graphx_spark.graph.bfs import shortest_paths

    edge_list = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (7, 8)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    landmarks = spark.createDataFrame([(1,), (7,)], "id long")
    got = {
        (r.id, r.landmark): r.distance
        for r in shortest_paths(edges, landmarks).collect()
    }

    adj = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for lm in (1, 7):
        seen = {lm: 0}
        dq = deque([lm])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen[v] = seen[u] + 1
                    dq.append(v)
        for v, d in seen.items():
            expect[(v, lm)] = d
    assert got == expect
    assert (6, 1) in got and got[(6, 1)] == 3  # 1→4 (cycle edge) →5→6
    assert (6, 7) not in got  # island stays unreachable


def test_shortest_paths_raises_when_diameter_exceeds_budget(spark):
    """A path graph with hop diameter > max_iterations must fail loudly
    (truncated distances would silently diverge from an exact-closure
    oracle), and on_nonconverged='return' opts into bounded-hop output."""
    import pytest as _pytest

    from bigdatafraude_ml_graphx_spark.graph.bfs import shortest_paths

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )
    landmarks = spark.createDataFrame([(0,)], ["id"])
    with _pytest.raises(RuntimeError, match="did not stabilize"):
        shortest_paths(edges, landmarks, max_iterations=3)
    partial = shortest_paths(
        edges, landmarks, max_iterations=3, on_nonconverged="return"
    )
    got = {r.id: r.distance for r in partial.collect()}
    assert got[0] == 0 and max(got.values()) <= 3
    full = shortest_paths(edges, landmarks, max_iterations=12)
    assert {r.id: r.distance for r in full.collect()} == {
        i: i for i in range(9)
    }


def test_label_propagation_separates_disjoint_cliques(spark):
    """Min-tie synchronous LPA: two disjoint triangles each converge to
    the min vertex id; communities never mix across components."""
    from bigdatafraude_ml_graphx_spark.graph.lpa import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        ["src", "dst"],
    )
    got = {r.id: r.label for r in label_propagation(edges, 4).collect()}
    assert set(got) == {1, 2, 3, 10, 11, 12}
    assert {got[1], got[2], got[3]} == {1}
    assert {got[10], got[11], got[12]} == {10}


def test_label_propagation_matches_reference_rounds(spark):
    """One round on a star matches the hand-computed synchronous update
    (every leaf adopts the hub's label; the hub adopts the min leaf)."""
    from bigdatafraude_ml_graphx_spark.graph.lpa import label_propagation

    star = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], ["src", "dst"]
    )
    got = {r.id: r.label for r in label_propagation(star, 1).collect()}
    assert got == {5: 1, 1: 5, 2: 5, 3: 5}


def _scc_reference(edges):
    """Iterative Tarjan on plain Python — test oracle."""
    from collections import defaultdict

    adj = defaultdict(list)
    verts = set()
    for s, d in edges:
        adj[s].append(d)
        verts.add(s)
        verts.add(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])

    for v in sorted(verts):
        if v not in index:
            strongconnect(v)
    return comp


def test_scc_matches_tarjan_on_random_digraphs(spark):
    import random

    from bigdatafraude_ml_graphx_spark.graph.scc import (
        strongly_connected_components,
    )

    rng = random.Random(99)
    for trial in range(3):
        n = 40
        edges = list({
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(90)
        })
        edges = [(s, d) for s, d in edges if s != d]
        ref = _scc_reference(edges)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.id: r.scc for r in strongly_connected_components(df).collect()}
        assert got == ref, f"trial {trial}"


def test_scc_known_shapes(spark):
    from bigdatafraude_ml_graphx_spark.graph.scc import (
        strongly_connected_components,
    )

    # two cycles bridged by a DAG edge + a tail
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (3, 4), (5, 6), (7, 1)],
        ["src", "dst"],
    )
    got = sorted((r.id, r.scc) for r in strongly_connected_components(edges).collect())
    assert got == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 7)]


def test_shortest_paths_budget_equal_to_diameter_succeeds(spark):
    """A budget of exactly the hop diameter must return complete
    distances, not a spurious truncation error — the confirmation round
    is free (code-review regression, round 5)."""
    from bigdatafraude_ml_graphx_spark.graph.bfs import shortest_paths

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )
    landmarks = spark.createDataFrame([(0,)], ["id"])
    full = shortest_paths(edges, landmarks, max_iterations=8)
    assert {r.id: r.distance for r in full.collect()} == {
        i: i for i in range(9)
    }


def test_per_vertex_triangles_match_bruteforce(spark):
    import itertools
    import random

    from bigdatafraude_ml_graphx_spark.graph.triangles import (
        per_vertex_triangle_counts,
    )

    rng = random.Random(5)
    edges = sorted({
        tuple(sorted((rng.randint(0, 14), rng.randint(0, 14))))
        for _ in range(40)
    })
    edges = [e for e in edges if e[0] != e[1]]
    eset = set(edges)
    expect = {}
    for a, b, c in itertools.combinations(range(15), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for v in (a, b, c):
                expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.n_triangles for r in per_vertex_triangle_counts(df).collect()}
    assert got == expect


def test_kcore_peels_to_maximal_subgraph(spark):
    from bigdatafraude_ml_graphx_spark.graph.degrees import k_core

    # triangle + tail: 2-core = triangle; chain peels entirely
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], ["src", "dst"]
    )
    got = {(r.id, r.core_degree) for r in k_core(edges, 2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}
    # 4-clique survives its own 3-core; pendant vertex peels
    e2 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        ["src", "dst"],
    )
    assert k_core(e2, 3).count() == 4
    assert k_core(e2, 5).count() == 0


def test_personalized_pagerank_concentrates_on_sources(spark):
    """PPR invariants on a crafted chain: total mass <= 1 (dangling decay),
    a source holds at least its alpha * 1/|S| teleport share, and vertices
    unreachable from any source score exactly 0."""
    from bigdatafraude_ml_graphx_spark.graph.pagerank import (
        personalized_pagerank,
    )

    # 1 -> 2 -> 3, isolated pair 4 -> 5; source = {1}
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (4, 5, 1.0)], "src long, dst long, weight double"
    )
    s = spark.createDataFrame([(1,)], "id long")
    pr = {
        r["id"]: r["pagerank"]
        for r in personalized_pagerank(e, s, max_iter=5).collect()
    }
    assert set(pr) == {1, 2, 3, 4, 5}
    assert abs(pr[1] - 0.15) < 1e-12  # source keeps exactly its teleport
    assert pr[2] > pr[3] > 0  # mass decays along the chain
    assert pr[4] == 0.0 and pr[5] == 0.0  # unreachable from the seed
    assert sum(pr.values()) <= 1.0 + 1e-9


def test_k_truss_peels_bridges_keeps_clique(spark):
    """4-clique + a pendant path: the 3-truss keeps exactly the clique's
    6 edges (each closing 2 triangles); the 4-truss also keeps the clique
    (support 2 >= k-2); the 5-truss is empty. The pendant/bridge edges
    peel away in every case — including the CASCADE: edge (4,5) is in no
    triangle, and removing it cannot resurrect anything."""
    from bigdatafraude_ml_graphx_spark.graph.truss import k_truss

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(
        clique + [(3, 4), (4, 5)], "src long, dst long"
    )
    t3 = {(r.src, r.dst): r.support for r in k_truss(edges, 3).collect()}
    assert set(t3) == set(clique)
    assert all(s == 2 for s in t3.values())
    t4 = {(r.src, r.dst) for r in k_truss(edges, 4).collect()}
    assert t4 == set(clique)
    assert k_truss(edges, 5).count() == 0


def test_k_truss_cascading_peel(spark):
    """Two triangles sharing edge (1,2), plus vertex 9 hanging off both
    triangle tips: after the hangers peel, supports are recomputed on the
    SURVIVING graph (the iterative part)."""
    from bigdatafraude_ml_graphx_spark.graph.truss import k_truss

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 9), (4, 9)],
        "src long, dst long",
    )
    t3 = {(r.src, r.dst) for r in k_truss(edges, 3).collect()}
    assert t3 == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}
