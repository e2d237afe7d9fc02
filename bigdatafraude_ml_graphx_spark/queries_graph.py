"""Graph query declarations (SURVEY §2.10) over the events co-occurrence graph.

The graph: users are vertices; two users are connected when they emit events
in the same (hour, event_type) bucket — the engine's bucket-equi rewrite of
the reference's theta self-join edge build
(``/root/reference/notebooks/4_graphx.ipynb:193-208``).

Even the ITERATIVE algorithms are oracle-checked: connected components via a
recursive-CTE transitive closure, PageRank via 5 unrolled iterations of the
identical decimal-accumulated update — both hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .graph import connected_components, cooccurrence_edges, degrees, pagerank, symmetrize
from .graph.lpa import label_propagation, oracle_lpa_sql
from .queries import query

# Shared SQL building blocks (DuckDB side).
_EDGES_CTE = """
    b AS (SELECT DISTINCT user_id AS entity, date_trunc('hour', ts) AS bucket, event_type
          FROM events),
    e0 AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2)
"""


def _events_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cooccurrence_edges(
        load_table(spark, sf_dir, "events"), "user_id", "ts", "hour", ("event_type",)
    )


@query(
    "q20_cooccurrence_edges",
    oracle=f"WITH {_EDGES_CTE} SELECT src, dst, weight FROM e0",
)
def q20_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-equi co-occurrence edge build (J1 idiomatic rewrite — equi join
    on materialized (hour, event_type) keys instead of the reference's
    nested-loop-prone theta join)."""
    return _events_edges(spark, sf_dir)


@query(
    "q21_user_degrees",
    oracle=f"""
    WITH {_EDGES_CTE}
    SELECT id, COUNT(*) AS degree
    FROM (SELECT src AS id FROM e0 UNION ALL SELECT dst AS id FROM e0)
    GROUP BY id
    """,
)
def q21_user_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree centrality (G2): ``g.degrees`` as a plain aggregation
    (``notebooks/4_graphx.ipynb:354-378``)."""
    return degrees(_events_edges(spark, sf_dir))


@query(
    "q22_connected_components",
    oracle=f"""
    WITH RECURSIVE {_EDGES_CTE},
    sym AS (SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT u AS id FROM sym),
    reach(a, bnode) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.bnode = s.u
    )
    SELECT a AS id, MIN(bnode) AS component FROM reach GROUP BY a
    """,
)
def q22_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (G3) — DataFrame min-label propagation with
    per-iteration lineage truncation, replacing GraphFrames'
    ``g.connectedComponents()`` (``notebooks/4_graphx.ipynb:504-586``).
    Oracle: recursive-CTE transitive closure (component id = min reachable
    vertex id — identical labeling). The edge build emits one canonical row
    per pair (groupBy output), so the component pass skips its dedup
    shuffle."""
    return connected_components(_events_edges(spark, sf_dir), dedup_edges=False)


@query(
    "q82_connected_components_star",
    oracle=f"""
    WITH RECURSIVE {_EDGES_CTE},
    sym AS (SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT u AS id FROM sym),
    reach(a, bnode) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.bnode = s.u
    )
    SELECT a AS id, MIN(bnode) AS component FROM reach GROUP BY a
    """,
)
def q82_connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star contraction
    (Kiveris et al. 2014) — O(log² n) rounds, the CC to reach for when the
    diameter is unknown at 100 TB. Same labeling contract (and oracle) as
    q22's min-label propagation; equivalence on random graphs is
    property-tested against a union-find reference
    (tests/test_graph_property.py)."""
    from .graph.components import connected_components_star

    return connected_components_star(_events_edges(spark, sf_dir))


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled PageRank oracle mirroring :func:`..graph.pagerank` arithmetic
    exactly: double products quantized to int64 at scale 1e14
    (``FLOOR(x*1e14 + 0.5)`` — single IEEE ops, engine-independent), exact
    integer contribution sums, the same (1.0-0.15) multiplier and 0.15/n
    teleport expressions."""
    parts = [
        f"WITH {_EDGES_CTE}",
        ", sym AS (SELECT src, dst, weight FROM e0"
        "  UNION ALL SELECT dst, src, weight FROM e0)",
        ", tot AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS total FROM sym GROUP BY src)",
        ", e AS (SELECT s.src, s.dst,"
        "        CAST(s.weight AS DOUBLE) / CAST(t.total AS DOUBLE) AS w"
        "   FROM sym s JOIN tot t ON s.src = t.src)",
        ", verts AS (SELECT DISTINCT src AS id FROM sym)",
        ", nn AS (SELECT COUNT(*) AS n FROM verts)",
        ", pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f", pr{i} AS (SELECT v.id,"
            f" (1.0 - 0.15) * COALESCE(c.contrib, 0.0) + 0.15 / (SELECT n FROM nn) AS pr"
            f" FROM verts v LEFT JOIN ("
            f"   SELECT e.dst AS id,"
            f"          CAST(CAST(SUM(CAST(FLOOR(p.pr * e.w * 1e14 + 0.5) AS BIGINT))"
            f"               AS BIGINT) AS DOUBLE) / 1e14 AS contrib"
            f"   FROM e JOIN pr{i-1} p ON e.src = p.id GROUP BY e.dst) c"
            f" ON v.id = c.id)"
        )
    parts.append(f"SELECT id, pr AS pagerank FROM pr{iters}")
    return "\n".join(parts)


@query("q23_pagerank", oracle=_pagerank_oracle(5))
def q23_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (G4/G5), 5 iterations, alpha=0.15 — the reference's
    hand-rolled loop (``notebooks/4_graphx.ipynb:833-894``) with per-source
    weight normalization (``:681-703``) and localCheckpoint lineage
    truncation. Oracle: the same recurrence unrolled in SQL."""
    from pyspark.sql import Window

    e = symmetrize(_events_edges(spark, sf_dir))
    # Window sum over src, not agg+join: the symmetrized co-occurrence
    # lineage is computed once. Integer weight totals are exact in any
    # grouping, so values match the oracle's join formulation bit-for-bit.
    total = F.sum("weight").over(Window.partitionBy("src"))
    e = e.select(
        "src",
        "dst",
        (F.col("weight").cast("double") / total.cast("double")).alias("weight"),
    )
    return pagerank(e, alpha=0.15, max_iter=5)


def _ppr_oracle(iters: int = 5) -> str:
    """Unrolled personalized-PageRank oracle — the q23 quantized recurrence
    with the uniform teleport vector over the landmark source set."""
    parts = [
        f"WITH {_EDGES_CTE}",
        ", sym AS (SELECT src, dst, weight FROM e0"
        "  UNION ALL SELECT dst, src, weight FROM e0)",
        ", tot AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS total FROM sym GROUP BY src)",
        ", e AS (SELECT s.src, s.dst,"
        "        CAST(s.weight AS DOUBLE) / CAST(t.total AS DOUBLE) AS w"
        "   FROM sym s JOIN tot t ON s.src = t.src)",
        ", srcs AS (SELECT DISTINCT user_id AS id FROM events WHERE user_id % 50 = 0)",
        ", nsrc AS (SELECT COUNT(*) AS ns FROM srcs)",
        ", verts AS (SELECT v.id,"
        "        CASE WHEN s.id IS NOT NULL THEN 1.0 / (SELECT ns FROM nsrc)"
        "             ELSE 0.0 END AS tele"
        "   FROM (SELECT DISTINCT src AS id FROM sym"
        "         UNION SELECT id FROM srcs) v"
        "   LEFT JOIN srcs s ON s.id = v.id)",
        ", pr0 AS (SELECT id, tele AS pr FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f", pr{i} AS (SELECT v.id,"
            f" (1.0 - 0.15) * COALESCE(c.contrib, 0.0) + 0.15 * v.tele AS pr"
            f" FROM verts v LEFT JOIN ("
            f"   SELECT e.dst AS id,"
            f"          CAST(CAST(SUM(CAST(FLOOR(p.pr * e.w * 1e14 + 0.5) AS BIGINT))"
            f"               AS BIGINT) AS DOUBLE) / 1e14 AS contrib"
            f"   FROM e JOIN pr{i-1} p ON e.src = p.id GROUP BY e.dst) c"
            f" ON v.id = c.id)"
        )
    parts.append(f"SELECT id, pr AS pagerank FROM pr{iters}")
    return "\n".join(parts)


@query("q162_personalized_pagerank", oracle=_ppr_oracle(5))
def q162_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the q111 landmark set (user_id % 50 = 0)
    — GraphX `lib.PageRank.runParallelPersonalizedPageRank` parity, the
    seed-set relatedness score behind fraud-ring expansion. Identical
    execution/determinism contract to q23 (keyed edge persist, broadcast
    rank state, quantized int64 contribution sums, per-iteration
    localCheckpoint); the only change is the teleport vector, so the
    unrolled oracle differs from q23's by one CASE expression."""
    from pyspark.sql import Window

    from .graph.pagerank import personalized_pagerank

    e = symmetrize(_events_edges(spark, sf_dir))
    total = F.sum("weight").over(Window.partitionBy("src"))
    e = e.select(
        "src",
        "dst",
        (F.col("weight").cast("double") / total.cast("double")).alias("weight"),
    )
    sources = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        .select(F.col("user_id").alias("id"))
        .distinct()
    )
    return personalized_pagerank(e, sources, alpha=0.15, max_iter=5)


@query(
    "q111_shortest_paths",
    oracle=f"""
    WITH RECURSIVE {_EDGES_CTE},
    sym AS (SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0),
    n_nodes AS (SELECT COUNT(DISTINCT u) AS n FROM sym),
    lms AS (SELECT DISTINCT user_id AS lm FROM events WHERE user_id % 50 = 0),
    paths(lm, id, d) AS (
        SELECT lm, lm, 0 FROM lms
        UNION
        SELECT p.lm, s.v, p.d + 1
        FROM paths p JOIN sym s ON p.id = s.u
        WHERE p.d + 1 < (SELECT n FROM n_nodes)
    )
    SELECT id, lm AS landmark, CAST(MIN(d) AS INT) AS distance
    FROM paths GROUP BY id, lm
    """,
)
def q111_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark shortest paths (GraphX ``ShortestPaths`` contract): hop
    distance from every user to each landmark user (user_id % 50 = 0) on
    the co-occurrence graph — the "distance to a known-bad account" fraud
    measure. Iterative frontier relaxation with per-round lineage
    truncation; oracle = recursive-CTE breadth-first closure with the
    path-length bound < |V| (cycle cut), MIN per (vertex, landmark).
    Unreachable pairs are absent on both sides."""
    from .graph.bfs import shortest_paths

    edges = _events_edges(spark, sf_dir)
    lms = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        .select(F.col("user_id").alias("id"))
        .distinct()
    )
    sp = shortest_paths(edges, lms)
    return sp.select("id", "landmark", F.col("distance").cast("int").alias("distance"))


@query(
    "q137_label_propagation",
    oracle=oracle_lpa_sql(_EDGES_CTE.strip(), num_iterations=3),
)
def q137_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphX ``lib.LabelPropagation`` parity (community detection) over
    the co-occurrence graph: 3 synchronous min-tie rounds, certified
    against the identical rounds unrolled in SQL — the q23 PageRank
    discipline applied to the last GraphX lib algorithm the engine
    lacked. Ties pinned to the smallest label make the notoriously
    order-dependent algorithm bit-deterministic in both engines."""
    return label_propagation(_events_edges(spark, sf_dir), num_iterations=3)


@query(
    "q142_strongly_connected",
    oracle="""
    WITH RECURSIVE
    b AS (SELECT DISTINCT date_trunc('hour', ts) AS bucket, event_type,
                 user_id
          FROM events),
    ring AS (
      SELECT user_id AS src,
             COALESCE(LEAD(user_id) OVER w,
                      MIN(user_id) OVER (PARTITION BY bucket, event_type))
               AS dst
      FROM b WINDOW w AS (PARTITION BY bucket, event_type ORDER BY user_id)),
    e AS (SELECT DISTINCT src, dst FROM ring WHERE src <> dst),
    verts AS (SELECT DISTINCT src AS id FROM e
              UNION SELECT DISTINCT dst FROM e),
    fwd(a, bnode) AS (
      SELECT src, dst FROM e
      UNION
      SELECT f.a, e.dst FROM fwd f JOIN e ON f.bnode = e.src),
    mutual AS (
      SELECT f1.a AS x, f1.bnode AS y
      FROM fwd f1 JOIN fwd f2 ON f1.a = f2.bnode AND f1.bnode = f2.a),
    pairs AS (SELECT id AS x, id AS y FROM verts
              UNION SELECT x, y FROM mutual)
    SELECT x AS id, MIN(y) AS scc FROM pairs GROUP BY x
    """,
)
def q142_strongly_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphX ``lib.StronglyConnectedComponents`` parity on a DIRECTED
    graph: users in each (hour, event_type) bucket form a ring (each →
    next by id, last → first), rings overlap across buckets, and the SCC
    labeling (scc = min member id) comes from the distributed coloring
    algorithm in ``graph/scc.py`` — trim singletons, forward MIN
    coloring to fixpoint, backward walk from color roots, repeat.
    Certified against the mutual-reachability recursive-CTE closure.
    With LPA (q137) this completes the GraphX lib surface the engine
    replaces (degrees/PR/CC/triangles/ShortestPaths/LPA/SCC)."""
    from pyspark.sql import Window

    from .graph.scc import strongly_connected_components

    e = load_table(spark, sf_dir, "events")
    b = e.select(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type", "user_id"
    ).distinct()
    w = Window.partitionBy("bucket", "event_type").orderBy("user_id")
    ring = b.select(
        F.col("user_id").alias("src"),
        F.coalesce(
            F.lead("user_id").over(w),
            F.min("user_id").over(
                Window.partitionBy("bucket", "event_type")
            ),
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return strongly_connected_components(ring)


@query(
    "q143_clustering_coefficient",
    oracle="""
    WITH b AS (SELECT DISTINCT user_id AS entity,
                      date_trunc('hour', ts) AS bucket, event_type
               FROM events),
    ew AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2),
    e0 AS (SELECT src, dst FROM ew WHERE weight >= 5),
    sym AS (SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u),
    tri AS (
      SELECT x.src AS a, x.dst AS b, y.dst AS c
      FROM e0 x JOIN e0 y ON x.src = y.src AND x.dst < y.dst
      JOIN e0 z ON z.src = x.dst AND z.dst = y.dst),
    pv AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
      GROUP BY id)
    SELECT d.id, COALESCE(pv.n_triangles, 0) AS n_triangles,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(2 * COALESCE(pv.n_triangles, 0) AS DOUBLE)
             / CAST(d.degree * (d.degree - 1) AS DOUBLE) AS clustering_coeff
    FROM deg d LEFT JOIN pv ON pv.id = d.id
    WHERE d.degree >= 2
    """,
)
def q143_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per vertex — 2·T(v) / (deg·(deg−1)),
    the fraud-ring density signal (a colluding clique has coefficient ~1;
    an innocent hub ~0), over the STRONG-TIE graph (weight ≥ 5 — the q80
    sparsification: the raw co-occurrence graph is near-complete and its
    triangle set grows as C(bucket,3); at sf0.1 the raw graph holds 197M
    triangles vs thousands of strong-tie ones, and clustering on weak
    one-off ties is noise anyway). Per-vertex triangle counts reuse the
    compact-forward orientation (wedge fan-out bounded O(√E) per vertex
    regardless of skew, `graph/triangles.py`), degrees are one
    aggregation, and the coefficient is a single IEEE division over exact
    integers — bit-identical cross-engine. Vertices of degree < 2 are
    excluded (coefficient undefined)."""
    from .graph.triangles import per_vertex_triangle_counts

    edges = (
        _events_edges(spark, sf_dir)
        .filter(F.col("weight") >= 5)
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    tri = per_vertex_triangle_counts(edges)
    deg = degrees(edges)
    return (
        deg.join(tri, "id", "left_outer")
        .withColumn("n_triangles", F.coalesce("n_triangles", F.lit(0)))
        .filter(F.col("degree") >= 2)
        .select(
            "id",
            "n_triangles",
            "degree",
            (
                (2 * F.col("n_triangles")).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            ).alias("clustering_coeff"),
        )
    )


_KCORE_K = 2
_KCORE_UNROLL = 10  # ≥ actual peel depth; extra rounds are no-ops


def _oracle_kcore(k: int, rounds: int) -> str:
    """Peeling unrolled: deleting under-degree vertices is idempotent at
    the fixpoint, so any unroll depth ≥ the true peel depth is exact."""
    parts = ["""b AS (SELECT DISTINCT user_id AS entity,
                      date_trunc('hour', ts) AS bucket, event_type
               FROM events),
    ew AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2),
    e0 AS (SELECT src, dst FROM ew WHERE weight >= 5),
    sym0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM e0
             UNION SELECT dst, src FROM e0)"""]
    for i in range(rounds):
        parts.append(f"""
    keep{i + 1} AS MATERIALIZED (
      SELECT u FROM sym{i} GROUP BY u HAVING COUNT(*) >= {k}),
    sym{i + 1} AS MATERIALIZED (
      SELECT s.u, s.v FROM sym{i} s
      JOIN keep{i + 1} a ON s.u = a.u
      JOIN keep{i + 1} bb ON s.v = bb.u)""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT u AS id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM sym{rounds} GROUP BY u"""
    )


@query("q149_kcore", oracle=_oracle_kcore(_KCORE_K, _KCORE_UNROLL))
def q149_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the strong-tie co-occurrence graph — iterative peeling
    to the maximal subgraph where every member keeps ≥ 2 strong ties
    inside it: the cohesion filter that keeps collusion rings (a clique
    survives) and peels hangers-on, one degree aggregate + two semi
    joins per round with per-round lineage truncation
    (``graph/degrees.py::k_core``). The oracle unrolls the peeling 10
    rounds (each round MATERIALIZED — CTE inlining would re-expand the
    chain 2^rounds times) — peeling is idempotent at the fixpoint, so
    any unroll depth ≥ the true peel depth replays the exact result."""
    from .graph.degrees import k_core

    edges = _events_edges(spark, sf_dir).filter(F.col("weight") >= 5).select(
        "src", "dst"
    )
    return k_core(edges, _KCORE_K)


@query(
    "q150_degree_assortativity",
    oracle="""
    WITH b AS (SELECT DISTINCT user_id AS entity,
                      date_trunc('hour', ts) AS bucket, event_type
               FROM events),
    ew AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2),
    e0 AS (SELECT src, dst FROM ew WHERE weight >= 5),
    sym AS (SELECT src AS u, dst AS v FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT u AS id, COUNT(*) AS d FROM sym GROUP BY u),
    pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym s JOIN deg du ON du.id = s.u JOIN deg dv ON dv.id = s.v),
    m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x*y AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(x*x AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(y*y AS DECIMAL(38,0))) AS syy
      FROM pairs)
    SELECT CAST(n AS BIGINT) AS n_endpoints,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 9)
             AS assortativity
    FROM m
    """,
)
def q150_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the strong-tie graph — the Pearson
    correlation of endpoint degrees over all directed edge instances
    (Newman 2002): positive = hubs prefer hubs (social mixing), negative
    = hubs attach to leaves (star/hub-and-spoke — the typical mule-network
    signature). All five moments accumulate as exact integer/DECIMAL sums
    (the q85 correlation discipline — no float partials to reorder);
    the final ratio is three IEEE ops parenthesized identically in both
    engines, landed on the 9-dp grid for the wide-DECIMAL→double
    conversion. The strong-tie edge list localCheckpoints once (the q209
    discipline): it feeds the symmetrized frame, which is consumed three
    times (degree rollup + two endpoint joins) — bare, the wedge-join
    edge build replayed per consumer (6 events scans measured; at 100×
    the build dominates and a 6× replay is the q173 defect class). The
    degree table re-attaches via size-guarded broadcast (|V| rows)."""
    from .plans.hints import broadcast_if_small

    edges = (
        _events_edges(spark, sf_dir)
        .filter(F.col("weight") >= 5)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # read 3x: degrees + both endpoint joins
    )
    sym = symmetrize(edges).select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    pairs = (
        sym.join(
            broadcast_if_small(
                deg.select(F.col("id").alias("src"), F.col("d").alias("x"))
            ),
            "src",
        )
        .join(
            broadcast_if_small(
                deg.select(F.col("id").alias("dst"), F.col("d").alias("y"))
            ),
            "dst",
        )
        .select("x", "y")
    )
    # cast INSIDE the sum (the q85 discipline, ADVICE r5 item 1): the
    # accumulator is DECIMAL(38,0) from the start — a BIGINT accumulator
    # can silently wrap at scale with ANSI off, while DuckDB's SUM(BIGINT)
    # returns exact HUGEINT, a silent cross-engine divergence.
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pairs.agg(
        dec(F.count("*")).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return m.select(
        F.col("n").cast("long").alias("n_endpoints"),
        F.round(num / dx / dy, 9).alias("assortativity"),
    )


_TRUSS_K = 3
_TRUSS_UNROLL = 8  # ≥ actual peel depth; extra rounds are no-ops


def _oracle_ktruss(k: int, rounds: int) -> str:
    """Edge peeling unrolled (the q149 MATERIALIZED technique): removing
    under-supported edges is idempotent at the fixpoint, so any unroll
    depth ≥ the true peel depth is exact. Support per canonical edge
    (u < v) = |N(u) ∩ N(v)| via the wedge join."""
    parts = ["""b AS (SELECT DISTINCT user_id AS entity,
                      date_trunc('hour', ts) AS bucket, event_type
               FROM events),
    ew AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2),
    ec0 AS MATERIALIZED (SELECT src AS u, dst AS v FROM ew WHERE weight >= 5)"""]
    for i in range(rounds):
        parts.append(f"""
    sym{i} AS MATERIALIZED (SELECT u, v FROM ec{i} UNION SELECT v, u FROM ec{i}),
    supp{i} AS MATERIALIZED (
      SELECT e.u, e.v, COUNT(*) AS s
      FROM ec{i} e
      JOIN sym{i} a ON a.u = e.u
      JOIN sym{i} bb ON bb.u = e.v AND bb.v = a.v
      GROUP BY e.u, e.v),
    ec{i + 1} AS MATERIALIZED (
      SELECT e.u, e.v FROM ec{i} e
      LEFT JOIN supp{i} s ON s.u = e.u AND s.v = e.v
      WHERE COALESCE(s.s, 0) >= {k - 2})""")
    return (
        "WITH "
        + ",".join(parts)
        + f""",
    symf AS (SELECT u, v FROM ec{rounds} UNION SELECT v, u FROM ec{rounds})
    SELECT e.u AS src, e.v AS dst, CAST(COUNT(*) AS BIGINT) AS support
    FROM ec{rounds} e
    JOIN symf a ON a.u = e.u
    JOIN symf bb ON bb.u = e.v AND bb.v = a.v
    GROUP BY e.u, e.v"""
    )


@query("q180_ktruss", oracle=_oracle_ktruss(_TRUSS_K, _TRUSS_UNROLL))
def q180_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{3}-truss of the strong-tie graph — the edge-centric cohesion core
    (every surviving edge closes ≥ {1} triangle; the collusive-ring
    detector that peels away bridges and stars k-core keeps). Iterative
    support-peel with per-round localCheckpoint, edge-count fixpoint
    detection, and a loud round-budget raise (`graph/truss.py`); the
    oracle unrolls the identical peel to a fixed depth — exact because
    deletion is idempotent at the fixpoint (the q149 discipline)."""
    from .graph.truss import k_truss

    edges = _events_edges(spark, sf_dir).filter(F.col("weight") >= 5).select(
        "src", "dst"
    )
    return k_truss(edges, _TRUSS_K)
