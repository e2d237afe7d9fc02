"""Round-7 batch 5: ML feature-prep and text-graph operators — k-means
Lloyd iterations, smoothed target encoding, the feature-hashing trick, and
TextRank keyword extraction.

Determinism: k-means runs entirely on the 1e-6 quantized-integer grid
(distances are exact int64 sums of squared quantized diffs; the centroid
update is an exact half-up integer rounding); target encoding and feature
hashing are pure integer counting over md5-derived keys; TextRank rides
the q23 quantized-PageRank recurrence, unrolled in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q225 — k-means Lloyd iterations (deterministic seeds, exact arithmetic)
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ROUNDS = 2
_KM_SCALE = 1_000_000  # 1e-6 coordinate grid (the q72/q187 discipline)


def _kmeans_oracle(rounds: int) -> str:
    """Unrolled Lloyd rounds: assignment = integer argmin of exact squared
    distances on the quantized grid; update = half-up integer rounding of
    the per-(cluster, dim) mean — ``(2·Σv + n) // (2n)`` done as a floor
    of an exact double division (operands < 2^53 — see engine docstring)."""
    parts = [
        f"""
    WITH pe AS MATERIALIZED (
      SELECT vec_id, i - 1 AS pos,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {_KM_SCALE} + 0.5)
                  AS BIGINT) AS vq
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
    seed AS MATERIALIZED (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid FROM (
        SELECT vec_id FROM embeddings
        ORDER BY md5('km:' || CAST(vec_id AS VARCHAR)) LIMIT {_KM_K}) s),
    c0 AS MATERIALIZED (
      SELECT s.cid, p.pos, p.vq AS cq
      FROM seed s JOIN pe p ON p.vec_id = s.vec_id)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    d{r} AS (
      SELECT p.vec_id, c.cid,
             CAST(SUM((p.vq - c.cq) * (p.vq - c.cq)) AS BIGINT) AS dist
      FROM pe p JOIN c{r - 1} c ON c.pos = p.pos
      GROUP BY p.vec_id, c.cid),
    a{r} AS MATERIALIZED (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d{r}) t WHERE rn = 1),
    c{r} AS MATERIALIZED (
      SELECT a.cid, p.pos,
             CAST(floor((2.0 * SUM(p.vq) + COUNT(*)) / (2.0 * COUNT(*)))
                  AS BIGINT) AS cq
      FROM a{r} a JOIN pe p ON p.vec_id = a.vec_id
      GROUP BY a.cid, p.pos)"""
        )
    parts.append(
        f"""
    SELECT CAST(cid AS INT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CAST(dist AS DECIMAL(38,0))) AS DOUBLE)
             / {_KM_SCALE}.0 / {_KM_SCALE}.0 AS inertia
    FROM a{rounds} GROUP BY cid ORDER BY cluster_id"""
    )
    return "".join(parts)


@query("q225_kmeans_lloyd", oracle=_kmeans_oracle(_KM_ROUNDS))
def q225_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{2} Lloyd iterations of k-means over the embedding corpus with
    md5-sampled seeds — distributed cluster REFINEMENT with an exact
    oracle (q72 computes static per-label centroids; q187 uses seeds
    without refining; MLlib's KMeans is engine-specific RNG — the q32
    class). Coordinates ride the 1e-6 integer grid: assignment distances
    are exact int64 sums of squared integer diffs (argmin tie-broken by
    cluster id), and the centroid update rounds the per-dimension mean
    half-up on the SAME grid via ``floor((2Σv+n)/(2n))`` — the operands
    stay < 2^53 (|Σv| ≤ n·{1_000_000}·max|x|), so the double division is
    exact and engine-independent; a petabyte-scale corpus would move the
    update to DECIMAL division, same rounding rule. Execution shape per
    round: one broadcast of the k·dim centroid table onto the exploded
    (vec, pos) frame, one argmin aggregate, one (cid, pos) re-aggregate —
    the corpus shuffles by vec_id once per round, centroids never exceed
    metadata size. Inertia is reported as the exact decimal sum of
    final-round distances, descaled."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.floor(F.col("v") * _KM_SCALE + F.lit(0.5)).cast("long").alias("vq"),
    ).localCheckpoint(eager=True)  # read 2x per round (assign + update)
    seeds = (
        emb.select(
            "vec_id",
            F.md5(F.concat(F.lit("km:"), F.col("vec_id").cast("string"))).alias(
                "h"
            ),
        )
        .orderBy("h")
        .limit(_KM_K)
        .select("vec_id")
        .withColumn("cid", F.row_number().over(Window.orderBy("vec_id")) - 1)
    )
    cent = (
        pe.join(F.broadcast(seeds), "vec_id")
        .select("cid", "pos", F.col("vq").alias("cq"))
        .localCheckpoint(eager=True)  # k·dim rows; cuts the seed-scan lineage
    )
    assign = None
    for _ in range(_KM_ROUNDS):
        d = (
            pe.join(F.broadcast(cent), "pos")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum(
                    (F.col("vq") - F.col("cq")) * (F.col("vq") - F.col("cq"))
                )
                .cast("long")
                .alias("dist")
            )
        )
        assign = d.groupBy("vec_id").agg(
            F.min(F.struct("dist", "cid")).alias("m")
        ).select(
            "vec_id", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist")
        )
        cent = (
            assign.join(pe, "vec_id")
            .groupBy("cid", "pos")
            .agg(
                F.floor(
                    (2.0 * F.sum("vq") + F.count("*")) / (2.0 * F.count("*"))
                )
                .cast("long")
                .alias("cq")
            )
        )
    return (
        assign.groupBy(F.col("cid").cast("int").alias("cluster_id"))
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            (
                F.sum(F.col("dist").cast("decimal(38,0)")).cast("double")
                / float(_KM_SCALE)
                / float(_KM_SCALE)
            ).alias("inertia"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# q226 — smoothed target encoding
# ---------------------------------------------------------------------------

_TE_M = 10  # smoothing pseudo-count


@query(
    "q226_target_encoding",
    oracle=f"""
    WITH j AS (
      SELECT c.c_nationkey,
             CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    g AS (SELECT c_nationkey, COUNT(*) AS n, SUM(y) AS pos
          FROM j GROUP BY c_nationkey),
    tot AS (SELECT SUM(n) AS total, SUM(pos) AS gpos FROM g)
    SELECT g.c_nationkey,
           CAST(g.n AS BIGINT) AS n_orders,
           CAST(g.pos AS BIGINT) AS n_pos,
           CAST(g.pos * t.total + {_TE_M} * t.gpos AS DOUBLE)
             / CAST(t.total * (g.n + {_TE_M}) AS DOUBLE) AS encoded
    FROM g, tot t ORDER BY g.c_nationkey
    """,
)
def q226_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding — the leakage-safe categorical feature:
    encode each customer nation by its rate of finished ('F') orders,
    shrunk toward the global prior with {10} pseudo-counts:
    ``(pos + m·prior) / (n + m)``. Computed as one integer rational —
    ``(pos·total + m·gpos) / (total·(n+m))`` — so the only float op is
    the final division on bit-identical int64 operands. Scale: one
    broadcast dim join, one group-by, one scalar cross join; the
    |categories|-row rollup localCheckpoints because the global prior
    and the final projection both read it (bare, the prior replayed the
    fact join — 2 scans of each table measured), and it is the frame a
    consumer would broadcast wherever the feature is used."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    from .plans.hints import broadcast_if_small

    j = o.join(broadcast_if_small(c), F.col("c_custkey") == F.col("o_custkey"))
    g = (
        j.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("pos"),
        )
        .localCheckpoint(eager=True)
    )
    tot = g.agg(F.sum("n").alias("total"), F.sum("pos").alias("gpos"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            F.col("n").cast("long").alias("n_orders"),
            F.col("pos").cast("long").alias("n_pos"),
            (
                (F.col("pos") * F.col("total") + _TE_M * F.col("gpos")).cast(
                    "double"
                )
                / (F.col("total") * (F.col("n") + _TE_M)).cast("double")
            ).alias("encoded"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# q227 — feature hashing (the hashing trick)
# ---------------------------------------------------------------------------

_FH_DIM = 64


@query(
    "q227_feature_hashing",
    oracle=f"""
    WITH feats AS (
      SELECT 'priority:' || o_orderpriority AS f FROM orders
      UNION ALL SELECT 'status:' || o_orderstatus FROM orders
      UNION ALL SELECT 'custmod:' || CAST(o_custkey % 10 AS VARCHAR)
        FROM orders),
    hashed AS (
      SELECT CAST(CAST('0x' || substr(md5('fh:' || f), 1, 15) AS BIGINT)
                  % {_FH_DIM} AS BIGINT) AS idx,
             CASE WHEN substr(md5('sg:' || f), 1, 1) <= '7'
                  THEN 1 ELSE -1 END AS sign
      FROM feats)
    SELECT idx,
           CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(SUM(sign) AS BIGINT) AS net_weight
    FROM hashed GROUP BY idx ORDER BY idx
    """,
)
def q227_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-hashing trick (Weinberger et al. 2009): map unbounded
    categorical feature strings into a fixed {64}-dim vector by hashed
    index, with a second hash choosing the sign (the collision-bias
    correction). Hashes are md5-derived — portable, so the oracle replays
    them exactly: index = 15 hex chars mod dim, sign = first hex char of
    an independent salt ≤ '7'. The output is the aggregated corpus
    vector — per index, feature count and signed net weight. Scale: pure
    map-side projection + one {64}-key aggregate; no vocabulary state at
    all (the trick's point — encoding needs no fitted dictionary). The
    3-way UNION ALL reads orders three times, but each branch's scan
    prunes to its ONE column — columnar scans of disjoint columns read
    the same total bytes as a single wide scan, and the flat projection
    branches codegen simpler than an explode-over-array generator
    (A/B'd ~2× faster at sf0.1)."""
    o = load_table(spark, sf_dir, "orders")
    feats = (
        o.select(
            F.concat(F.lit("priority:"), F.col("o_orderpriority")).alias("f")
        )
        .unionAll(
            o.select(F.concat(F.lit("status:"), F.col("o_orderstatus")).alias("f"))
        )
        .unionAll(
            o.select(
                F.concat(
                    F.lit("custmod:"), (F.col("o_custkey") % 10).cast("string")
                ).alias("f")
            )
        )
    )
    hashed = feats.select(
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("fh:"), F.col("f"))), 1, 15),
                16,
                10,
            ).cast("long")
            % _FH_DIM
        ).alias("idx"),
        F.when(
            F.substring(F.md5(F.concat(F.lit("sg:"), F.col("f"))), 1, 1)
            <= "7",
            1,
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return (
        hashed.groupBy("idx")
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum("sign").cast("long").alias("net_weight"),
        )
        .orderBy("idx")
    )


# ---------------------------------------------------------------------------
# q228 — TextRank keyword extraction
# ---------------------------------------------------------------------------

_TR_ITERS = 3
_TR_TOPN = 20

_NORM_SQL = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')"
)
_TR_TOKS_SQL = f"list_filter(string_split({_NORM_SQL}, ' '), x -> x != '')"


def _textrank_oracle(iters: int) -> str:
    """q23's quantized-PageRank recurrence unrolled over the adjacent-word
    co-occurrence graph instead of the user-event graph."""
    parts = [
        f"""
    WITH base AS (SELECT {_TR_TOKS_SQL} AS l FROM documents),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(l) - 1),
               i -> {{'a': l[i], 'b': l[i+1]}})) AS p
      FROM base WHERE len(l) >= 2),
    e0 AS MATERIALIZED (
      SELECT least(p.a, p.b) AS src, greatest(p.a, p.b) AS dst,
             COUNT(*) AS weight
      FROM bg WHERE p.a != p.b GROUP BY 1, 2),
    sym AS (SELECT src, dst, weight FROM e0
            UNION ALL SELECT dst, src, weight FROM e0),
    tot AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS total
            FROM sym GROUP BY src),
    e AS (SELECT s.src, s.dst,
                 CAST(s.weight AS DOUBLE) / CAST(t.total AS DOUBLE) AS w
          FROM sym s JOIN tot t ON s.src = t.src),
    verts AS (SELECT DISTINCT src AS id FROM sym),
    nn AS (SELECT COUNT(*) AS n FROM verts),
    pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS pr FROM verts)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    pr{i} AS (SELECT v.id,
      (1.0 - 0.15) * COALESCE(c.contrib, 0.0)
        + 0.15 / (SELECT n FROM nn) AS pr
      FROM verts v LEFT JOIN (
        SELECT e.dst AS id,
               CAST(CAST(SUM(CAST(FLOOR(p.pr * e.w * 1e14 + 0.5) AS BIGINT))
                    AS BIGINT) AS DOUBLE) / 1e14 AS contrib
        FROM e JOIN pr{i - 1} p ON e.src = p.id GROUP BY e.dst) c
      ON v.id = c.id)"""
        )
    parts.append(
        f"""
    SELECT id AS word, pr AS textrank FROM pr{iters}
    ORDER BY textrank DESC, word LIMIT {_TR_TOPN}"""
    )
    return "".join(parts)


@query("q228_textrank_keywords", oracle=_textrank_oracle(_TR_ITERS))
def q228_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    the adjacent-word co-occurrence graph — the unsupervised keyword
    scorer an LLM-corpus pipeline uses for salience tagging. The word
    graph builds WITHOUT a self-join (one ``transform`` per token array,
    undirected via least/greatest + both-direction union), per-source
    weight normalization and {3} PageRank iterations reuse the exact
    q23 operator (keyed persist of edges, quantized int64 contribution
    sums, per-iteration localCheckpoint), and the top-{20} cut is a
    TakeOrderedAndProject on the bit-identical (rank, word) order.
    Scale: the graph is vocab-sized — corpus scanned once."""
    from .functions.text import tokens
    from .graph.pagerank import pagerank

    d = load_table(spark, sf_dir, "documents")
    base = d.select(tokens("text").alias("l")).filter(F.size("l") >= 2)
    bg = base.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(l) - 1),"
                " i -> struct(l[i-1] AS a, l[i] AS b))"
            )
        ).alias("p")
    ).filter(F.col("p.a") != F.col("p.b"))
    e0 = bg.groupBy(
        F.least("p.a", "p.b").alias("src"),
        F.greatest("p.a", "p.b").alias("dst"),
    ).agg(F.count("*").alias("weight"))
    sym = e0.unionAll(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )
    total = F.sum("weight").over(Window.partitionBy("src"))
    e = sym.select(
        "src",
        "dst",
        (F.col("weight").cast("double") / total.cast("double")).alias("weight"),
    )
    ranks = pagerank(e, alpha=0.15, max_iter=_TR_ITERS)
    return (
        ranks.select(F.col("id").alias("word"), F.col("pagerank").alias("textrank"))
        .orderBy(F.col("textrank").desc(), "word")
        .limit(_TR_TOPN)
    )
