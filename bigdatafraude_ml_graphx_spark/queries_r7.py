"""Round-7 batch: BPE merge iteration, SemDeDup embedding-cluster dedup,
market-basket pairs, referential-integrity audit, count-min sketch,
approx-quantile contract, GROUP BY ALL, and null-safe joins.

Determinism: BPE argmaxes break ties on (count DESC, a, b) string order;
cosines ride the 1e12 quantized-int64 grid; everything else is integer
counting over md5-derived keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table, register_views
from .queries import query

# ---------------------------------------------------------------------------
# q186 — BPE merge-pair iteration (tokenizer training primitive)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_oracle(rounds: int) -> str:
    """Unrolled-round oracle (the q149 MATERIALIZED technique): each round
    materializes the pair count, the argmax, and the rewritten vocabulary,
    so DuckDB replays the exact greedy sequence the engine executes."""
    parts = [
        """
    WITH w AS MATERIALIZED (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word),
    c0 AS MATERIALIZED (
      SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS seq, freq
      FROM w)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    p{r} AS (
      SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt FROM (
        SELECT l, freq, unnest(generate_series(1, len(l) - 1)) AS i
        FROM (SELECT string_split(trim(seq), '  ') AS l, freq
              FROM c{r - 1}) s) t
      GROUP BY 1, 2),
    m{r} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    c{r} AS MATERIALIZED (
      SELECT replace(seq, ' ' || m.a || '  ' || m.b || ' ',
                     ' ' || m.a || m.b || ' ') AS seq, freq
      FROM c{r - 1}, m{r} m)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, a, b, a || b AS merged,"
        f" CAST(cnt AS BIGINT) AS merge_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"\n    {selects}\n    ORDER BY round")
    return "".join(parts)


@query("q186_bpe_merges", oracle=_bpe_oracle(_BPE_ROUNDS))
def q186_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE merge training over the documents corpus — the one
    LLM-tokenizer primitive the engine lacked (q101 counts bigram
    CANDIDATES; this performs the iterative merges). Trains on the
    distinct-word frequency table (|vocab| rows per round, one corpus
    scan total — the shape that holds at 100 TB); each round's argmax is
    a 1-row bounded collect, and the merge itself is a literal
    double-space ``replace`` whose left-to-right non-overlapping
    semantics are identical in Spark and DuckDB — certified by the
    unrolled MATERIALIZED oracle replaying all {3} rounds."""
    from .functions.bpe import bpe_merges, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_merges(word_frequencies(docs), _BPE_ROUNDS)
    return spark.createDataFrame(
        merges,
        "round int, a string, b string, merged string, merge_count long",
    ).orderBy("round")


# ---------------------------------------------------------------------------
# q187 — SemDeDup: embedding-cluster semantic dedup (IVF cells + threshold)
# ---------------------------------------------------------------------------

_SEM_K = 16          # deterministic seed centroids (md5 bottom-k sample)
_SEM_THRESHOLD = 0.35  # calibrated: within-cell cosines skew right (cells
# share an argmax direction), so q46's global 0.25 marks ~85% of the sf0.1
# corpus dup; 0.35 measures 10% (sf0.01) / 28% (sf0.1) — a dedup, not a purge
_SEM_CELL_CAP = 1000   # pair-builder cap; inert at test scale
_SEM_DIM = 64


def _sem_qdot(va: str, vb: str) -> str:
    prods = (
        f"[CAST(floor(CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE)"
        f" * 1e12 + 0.5) AS BIGINT) for i in range(1, {_SEM_DIM + 1})]"
    )
    return f"(CAST(CAST(list_sum({prods}) AS BIGINT) AS DOUBLE) / 1e12)"


def _sem_oracle() -> str:
    cos_ec = (
        f"{_sem_qdot('e.embedding', 'c.cvec')}"
        f" / (sqrt({_sem_qdot('e.embedding', 'e.embedding')})"
        f" * sqrt({_sem_qdot('c.cvec', 'c.cvec')}))"
    )
    cos_xy = (
        f"{_sem_qdot('x.embedding', 'y.embedding')}"
        f" / (sqrt({_sem_qdot('x.embedding', 'x.embedding')})"
        f" * sqrt({_sem_qdot('y.embedding', 'y.embedding')}))"
    )
    return f"""
    WITH seed AS MATERIALIZED (
      SELECT vec_id FROM embeddings
      ORDER BY md5('s:' || CAST(vec_id AS VARCHAR)) LIMIT {_SEM_K}),
    cent AS MATERIALIZED (
      SELECT e.vec_id AS cid, e.embedding AS cvec,
             ROW_NUMBER() OVER (ORDER BY e.vec_id) - 1 AS cell
      FROM embeddings e JOIN seed s ON s.vec_id = e.vec_id),
    assign AS MATERIALIZED (
      SELECT vec_id, cell, embedding FROM (
        SELECT e.vec_id, c.cell, e.embedding,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {cos_ec} DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1),
    okcell AS (
      SELECT cell FROM assign GROUP BY cell
      HAVING COUNT(*) <= {_SEM_CELL_CAP}),
    a2 AS MATERIALIZED (
      SELECT a.vec_id, a.cell, a.embedding
      FROM assign a JOIN okcell o ON o.cell = a.cell),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE {cos_xy} >= {_SEM_THRESHOLD})
    SELECT a2.vec_id, CAST(a2.cell AS INT) AS cell, MIN(p.id_a) AS dup_of
    FROM a2 LEFT JOIN pairs p ON p.id_b = a2.vec_id
    GROUP BY a2.vec_id, a2.cell
    """


@query("q187_semdedup", oracle=_sem_oracle())
def q187_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication in embedding
    space — the embedding complement of MinHash/SimHash. Vectors are
    assigned to IVF-style cells (argmax quantized cosine to {16}
    deterministic seed centroids — the md5 bottom-k sample, so the
    partitioner replays in SQL; k-means centroids would be
    engine-specific, the q49/q32 class), pair generation runs ONLY
    within a cell (never O(N²) — the IVF composition VERDICT r6 item 8
    prescribed), hot cells drop via the shared cap discipline, and a
    vector is a duplicate iff a LOWER-ID cellmate sits above the cosine
    threshold — ``dup_of`` = the smallest such id, NULL for kept
    vectors (the keep-one-per-group rule, deterministic by id order).

    Scale shape: centroids broadcast (constant {16} rows — the PQ lesson:
    a broadcast-join codebook frame, never m·k inlined literals, which
    measured compile-bound); assignment is one narrow pass; the
    within-cell self-join is cell-partitioned and capped. Quantized
    int64 dot products (1e12 grid) make every cosine bit-identical to
    the oracle's."""
    from pyspark.sql import Window

    from .operators.skew import drop_hot_buckets
    from .similarity.cosine import _pos_products, _qsum_array

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.select(
            "vec_id",
            F.md5(F.concat(F.lit("s:"), F.col("vec_id").cast("string"))).alias("h"),
        )
        .orderBy("h")
        .limit(_SEM_K)
        .select("vec_id")
    )
    cent = (
        emb.join(F.broadcast(seeds), "vec_id")
        .select(F.col("embedding").alias("cvec"), F.col("vec_id").alias("cid"))
        .withColumn(
            "cell", F.row_number().over(Window.orderBy("cid")) - 1
        )  # 16 rows: the single-partition window is bounded by construction
        .drop("cid")
    )

    # Norms are computed ONCE per vector/centroid and carried as columns:
    # recomputing them inside the cosine makes the pair stage fold 3 arrays
    # per pair instead of 1 (measured ~3× fold work at sf0.1). The carried
    # norm is the identical quantized-exact value the oracle derives
    # inline, so results are unchanged.
    def _norm_of(c):
        return F.sqrt(_qsum_array(_pos_products(c, c)))

    cent = cent.withColumn("cnorm", _norm_of(F.col("cvec")))
    embn = emb.withColumn("vnorm", _norm_of(F.col("embedding")))
    cos_ec = _qsum_array(_pos_products(F.col("embedding"), F.col("cvec"))) / (
        F.col("vnorm") * F.col("cnorm")
    )
    best = (
        embn.crossJoin(F.broadcast(cent))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct((-cos_ec).alias("nc"), F.col("cell").alias("cell"))
            ).alias("m")
        )
        .select("vec_id", F.col("m.cell").alias("cell"))
    )
    assigned = embn.join(best, "vec_id").select(
        "vec_id", "cell", "embedding", "vnorm"
    )
    capped = drop_hot_buckets(assigned, ["cell"], _SEM_CELL_CAP).localCheckpoint(
        eager=True
    )  # pair builder reads it from both sides
    x, y = capped.alias("x"), capped.alias("y")
    cos_xy = _qsum_array(
        _pos_products(F.col("x.embedding"), F.col("y.embedding"))
    ) / (F.col("x.vnorm") * F.col("y.vnorm"))
    pairs = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("id_a"),
            F.col("y.vec_id").alias("id_b"),
            cos_xy.alias("cos"),
        )
        .filter(F.col("cos") >= _SEM_THRESHOLD)
    )
    dup = pairs.groupBy(F.col("id_b").alias("vec_id")).agg(
        F.min("id_a").alias("dup_of")
    )
    return capped.select("vec_id", F.col("cell").cast("int").alias("cell")).join(
        dup, "vec_id", "left_outer"
    )


# ---------------------------------------------------------------------------
# q188 — market-basket part pairs (co-purchase analysis)
# ---------------------------------------------------------------------------

_BASKET_CAP = 50   # parts per order; TPC-H orders carry <= 7 lineitems, so
#                    inert here — the hub-proof guard for degenerate baskets
_BASKET_TOPN = 25


@query(
    "q188_market_basket",
    oracle=f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM d GROUP BY l_orderkey
           HAVING COUNT(*) <= {_BASKET_CAP}),
    d2 AS (SELECT d.l_orderkey, d.l_partkey FROM d
           JOIN ok ON ok.l_orderkey = d.l_orderkey),
    p AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS cnt
      FROM d2 a JOIN d2 b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, CAST(cnt AS BIGINT) AS n_orders
    FROM p ORDER BY n_orders DESC, part_a, part_b LIMIT {_BASKET_TOPN}
    """,
)
def q188_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase pairs: the top part pairs by number of
    orders containing both — the association-rule support count
    (retail analytics' frequent-itemset k=2 base case). Pre-distinct to
    one row per (order, part) bounds the self-join to distinct-pair
    work; the basket cap (orders with > {50} distinct parts drop —
    inert on TPC-H's ≤7-line orders, hub-proof against degenerate
    baskets at 100×) follows the shared pair-builder discipline; the
    top-k compiles to TakeOrderedAndProject, never a global sort. The
    distinct (order, part) frame localCheckpoints once: it is consumed
    4× (the cap's hot-key rollup + its anti-join, then both self-join
    sides) and bare each consumer replayed the scan AND the distinct
    shuffle (4 of each measured). The checkpoint is the minimal 2-int
    representation of the baskets (the q209 edge-list trade); the capped
    frame itself stays lazy — its rebuild per join side is a map-side
    partial-agg rollup + a broadcast anti-join over the checkpointed
    blocks, cheaper at scale than a second fact-sized materialization."""
    from .operators.skew import drop_hot_buckets

    li = load_table(spark, sf_dir, "lineitem")
    d = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    d2 = drop_hot_buckets(d, ["l_orderkey"], _BASKET_CAP)
    a, b = d2.alias("a"), d2.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(_BASKET_TOPN)
    )


# ---------------------------------------------------------------------------
# q189 — referential-integrity audit (orphan counts per FK edge)
# ---------------------------------------------------------------------------


@query(
    "q189_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (o.o_orderkey IS NULL) AS BIGINT) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (p.p_partkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (s.s_suppkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (c.c_custkey IS NULL) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (n.n_nationkey IS NULL) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY fk
    """,
)
def q189_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: per FK edge, total rows and orphans
    (child keys with no parent) — the data-quality gate every warehouse
    load runs. Every child table is scanned ONCE: all of its outgoing FK
    edges probe as LEFT joins against key-only parent frames (maximal
    pruning, size-guarded broadcast) in a single pass, and the per-edge
    (n_rows, n_orphans) pairs fall out of one fused aggregate (``COUNT``
    of null parent keys — the exact LEFT-JOIN shape the oracle runs, so
    duplicate-parent-key semantics match it by construction). The earlier
    per-edge anti-join variant re-scanned lineitem six times (30 parquet
    scans in the optimized plan); this plan has exactly one scan per
    table role — pinned in tests/test_plans.py."""
    from .plans.hints import broadcast_if_small

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    okeys = load_table(spark, sf_dir, "orders").select("o_orderkey")
    pkeys = load_table(spark, sf_dir, "part").select("p_partkey")
    skeys = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    li_row = (
        li.join(
            broadcast_if_small(okeys),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .join(
            broadcast_if_small(pkeys),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .join(
            broadcast_if_small(skeys),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("o_orderkey").isNull(), True)).alias("orph_o"),
            F.count(F.when(F.col("p_partkey").isNull(), True)).alias("orph_p"),
            F.count(F.when(F.col("s_suppkey").isNull(), True)).alias("orph_s"),
        )
    )
    li_rows = li_row.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem.l_orderkey->orders").alias("fk"),
                    F.col("n").alias("n_rows"),
                    F.col("orph_o").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_partkey->part").alias("fk"),
                    F.col("n").alias("n_rows"),
                    F.col("orph_p").alias("n_orphans"),
                ),
                F.struct(
                    F.lit("lineitem.l_suppkey->supplier").alias("fk"),
                    F.col("n").alias("n_rows"),
                    F.col("orph_s").alias("n_orphans"),
                ),
            )
        ).alias("r")
    ).select("r.fk", "r.n_rows", "r.n_orphans")

    def single_edge(fk, child, ckey, parent, pkey):
        c = load_table(spark, sf_dir, child).select(F.col(ckey))
        p = load_table(spark, sf_dir, parent).select(F.col(pkey))
        return (
            c.join(broadcast_if_small(p), F.col(ckey) == F.col(pkey), "left")
            .agg(
                F.count("*").alias("n_rows"),
                F.count(F.when(F.col(pkey).isNull(), True)).alias("n_orphans"),
            )
            .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans")
        )

    out = li_rows.unionByName(
        single_edge(
            "orders.o_custkey->customer",
            "orders", "o_custkey", "customer", "c_custkey",
        )
    ).unionByName(
        single_edge(
            "customer.c_nationkey->nation",
            "customer", "c_nationkey", "nation", "n_nationkey",
        )
    )
    return out.orderBy("fk")


# ---------------------------------------------------------------------------
# q190 — count-min sketch with fully exact oracle
# ---------------------------------------------------------------------------

_CMS_D = 4    # hash rows
_CMS_W = 64   # counters per row
_CMS_TOPN = 10


def _cms_bucket_sql(j: int) -> str:
    return (
        f"CAST(('0x' || substring(md5('{j}:' || CAST(user_id AS VARCHAR)),"
        f" 1, 15)) AS BIGINT) % {_CMS_W}"
    )


@query(
    "q190_countmin_sketch",
    oracle=f"""
    WITH cnt AS MATERIALIZED (
      SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id),
    top AS MATERIALIZED (
      SELECT user_id, exact_cnt FROM cnt
      ORDER BY exact_cnt DESC, user_id LIMIT {_CMS_TOPN}),
    hashed AS (
      SELECT user_id, exact_cnt,
             {", ".join(f"{_cms_bucket_sql(j)} AS b{j}" for j in range(_CMS_D))}
      FROM cnt),
    counters AS MATERIALIZED (
      {" UNION ALL ".join(
        f"SELECT {j} AS j, b{j} AS bucket, SUM(exact_cnt) AS counter"
        f" FROM hashed GROUP BY b{j}" for j in range(_CMS_D))}),
    est AS (
      SELECT h.user_id, MIN(c.counter) AS cms_estimate
      FROM hashed h
      JOIN counters c ON
        (c.j = 0 AND c.bucket = h.b0) OR (c.j = 1 AND c.bucket = h.b1)
        OR (c.j = 2 AND c.bucket = h.b2) OR (c.j = 3 AND c.bucket = h.b3)
      GROUP BY h.user_id)
    SELECT t.user_id, CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           e.cms_estimate >= t.exact_cnt AS overestimate_ok
    FROM top t JOIN est e ON e.user_id = t.user_id
    ORDER BY exact_cnt DESC, t.user_id
    """,
)
def q190_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) point queries with
    a FULLY exact oracle — the portable-md5 discipline (q23/q158) applied
    to the CM structure: both engines materialize the identical d×w
    counter matrix ({4}×{64}, mergeable integer state — at 100 TB each
    partition sums its own matrix and they add elementwise), so the
    ESTIMATES themselves hash-match, not just their error bounds. Emits
    the top-{10} users by exact count with exact vs CMS estimate and the
    theorem guarantee est ≥ exact (min over counters, each a supersum of
    the true count — deterministically TRUE, and the oracle computes the
    same min). Estimation error here is the expected sum-of-colliders;
    the sketch answers point queries from {256} counters instead of
    |users| rows."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    buckets = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col("user_id").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        ).alias(f"b{j}")
        for j in range(_CMS_D)
    ]
    hashed = cnt.select("user_id", "exact_cnt", *buckets).localCheckpoint(
        eager=True
    )  # read (d+2) times: counters per row, top-k, estimate join
    counters = None
    for j in range(_CMS_D):
        cj = hashed.groupBy(F.col(f"b{j}").alias("bucket")).agg(
            F.sum("exact_cnt").alias("counter")
        ).select(F.lit(j).alias("j"), "bucket", "counter")
        counters = cj if counters is None else counters.unionByName(cj)
    top = (
        hashed.select("user_id", "exact_cnt", *[f"b{j}" for j in range(_CMS_D)])
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(_CMS_TOPN)
    )
    melted = top.select(
        "user_id",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"b{j}").alias("bucket")
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jb"),
    )
    est = (
        melted.join(
            F.broadcast(counters),  # d·w = 256 rows by construction
            (F.col("jb.j") == F.col("j")) & (F.col("jb.bucket") == F.col("bucket")),
        )
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("counter").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_cnt")).alias("overestimate_ok"),
    ).orderBy(F.col("exact_cnt").desc(), "user_id")


# ---------------------------------------------------------------------------
# q191 — approx_percentile rank-error contract (GK sketch guarantee)
# ---------------------------------------------------------------------------

_AQ_ACCURACY = 100  # GK eps = 1/accuracy -> rank error <= n/100


@query(
    "q191_approx_quantile_contract",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM events
    """,
)
def q191_approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated error contract for ``approx_percentile`` — the
    q178-discipline (theorem bound as a pinned boolean) applied to
    Spark's Greenwald-Khanna sketch: with accuracy {100}, the returned
    value's RANK must sit within ±n/{100} of the target rank q·n. The
    engine computes the estimates, then one exact pass counts
    values strictly below / at-or-below each estimate; the contract
    holds iff the rank interval [n_lt, n_le] intersects the allowed
    band. The sketch itself is engine-specific (mergeable per-partition
    state — the 100 TB path); the BOUND is the portable truth the
    oracle pins, exactly as q178 pins Misra-Gries and q140 pins IVF
    recall."""
    ev = load_table(spark, sf_dir, "events").select("value")
    est = ev.agg(
        F.percentile_approx("value", 0.5, _AQ_ACCURACY).alias("p50"),
        F.percentile_approx("value", 0.9, _AQ_ACCURACY).alias("p90"),
    ).collect()[0]  # two scalars — bounded read
    checks = ev.agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") < est["p50"]).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= est["p50"]).cast("long")).alias("le50"),
        F.sum((F.col("value") < est["p90"]).cast("long")).alias("lt90"),
        F.sum((F.col("value") <= est["p90"]).cast("long")).alias("le90"),
    ).collect()[0]
    n = checks["n"]
    tol = n / _AQ_ACCURACY

    def ok(lt, le, q):
        lo, hi = q * n - tol, q * n + tol
        return bool(lt <= hi and le >= lo)

    return spark.createDataFrame(
        [
            (
                n,
                ok(checks["lt50"], checks["le50"], 0.5),
                ok(checks["lt90"], checks["le90"], 0.9),
            )
        ],
        "n_events long, p50_ok boolean, p90_ok boolean",
    )


# ---------------------------------------------------------------------------
# q192 — GROUP BY ALL (dual SQL surface, identical text on both engines)
# ---------------------------------------------------------------------------

_GBA_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ALL
ORDER BY o_orderstatus, o_orderpriority
"""


@query("q192_group_by_all", oracle=_GBA_SQL)
def q192_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the modern-SQL ergonomic surface (every
    non-aggregate select item becomes a grouping key), run as the SAME
    SQL text on Spark and DuckDB. The decimal-sum-then-double cast is
    the engine's deterministic-float-aggregate contract expressed
    portably inline."""
    register_views(spark, sf_dir)
    return spark.sql(_GBA_SQL)


# ---------------------------------------------------------------------------
# q193 — null-safe equi join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------


@query(
    "q193_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT nullif(event_type, 'click') AS k, COUNT(*) AS n_low
      FROM events WHERE value < 50 GROUP BY 1),
    b AS (
      SELECT nullif(event_type, 'click') AS k, COUNT(*) AS n_high
      FROM events WHERE value >= 50 GROUP BY 1)
    SELECT a.k, CAST(a.n_low AS BIGINT) AS n_low,
           CAST(b.n_high AS BIGINT) AS n_high
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY a.k NULLS FIRST
    """,
)
def q193_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (Spark ``<=>`` / ANSI IS NOT DISTINCT FROM):
    the NULL group — here manufactured by NULLIF over a real key — must
    MATCH across sides instead of silently dropping, the semantics
    MERGE/CDC key comparisons depend on. Catalyst plans ``eqNullSafe``
    as a hash join on a null-tolerant key (no cartesian fallback);
    verified against DuckDB's IS NOT DISTINCT FROM."""
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("click")).alias("k")
    a = (
        ev.filter(F.col("value") < 50)
        .select(k)
        .groupBy("k")
        .agg(F.count("*").alias("n_low"))
    )
    b = (
        ev.filter(F.col("value") >= 50)
        .select(k)
        .groupBy("k")
        .agg(F.count("*").alias("n_high"))
        .withColumnRenamed("k", "kb")
    )
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("kb")))
        .select("k", "n_low", "n_high")
        .orderBy(F.col("k").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q194 — graph eccentricity from deterministic landmark sample
# ---------------------------------------------------------------------------

_ECC_SOURCES = 4
_ECC_MIN_WEIGHT = 5


@query(
    "q194_graph_eccentricity",
    oracle=f"""
    WITH RECURSIVE b AS (
      SELECT DISTINCT user_id AS entity, date_trunc('hour', ts) AS bucket,
             event_type
      FROM events),
    e0 AS (
      SELECT a.entity AS src, b2.entity AS dst
      FROM b a JOIN b b2
        ON a.bucket = b2.bucket AND a.event_type = b2.event_type
       AND a.entity < b2.entity
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_ECC_MIN_WEIGHT}),
    sym AS (SELECT src AS u, dst AS v FROM e0
            UNION SELECT dst, src FROM e0),
    verts AS (SELECT DISTINCT u AS id FROM sym),
    nn AS (SELECT COUNT(*) AS n FROM verts),
    src4 AS MATERIALIZED (
      SELECT id FROM verts
      ORDER BY md5('e:' || CAST(id AS VARCHAR)) LIMIT {_ECC_SOURCES}),
    paths(s, id, d) AS (
      SELECT id, id, 0 FROM src4
      UNION
      SELECT p.s, sym.v, p.d + 1 FROM paths p JOIN sym ON sym.u = p.id
      WHERE p.d + 1 < (SELECT n FROM nn)),
    md AS (SELECT s, id, MIN(d) AS d FROM paths GROUP BY s, id)
    SELECT s AS source, CAST(MAX(d) AS INT) AS eccentricity,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_reached
    FROM md GROUP BY s
    ORDER BY source
    """,
)
def q194_graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eccentricity (max hop distance over the reachable set) from {4}
    deterministic landmark vertices (md5 bottom-k of the vertex set) on
    the sparsified co-occurrence graph — max over the landmark sample is
    the standard distributed lower bound on graph diameter (exact
    diameter is all-pairs, quadratic). Rides the existing BFS operator
    (per-round localCheckpoint, fingerprint convergence, loud raise);
    the oracle closes the same BFS with a UNION-dedup recursive CTE
    bounded by |V|. Sparsification (weight ≥ {5}) per the repo rule:
    the raw co-occurrence graph is near-complete. The sparsified edge
    list localCheckpoints once (the q209 discipline): it feeds the BFS
    persist AND both halves of the landmark-selection vertex union —
    bare, the wedge-join edge build executed 3× (the landmark frame's
    lineage runs eagerly inside the BFS's first checkpoint)."""
    from .graph import cooccurrence_edges
    from .graph.bfs import shortest_paths

    ev = load_table(spark, sf_dir, "events")
    e = (
        cooccurrence_edges(ev, "user_id", "ts", "hour", ("event_type",))
        .filter(F.col("weight") >= _ECC_MIN_WEIGHT)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # read 3x: BFS sym + vertex union
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    sources = (
        verts.select(
            "id",
            F.md5(F.concat(F.lit("e:"), F.col("id").cast("string"))).alias("h"),
        )
        .orderBy("h")
        .limit(_ECC_SOURCES)
        .select("id")
    )
    sp = shortest_paths(e, sources)
    return (
        sp.groupBy(F.col("landmark").alias("source"))
        .agg(
            F.max("distance").cast("int").alias("eccentricity"),
            (F.count("*") - 1).alias("n_reached"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q195 — gaps-and-islands: consecutive same-event streaks per user
# ---------------------------------------------------------------------------

_STREAK_MIN = 3


@query(
    "q195_event_streaks",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS island
      FROM events),
    streaks AS (
      SELECT user_id, event_type, island, COUNT(*) AS len
      FROM seq GROUP BY 1, 2, 3)
    SELECT event_type,
           CAST(MAX(len) AS INT) AS max_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(COUNT(DISTINCT CASE WHEN len >= {_STREAK_MIN}
                                    THEN user_id END) AS BIGINT)
             AS users_with_long_streak
    FROM streaks GROUP BY event_type ORDER BY event_type
    """,
)
def q195_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (the row_number-difference idiom): consecutive
    runs of the same event type per user — streak analytics
    (engagement runs, repeated-failure detection). Two user-partitioned
    windows over one scan (the difference of the two row_numbers is
    constant within a run), then integer aggregates per event type.
    (ts, event_id) totally orders each partition so islands are
    deterministic under timestamp ties."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("island"),
    )
    streaks = seq.groupBy("user_id", "event_type", "island").agg(
        F.count("*").alias("len")
    )
    return (
        streaks.groupBy("event_type")
        .agg(
            F.max("len").cast("int").alias("max_streak"),
            F.count("*").alias("n_streaks"),
            F.countDistinct(
                F.when(F.col("len") >= _STREAK_MIN, F.col("user_id"))
            ).alias("users_with_long_streak"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q196 — join-key skew report (the diagnosis feeding salting decisions)
# ---------------------------------------------------------------------------


def _skew_edge_sql(name: str, table: str, key: str) -> str:
    return f"""
    SELECT '{name}' AS key_name,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 9)
             AS top1_share,
           ROUND(CAST(MAX(cnt) * COUNT(*) AS DOUBLE)
                 / CAST(SUM(cnt) AS DOUBLE), 9) AS skew_ratio
    FROM (SELECT {key}, COUNT(*) AS cnt FROM {table} GROUP BY {key}) t"""


@query(
    "q196_skew_report",
    oracle=" UNION ALL ".join(
        [
            _skew_edge_sql("events.user_id", "events", "user_id"),
            _skew_edge_sql("lineitem.l_partkey", "lineitem", "l_partkey"),
            _skew_edge_sql("orders.o_custkey", "orders", "o_custkey"),
        ]
    )
    + " ORDER BY key_name",
)
def q196_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: per candidate shuffle key, the per-key
    count distribution summary (hottest-key share, max/mean skew ratio)
    that decides between a plain shuffle, AQE skew splitting, and
    explicit salting (operators/skew.py) — the engine's own scale
    machinery applied to its inputs as a query. One map-side-combined
    count per key plus scalar aggregates; ratios are single IEEE
    divides over exact integers, rounded to the 9-dp grid on both
    engines."""

    def edge(name, table, key):
        cnt = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count("*").alias("cnt"))
        )
        return cnt.agg(
            F.lit(name).alias("key_name"),
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_cnt"),
            F.round(
                F.max("cnt").cast("double") / F.sum("cnt").cast("double"), 9
            ).alias("top1_share"),
            F.round(
                (F.max("cnt") * F.count("*")).cast("double")
                / F.sum("cnt").cast("double"),
                9,
            ).alias("skew_ratio"),
        )

    parts = [
        edge("events.user_id", "events", "user_id"),
        edge("lineitem.l_partkey", "lineitem", "l_partkey"),
        edge("orders.o_custkey", "orders", "o_custkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_name")


# ---------------------------------------------------------------------------
# q197 — vocabulary coverage curve (tokens needed to cover p% of corpus)
# ---------------------------------------------------------------------------

_COVERAGE_PCTS = (50, 90, 99)


@query(
    "q197_vocab_coverage",
    oracle=f"""
    WITH w AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE regexp_matches(word, '^[a-z]+$')
      GROUP BY word),
    ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, word
                            ROWS UNBOUNDED PRECEDING) AS cum,
             (SELECT SUM(cnt) FROM w) AS total
      FROM w)
    SELECT pct, CAST(MIN(rank) AS BIGINT) AS k_words,
           CAST(MIN(cum) AS BIGINT) AS covered_tokens
    FROM ranked, (SELECT unnest([{", ".join(map(str, _COVERAGE_PCTS))}]) AS pct) p
    WHERE 100 * cum >= pct * total
    GROUP BY pct ORDER BY pct
    """,
)
def q197_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest top-k word prefix (by
    frequency, word-tiebroken) covering {50}/{90}/{99}% of corpus tokens
    — the tokenizer-design statistic behind vocab-size choices. The
    cumulative sum uses the two-phase distributed pattern
    (distributed_ntile's discipline): a window over DISTINCT COUNT
    VALUES computes class-start offsets, then a per-class row_number
    finishes the global rank and cumulative — no serial window over the
    full vocabulary. Thresholds compare as pure integers
    (100·cum ≥ pct·total), so there is no float boundary to disagree
    on; MIN(cum) at MIN(rank) is well-defined because cum is strictly
    increasing in rank."""
    from .functions.bpe import word_frequencies
    from .plans.hints import broadcast_if_small
    from pyspark.sql import Window

    # Vocab-sized; read 3x (value classes + rank join + total) — bare,
    # each consumer replayed the corpus tokenize+count (3 scans measured).
    w = (
        word_frequencies(load_table(spark, sf_dir, "documents"))
        .withColumnRenamed("freq", "cnt")
        .localCheckpoint(eager=True)
    )
    by_val = w.groupBy("cnt").agg(
        F.count("*").alias("n_words"),
        (F.count("*") * F.col("cnt")).alias("class_tokens"),
    )
    wv = Window.orderBy(F.col("cnt").desc())
    classes = by_val.select(
        "cnt",
        (F.sum("n_words").over(wv) - F.col("n_words")).alias("start_words"),
        (F.sum("class_tokens").over(wv) - F.col("class_tokens")).alias(
            "start_tokens"
        ),
    )
    per_class = Window.partitionBy("cnt").orderBy("word")
    ranked = (
        w.withColumn("_rn", F.row_number().over(per_class))
        .join(broadcast_if_small(classes), "cnt")
        .select(
            (F.col("start_words") + F.col("_rn")).alias("rank"),
            (F.col("start_tokens") + F.col("_rn") * F.col("cnt")).alias("cum"),
        )
    )
    total = w.agg(F.sum("cnt").alias("total"))
    pcts = spark.range(0).sparkSession.createDataFrame(
        [(p,) for p in _COVERAGE_PCTS], "pct int"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(pcts))
        .filter(100 * F.col("cum") >= F.col("pct") * F.col("total"))
        .groupBy("pct")
        .agg(
            F.min("rank").alias("k_words"),
            F.min("cum").alias("covered_tokens"),
        )
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# q198 — exact discrete percentiles per group, two-phase (no serial window)
# ---------------------------------------------------------------------------


@query(
    "q198_percentile_disc_scaled",
    oracle="""
    WITH c AS (
      SELECT event_type, value, COUNT(*) AS c FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, value,
             SUM(c) OVER (PARTITION BY event_type ORDER BY value
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM c)
    SELECT event_type, pct, MIN(value) AS pval
    FROM r, (SELECT unnest([25, 50, 75]) AS pct) p
    WHERE 100 * cum >= pct * n
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q198_percentile_disc_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE_DISC(0.25/0.5/0.75) per event type — the inverse
    distribution function as actual data values (no interpolation, so no
    cross-engine float midpoints — the values hash-match raw, unlike
    q44's rounded percentile_cont). Runs the q144 two-phase discipline
    generalized to arbitrary integer percentiles
    (operators/scale.py::grouped_percentile_disc): cumulative crossing
    over per-(group, value) COUNTS, a pure-integer comparison, never a
    row-level window sorting whole groups."""
    from .operators.scale import grouped_percentile_disc

    ev = load_table(spark, sf_dir, "events")
    return grouped_percentile_disc(
        ev, ["event_type"], "value", (25, 50, 75), out_col="pval"
    ).orderBy("event_type", "pct")


# ---------------------------------------------------------------------------
# q199 — table profile (per-column cardinality / nulls / bounds)
# ---------------------------------------------------------------------------


@query(
    "q199_table_profile",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_nulls,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    ORDER BY col_name
    """,
)
def q199_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling: per-column exact cardinality, null count, and
    canonically-formatted min/max — the warehouse `ANALYZE`/data-card
    pass. Deliberately one aggregate PER COLUMN, not one fused
    multi-distinct: each branch's parquet scan prunes to exactly its
    one column (ReadSchema shows a single field), so the five scans
    together read the same bytes one wide scan would — columnar scans
    of disjoint columns are NOT replays — while each branch keeps the
    simple single-distinct plan (the fused variant's 5-way expand was
    A/B'd at 3.7× slower at sf0.1 and shuffles 6× the rows at any
    scale; at 100 TB swap the distincts for ``approx_count_distinct``
    — the HLL error contract is q81). Values canonicalize
    cross-engine: timestamps via an explicit format string, doubles
    through DECIMAL(18,2) (the data's own scale) — raw double→string
    rendering differs between engines."""
    o = load_table(spark, sf_dir, "orders")

    def prof(col, fmt=None):
        c = F.col(col)
        mn = F.min(c)
        mx = F.max(c)
        if fmt == "ts":
            mn, mx = (
                F.date_format(mn, "yyyy-MM-dd HH:mm:ss"),
                F.date_format(mx, "yyyy-MM-dd HH:mm:ss"),
            )
        elif fmt == "dec":
            mn, mx = (
                mn.cast("decimal(18,2)").cast("string"),
                mx.cast("decimal(18,2)").cast("string"),
            )
        else:
            mn, mx = mn.cast("string"), mx.cast("string")
        return o.agg(
            F.lit(col).alias("col_name"),
            F.countDistinct(c).alias("n_distinct"),
            (F.count("*") - F.count(c)).alias("n_nulls"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        )

    parts = [
        prof("o_custkey"),
        prof("o_orderdate", "ts"),
        prof("o_orderpriority"),
        prof("o_orderstatus"),
        prof("o_totalprice", "dec"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


# ---------------------------------------------------------------------------
# q200 — calendar-spine gap detection (missing hourly buckets)
# ---------------------------------------------------------------------------


@query(
    "q200_time_gap_detection",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events),
    spine AS (
      SELECT t.h, e.event_type
      FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
            FROM bounds) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events) e),
    present AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, event_type FROM events)
    SELECT s.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_missing_hours,
           strftime(MIN(s.h), '%Y-%m-%d %H:%M:%S') AS first_gap
    FROM spine s LEFT JOIN present p
      ON p.h = s.h AND p.event_type = s.event_type
    WHERE p.h IS NULL
    GROUP BY s.event_type
    ORDER BY s.event_type
    """,
)
def q200_time_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap detection: hours with NO events per event type
    between the corpus bounds — the monitoring query behind data-delivery
    SLAs (a missing bucket means a dead producer, not zero activity).
    ONE events scan: the distinct (hour, type) pre-aggregate
    localCheckpoints, and the bounds and type list both derive from it
    (``date_trunc`` is monotone, so min/max commute with it — the
    bounds are identical to aggregating raw ``ts``; bare, each derived
    frame re-scanned events, 3 scans measured). The spine generates
    from the 1-row bounds via ``sequence`` + explode (|hours|·|types|
    rows — bounded by wall-clock time, never by data volume), and
    the gap is a broadcast anti-join (the spine side is small by
    construction). First-gap timestamps format explicitly for
    cross-engine stability."""
    ev = load_table(spark, sf_dir, "events")
    present = (
        ev.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .localCheckpoint(eager=True)  # read 3x: bounds + types + anti-join
    )
    bounds = present.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
        .crossJoin(present.select("event_type").distinct())
    )
    return (
        spine.join(present, ["h", "event_type"], "left_anti")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_missing_hours"),
            F.date_format(F.min("h"), "yyyy-MM-dd HH:mm:ss").alias("first_gap"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q201 — per-dimension embedding statistics (feature standardization prep)
# ---------------------------------------------------------------------------


@query(
    "q201_embedding_dim_stats",
    oracle="""
    WITH flat AS (
      SELECT i.i AS dim,
             CAST(floor(CAST(embedding[i.i] AS DOUBLE) * 1e6) AS BIGINT)
               AS micros
      FROM embeddings,
           (SELECT unnest(generate_series(1, 64)) AS i) i),
    agg AS (
      SELECT dim, COUNT(*) AS n, SUM(micros) AS s,
             SUM(micros * micros) AS s2,
             MIN(micros) AS mn, MAX(micros) AS mx
      FROM flat GROUP BY dim)
    SELECT CAST(dim AS INT) AS dim,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 9) AS mean,
           ROUND(sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) / 1e6, 9)
             AS std,
           ROUND(CAST(mn AS DOUBLE) / 1e6, 6) AS min_value,
           ROUND(CAST(mx AS DOUBLE) / 1e6, 6) AS max_value
    FROM agg ORDER BY dim
    """,
)
def q201_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std/min/max over the embedding column — the
    statistics a feature-standardization (z-score / min-max) stage
    trains, computed with the integer-MICROS discipline (float32 widened
    to double BEFORE scaling, sums as exact int64, one IEEE divide at
    the end — the r6 q167 lesson applied from the start). posexplode
    multiplies rows ×64 but stays narrow (no shuffle until the 64-group
    aggregate, which map-side combines to 64·P partials)."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1e6).cast("long").alias("micros"),
    )
    agg = flat.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("micros").alias("s"),
        F.sum(F.col("micros") * F.col("micros")).alias("s2"),
        F.min("micros").alias("mn"),
        F.max("micros").alias("mx"),
    )
    n, s, s2 = (
        F.col("n").cast("double"),
        F.col("s").cast("double"),
        F.col("s2").cast("double"),
    )
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        F.round(s / n / 1e6, 9).alias("mean"),
        F.round(F.sqrt((s2 - s * s / n) / n) / 1e6, 9).alias("std"),
        F.round(F.col("mn").cast("double") / 1e6, 6).alias("min_value"),
        F.round(F.col("mx").cast("double") / 1e6, 6).alias("max_value"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# q202 — declarative data-quality rules (CHECK-constraint violations)
# ---------------------------------------------------------------------------


@query(
    "q202_constraint_violations",
    oracle="""
    SELECT 'lineitem.discount_in_range' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(*) FILTER (NOT (l_discount BETWEEN 0 AND 1))
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.positive_price',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (NOT (l_extendedprice > 0)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.quantity_bounds',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (NOT (l_quantity BETWEEN 1 AND 50))
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders.status_domain',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P'))
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.total_nonneg',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (NOT (o_totalprice >= 0)) AS BIGINT)
    FROM orders
    ORDER BY rule
    """,
)
def q202_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative CHECK-constraint audit: each rule is a predicate over
    one table; the report is (rule, rows checked, violations) — the
    dbt-test / Deequ-style data-quality gate as a first-class query.
    Rules over the same table fuse into ONE scan each (conditional
    aggregates, map-side combined); NULL predicate results count as
    violations (NOT(NULL) is NULL → FILTER false on the pass side), the
    conservative reading an audit wants."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def rules(df, specs):
        aggs = [
            F.struct(
                F.lit(name).alias("rule"),
                F.count("*").alias("n_checked"),
                F.sum(F.when(passed, 0).otherwise(1)).alias("n_violations"),
            ).alias(f"_r{i}")  # rule names contain dots — unsafe as columns
            for i, (name, passed) in enumerate(specs)
        ]
        row = df.agg(*aggs)
        return row.select(
            F.explode(
                F.array(*[F.col(f"_r{i}") for i in range(len(specs))])
            ).alias("r")
        ).select("r.rule", "r.n_checked", "r.n_violations")

    li_rules = rules(
        li,
        [
            (
                "lineitem.discount_in_range",
                F.col("l_discount").between(0, 1),
            ),
            ("lineitem.positive_price", F.col("l_extendedprice") > 0),
            (
                "lineitem.quantity_bounds",
                F.col("l_quantity").between(1, 50),
            ),
        ],
    )
    o_rules = rules(
        o,
        [
            (
                "orders.status_domain",
                F.col("o_orderstatus").isin("F", "O", "P"),
            ),
            ("orders.total_nonneg", F.col("o_totalprice") >= 0),
        ],
    )
    return li_rules.unionByName(o_rules).orderBy("rule")


# ---------------------------------------------------------------------------
# q203 — text-normalization dedup impact
# ---------------------------------------------------------------------------


@query(
    "q203_normalization_impact",
    oracle="""
    WITH norm AS (
      SELECT doc_id, text,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS ntext
      FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_raw,
           CAST(COUNT(DISTINCT ntext) AS BIGINT) AS distinct_normalized,
           CAST(COUNT(DISTINCT text) - COUNT(DISTINCT ntext) AS BIGINT)
             AS collapsed_by_normalization
    FROM norm
    """,
)
def q203_normalization_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-normalization impact report: how many raw-distinct documents
    collapse under the canonical normalization (lowercase → strip
    non-alphanumerics → collapse whitespace → trim) — the measurement
    that decides whether normalization runs BEFORE exact dedup in a
    corpus pipeline (it dedups the near-misses md5 equality cannot see).
    One scan, two distinct aggregates; the normalization chain is plain
    regexp_replace on both engines (ASCII corpus — no Unicode-fold
    divergence to reconcile)."""
    d = load_table(spark, sf_dir, "documents")
    ntext = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return d.select("text", ntext.alias("ntext")).agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("distinct_raw"),
        F.countDistinct("ntext").alias("distinct_normalized"),
        (F.countDistinct("text") - F.countDistinct("ntext")).alias(
            "collapsed_by_normalization"
        ),
    )


# ---------------------------------------------------------------------------
# q204 — trailing 7-day distinct users (sliding distinct via contribution
# explode, not a windowed COUNT(DISTINCT) — which SQL windows cannot do)
# ---------------------------------------------------------------------------


@query(
    "q204_trailing_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM daily),
    contrib AS (
      SELECT t.tday, d.user_id
      FROM daily d,
           LATERAL (SELECT unnest(generate_series(d.day,
                           d.day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS tday) t),
    uniq AS (SELECT DISTINCT c.tday, c.user_id
             FROM contrib c JOIN days x ON x.day = c.tday)
    SELECT strftime(tday, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS users_7d
    FROM uniq GROUP BY tday ORDER BY tday
    """,
)
def q204_trailing_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — the DAU/WAU-style
    rolling-distinct metric. COUNT(DISTINCT) OVER a range frame is not
    expressible in SQL windows, and re-scanning per day is quadratic;
    instead each (day, user) activity EXPLODES to the ≤7 report days it
    contributes to (a constant-factor narrow blowup), dedups, and
    counts — one shuffle on the report-day key, linear at any scale.
    Report days restrict to days present in the data (join with the
    observed-day set) so both engines agree on the domain."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(
            F.sequence(
                "day",
                F.col("day") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("tday"),
        "user_id",
    )
    uniq = (
        contrib.join(days, contrib.tday == days.day, "left_semi")
        .distinct()
    )
    return (
        uniq.groupBy("tday")
        .agg(F.count("*").alias("users_7d"))
        .select(
            F.date_format("tday", "yyyy-MM-dd").alias("day"),
            "users_7d",
            F.col("tday").alias("_ord"),
        )
        .orderBy("_ord")
        .drop("_ord")
    )


# ---------------------------------------------------------------------------
# q205 — order-to-ship latency distribution (portable epoch arithmetic)
# ---------------------------------------------------------------------------


@query(
    "q205_delivery_latency",
    oracle="""
    WITH per_order AS (
      SELECT l.l_orderkey,
             CAST(floor((epoch_us(MAX(l.l_shipdate))
                         - epoch_us(MIN(o.o_orderdate)))
                        / 86400000000.0) AS BIGINT) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey)
    SELECT CAST(floor(days / 7.0) AS INT) AS latency_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM per_order GROUP BY 1 ORDER BY 1
    """,
)
def q205_delivery_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-shipment latency distribution, bucketed by week.
    Elapsed days compute as floor of the MICROSECOND difference over
    86400e6 — the portable formulation (Spark's timestampdiff(DAY)
    floors elapsed time while DuckDB's date_diff counts boundary
    crossings; at microsecond granularity they coincide — the r5
    cross-engine rule). One fact shuffle on the order key; the orders
    side is joined pre-aggregated (its key is unique)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    per_order = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.max("l_shipdate").alias("_ship"),
            F.min("o_orderdate").alias("_ord"),
        )
        .select(
            "l_orderkey",
            F.floor(
                F.expr("timestampdiff(MICROSECOND, _ord, _ship)")
                / 86400000000.0
            ).alias("days"),
        )
    )
    return (
        per_order.groupBy(
            F.floor(F.col("days") / 7.0).cast("int").alias("latency_weeks")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min("days").alias("min_days"),
            F.max("days").alias("max_days"),
        )
        .orderBy("latency_weeks")
    )


# ---------------------------------------------------------------------------
# q206 — top-k per group WITH ties (RANK, not ROW_NUMBER)
# ---------------------------------------------------------------------------


@query(
    "q206_topk_with_ties",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rnk
      FROM orders) t
    WHERE rnk <= 3
    """,
)
def q206_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer WITH TIES — RANK semantics (every order
    tying the 3rd-highest price is kept), the ANSI ``FETCH FIRST k ROWS
    WITH TIES`` behavior q13's ROW_NUMBER variant cannot express. The
    output needs no tie-break column because ties are INCLUDED —
    deterministic by construction. Spark still plans WindowGroupLimit
    for RANK ≤ k (the pushdown covers rank-like functions), so groups
    keep a bounded heap rather than fully sorting."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


# ---------------------------------------------------------------------------
# q207 — new vs returning users per day (first-touch classification)
# ---------------------------------------------------------------------------


@query(
    "q207_new_vs_returning",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
    first_day AS (
      SELECT user_id, MIN(day) AS fday FROM daily GROUP BY user_id)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) FILTER (d.day = f.fday) AS BIGINT) AS n_new,
           CAST(COUNT(*) FILTER (d.day > f.fday) AS BIGINT) AS n_returning
    FROM daily d JOIN first_day f ON f.user_id = d.user_id
    GROUP BY d.day ORDER BY d.day
    """,
)
def q207_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning user split per day (first-touch cohorting) — the
    growth-accounting primitive. First-seen days aggregate once per user
    (map-side combined), re-join the daily activity on the user key, and
    classify by comparison — two shuffles total, both on user_id, which
    AQE coalesces into one exchange reuse where partitioning matches."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    first_day = daily.groupBy("user_id").agg(F.min("day").alias("fday"))
    return (
        daily.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("fday")).cast("long")).alias("n_new"),
            F.sum((F.col("day") > F.col("fday")).cast("long")).alias(
                "n_returning"
            ),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_new",
            "n_returning",
            F.col("day").alias("_ord"),
        )
        .orderBy("_ord")
        .drop("_ord")
    )


# ---------------------------------------------------------------------------
# q208 — C4-style quality-filter funnel (cumulative survivor counts)
# ---------------------------------------------------------------------------

_FUNNEL_STOPWORDS = ("a", "the", "of", "and")


@query(
    "q208_filter_funnel",
    oracle=f"""
    WITH per_tok AS (
      SELECT doc_id, w, COUNT(*) AS c FROM (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
        FROM documents) t
      GROUP BY doc_id, w),
    per_doc AS (
      SELECT doc_id, SUM(c) AS n, MAX(c) AS maxf,
             COALESCE(SUM(c) FILTER (w IN
               ({", ".join(repr(s) for s in _FUNNEL_STOPWORDS)})), 0) AS stop
      FROM per_tok GROUP BY doc_id),
    flags AS (
      SELECT n >= 20 AS b1,
             (n >= 20 AND maxf * 100 <= 15 * n) AS b2,
             (n >= 20 AND maxf * 100 <= 15 * n
              AND stop * 100 >= 3 * n) AS b3
      FROM per_doc)
    SELECT stage, n_surviving FROM (
      SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_surviving
      FROM flags
      UNION ALL
      SELECT '1_min_tokens', CAST(COUNT(*) FILTER (b1) AS BIGINT) FROM flags
      UNION ALL
      SELECT '2_max_repetition', CAST(COUNT(*) FILTER (b2) AS BIGINT)
      FROM flags
      UNION ALL
      SELECT '3_min_stopwords', CAST(COUNT(*) FILTER (b3) AS BIGINT)
      FROM flags) t
    ORDER BY stage
    """,
)
def q208_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style quality-filter funnel (Raffel et al. 2020's cleaning
    discipline): cumulative survivor counts through min-length,
    max-repetition, and min-stopword-ratio gates — the data-card numbers
    a corpus-cleaning run reports, and the order-sensitivity check
    (each stage counts docs passing ALL prior gates). Ratio thresholds
    compare as pure integers (maxf·100 ≤ 15·n, stop·100 ≥ 3·n) so no
    float boundary exists; per-doc stats derive from one token-count
    frame (explode → two-level aggregate, both map-side combined)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    per_tok = (
        toks.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.max("c").alias("maxf"),
        F.coalesce(
            F.sum(F.when(F.col("w").isin(*_FUNNEL_STOPWORDS), F.col("c"))),
            F.lit(0),
        ).alias("stop"),
    )
    b1 = F.col("n") >= 20
    b2 = b1 & (F.col("maxf") * 100 <= 15 * F.col("n"))
    b3 = b2 & (F.col("stop") * 100 >= 3 * F.col("n"))
    row = per_doc.agg(
        F.count("*").alias("s0"),
        F.sum(b1.cast("long")).alias("s1"),
        F.sum(b2.cast("long")).alias("s2"),
        F.sum(b3.cast("long")).alias("s3"),
    )
    stages = [
        ("0_input", "s0"),
        ("1_min_tokens", "s1"),
        ("2_max_repetition", "s2"),
        ("3_min_stopwords", "s3"),
    ]
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("stage"),
                        F.col(c).alias("n_surviving"),
                    )
                    for name, c in stages
                ]
            )
        ).alias("r")
    ).select("r.stage", "r.n_surviving").orderBy("stage")


# ---------------------------------------------------------------------------
# q209 — modularity of the LPA community partition
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from .graph.lpa import oracle_lpa_sql
    from .queries_graph import _EDGES_CTE

    base = oracle_lpa_sql(_EDGES_CTE.strip(), 3)
    body = base.rsplit("SELECT id, label FROM lab3", 1)[0]
    return (
        body
        + """,
    labs AS (SELECT id, label FROM lab3),
    mm AS (SELECT COUNT(*) AS m FROM e0),
    deg AS (SELECT u AS id, COUNT(*) AS d FROM sym GROUP BY u),
    dc AS (SELECT l.label, SUM(d.d) AS dsum
           FROM labs l JOIN deg d ON d.id = l.id GROUP BY l.label),
    ec AS (SELECT la.label, COUNT(*) AS ein
           FROM e0 JOIN labs la ON la.id = e0.src
                   JOIN labs lb ON lb.id = e0.dst
           WHERE la.label = lb.label GROUP BY la.label),
    num AS (SELECT COUNT(*) AS n_comm,
                   SUM(4 * (SELECT m FROM mm) * COALESCE(ec.ein, 0)
                       - dc.dsum * dc.dsum) AS numer
            FROM dc LEFT JOIN ec ON ec.label = dc.label)
    SELECT CAST(n_comm AS BIGINT) AS n_communities,
           CAST((SELECT m FROM mm) AS BIGINT) AS m_edges,
           ROUND(CAST(numer AS DOUBLE)
                 / (4.0 * (SELECT m FROM mm) * (SELECT m FROM mm)), 9)
             AS modularity
    FROM num
    """
    )


@query("q209_graph_modularity", oracle=_modularity_oracle())
def q209_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA community partition (q137's exact
    labels) — the partition-quality metric community detection is judged
    by. Q = Σ_c (e_c/m − (d_c/2m)²) computes as ONE integer numerator
    Σ_c (4·m·e_c − d_c²) over exact counts followed by a single IEEE
    divide (the q110/q133 bit-identical rule — a per-community float sum
    would be order-dependent). Within-community edge counts join the
    canonical src<dst edge list to the label map twice; degree sums ride
    the symmetrized incidence — all map-side-combined aggregates. The
    label map re-attaches via size-guarded broadcast (|V| rows): both
    edge-endpoint joins and the degree join go map-side, so the only
    shuffles left are the aggregates themselves."""
    from .graph.lpa import label_propagation
    from .plans.hints import broadcast_if_small
    from .queries_graph import _events_edges

    edges = (
        _events_edges(spark, sf_dir)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # read 4x: LPA + m + degrees + e_c
    )
    labels = label_propagation(edges, num_iterations=3)
    mrow = edges.agg(F.count("*").alias("m"))
    sym = (
        edges.select(F.col("src").alias("u"))
        .unionByName(edges.select(F.col("dst").alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    dc = (
        sym.join(broadcast_if_small(labels), labels.id == sym.u)
        .groupBy("label")
        .agg(F.sum("d").alias("dsum"))
    )
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("la"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("lb"))
    ec = (
        edges.join(broadcast_if_small(la), "src")
        .join(broadcast_if_small(lb), "dst")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").alias("ein"))
    )
    num = (
        dc.join(ec, "label", "left_outer")
        .crossJoin(F.broadcast(mrow))
        .agg(
            F.count("*").alias("n_communities"),
            F.first("m").alias("m_edges"),
            F.sum(
                4 * F.col("m") * F.coalesce(F.col("ein"), F.lit(0))
                - F.col("dsum") * F.col("dsum")
            ).alias("numer"),
        )
    )
    return num.select(
        "n_communities",
        "m_edges",
        F.round(
            F.col("numer").cast("double")
            / (4.0 * F.col("m_edges") * F.col("m_edges")),
            9,
        ).alias("modularity"),
    )


# ---------------------------------------------------------------------------
# q210 — BM25 ranking for a fixed query (search-scoring primitive)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("table", "value", "fast")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


@query(
    "q210_bm25_ranking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
      FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, w AS term, COUNT(*) AS tf FROM toks
      WHERE w IN ({", ".join(repr(t) for t in _BM25_TERMS)})
      GROUP BY doc_id, w),
    dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    comp AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln(1.0 + (CAST(s.n AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                        / (CAST(d.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
               / (CAST(tf.tf AS DOUBLE)
                  + {_BM25_K1} * (1.0 - {_BM25_B}
                     + {_BM25_B} * CAST(l.dl AS DOUBLE) / s.avgdl)), 6)
               AS DECIMAL(18,6)) AS c
      FROM tf JOIN dfreq d ON d.term = tf.term
              JOIN dl l ON l.doc_id = tf.doc_id
              CROSS JOIN stats s)
    SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS bm25
    FROM comp GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPN}
    """,
)
def q210_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking (Robertson-Walker-Jones) for a fixed query —
    the lexical-search scoring primitive (k1={1.2}, b={0.75}). Per-term
    components compute as ONE identical double expression tree on both
    engines, round to the 6-dp grid (the post-``ln`` discipline — ln is
    the one non-correctly-rounded function in the chain), sum as
    DECIMAL(18,6) (order-independent), and the top-{20} cut compiles to
    TakeOrderedAndProject. ONE corpus scan and ONE token-stream pass:
    doc length and the per-term tf for the fixed query terms are
    conditional counts of the SAME per-doc groupBy, which then
    localCheckpoints (|docs| rows of ints — vs the separate dl/tf/stats
    frames, which measured 4 corpus scans and two exploded-token
    passes, plus a tf⋈dl shuffle this fusion deletes outright: tf rows
    carry their dl). Term stats (df) and corpus stats (N, avgdl) are
    3-row / 1-row broadcast frames — the posting list unpacks via
    explode + ``tf > 0`` (the inverted-index shape: |postings|, not
    |corpus|·|terms|)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("w")
    )
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("dl"),
            *[
                F.count(F.when(F.col("w") == t, True)).alias(f"_tf_{i}")
                for i, t in enumerate(_BM25_TERMS)
            ],
        )
        .localCheckpoint(eager=True)  # |docs| int rows; read 2x (stats + tf)
    )
    stats = per_doc.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.col(f"_tf_{i}").alias("tf"),
                    )
                    for i, t in enumerate(_BM25_TERMS)
                ]
            )
        ).alias("r"),
    ).select("doc_id", "dl", "r.term", "r.tf").filter(F.col("tf") > 0)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    tfd = F.col("tf").cast("double")
    idf = F.log(
        1.0
        + (F.col("n").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    frac = (tfd * (_BM25_K1 + 1.0)) / (
        tfd
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )
    comp = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * frac, 6).cast("decimal(18,6)").alias("c"),
        )
    )
    return (
        comp.groupBy("doc_id")
        .agg(F.sum("c").cast("double").alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPN)
    )


# ---------------------------------------------------------------------------
# q211 — streaming Python DataSource driven as a query (Spark 4
# SimpleDataSourceStreamReader), byte-exact SQL replay oracle
# ---------------------------------------------------------------------------

_STREAM_SYNTH_N = 240
_STREAM_SYNTH_BATCH = 50


def _stream_synth_oracle() -> str:
    from .queries_r6c import _SYNTH_WORDS_SQL, _synth_rng_sql

    return f"""
    WITH ids AS (SELECT unnest(range(0, {_STREAM_SYNTH_N})) AS i),
    docs AS (
      SELECT i AS doc_id,
             array_to_string(
               list_transform(
                 range(0, 20 + {_synth_rng_sql("'len'")} % 80),
                 j -> ({_SYNTH_WORDS_SQL})[
                        CAST({_synth_rng_sql("'w' || CAST(j AS VARCHAR)")}
                             % 20 AS INT) + 1]),
               ' ') AS text,
             (['en','de','es','fr'])[
               CAST({_synth_rng_sql("'lang'")} % 4 AS INT) + 1] AS lang
      FROM ids)
    SELECT doc_id, text, lang FROM docs
    """


@query("q211_python_stream_source", oracle=_stream_synth_oracle())
def q211_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 STREAMING Python data source
    (``SimpleDataSourceStreamReader``) driven end-to-end as a query: the
    synthetic corpus streams in {50}-row microbatches (offsets are plain
    doc_id cursors; replays regenerate rows from (seed, doc_id) — an
    exactly-once source with zero stored state), drains into a memory
    sink, and every byte hash-checks against the same pure-SQL
    regeneration that certifies the batch face (q181). The drain loop
    polls the sink to the known row count with a loud timeout — the
    custom-source equivalent of availableNow, which Python stream
    readers do not implement."""
    import time
    import uuid

    from .queries_r6c import _SYNTH_SEED
    from .sources.pydatasource import register_synth_docs

    register_synth_docs(spark)
    stream = (
        spark.readStream.format("synth_docs")
        .option("n", _STREAM_SYNTH_N)
        .option("seed", _SYNTH_SEED)
        .option("rows_per_batch", _STREAM_SYNTH_BATCH)
        .load()
    )
    name = f"q211_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while spark.table(name).count() < _STREAM_SYNTH_N:
            if time.monotonic() > deadline:
                raise RuntimeError(
                    f"q211: stream did not deliver {_STREAM_SYNTH_N} rows "
                    "within 120 s — source or sink is wedged."
                )
            time.sleep(0.2)
    finally:
        q.stop()
    return spark.table(name).select("doc_id", "text", "lang")


# ---------------------------------------------------------------------------
# q212 — degree distribution + power-law slope of the co-occurrence graph
# ---------------------------------------------------------------------------


@query(
    "q212_degree_distribution",
    oracle="""
    WITH b AS (SELECT DISTINCT user_id AS entity,
                      date_trunc('hour', ts) AS bucket, event_type
               FROM events),
    ew AS (SELECT a.entity AS src, b2.entity AS dst
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2
           HAVING COUNT(*) >= 5),
    sym AS (SELECT src AS u, dst AS v FROM ew UNION SELECT dst, src FROM ew),
    deg AS (SELECT u, COUNT(*) AS d FROM sym GROUP BY u),
    hist AS (SELECT d, COUNT(*) AS n_nodes FROM deg GROUP BY d),
    pts AS (
      SELECT CAST(ROUND(ln(CAST(d AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(ln(CAST(n_nodes AS DOUBLE)), 6) AS DECIMAL(18,6))
               AS y
      FROM hist),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM pts)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM ew) AS BIGINT) AS n_edges,
           CAST((SELECT MAX(d) FROM deg) AS INT) AS max_degree,
           CAST((SELECT COUNT(*) FROM hist) AS BIGINT) AS n_distinct_degrees,
           ROUND((m.n * m.sxy - m.sx * m.sy)
                 / (m.n * m.sxx - m.sx * m.sx), 9) AS powerlaw_slope
    FROM m
    """,
)
def q212_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution census of the sparsified co-occurrence graph
    with a log-log OLS power-law slope — the scale-free-ness diagnostic
    that predicts hub skew (and therefore whether the degree² pair
    builders need their caps — the number behind the repo's hub-proofing
    discipline). The OLS runs over the DEGREE HISTOGRAM (|distinct
    degrees| rows — bounded by max degree, not node count); ln outputs
    land on the 6-dp grid and become DECIMAL before the moment sums
    (the q157 Zipf contract), final slope on the 9-dp grid."""
    from .graph import cooccurrence_edges

    ev = load_table(spark, sf_dir, "events")
    e = (
        cooccurrence_edges(ev, "user_id", "ts", "hour", ("event_type",))
        .filter(F.col("weight") >= 5)
        .select("src", "dst")
        .localCheckpoint(eager=True)  # read twice: edge count + degrees
    )
    deg = (
        e.select(F.col("src").alias("u"))
        .unionByName(e.select(F.col("dst").alias("u")))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("n_nodes")).localCheckpoint(
        eager=True
    )  # read twice: stats + OLS points
    dec = "decimal(18,6)"
    pts = hist.select(
        F.round(F.log(F.col("d").cast("double")), 6).cast(dec).alias("x"),
        F.round(F.log(F.col("n_nodes").cast("double")), 6).cast(dec).alias("y"),
    )
    m = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    stats = hist.agg(
        # COALESCE: on an empty (fully sparsified-away) graph the oracle's
        # COUNT(*) is 0 while SUM over zero rows is NULL — sf0.001 case.
        F.coalesce(F.sum("n_nodes"), F.lit(0)).alias("n_nodes"),
        F.max("d").cast("int").alias("max_degree"),
        F.count("*").alias("n_distinct_degrees"),
    )
    ecnt = e.agg(F.count("*").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(m))
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            "n_distinct_degrees",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                9,
            ).alias("powerlaw_slope"),
        )
    )
