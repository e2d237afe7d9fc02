"""Round-6 analytics / pipeline extensions: Benford digit-law screening,
KMV distinct sketch with a FULLY exact oracle, Zipf rank-frequency slope,
Rabin-Karp polynomial fingerprints, incremental aggregate maintenance
(IVM), and first-touch session attribution.

Float discipline (the q85/q134 contracts): integer/DECIMAL accumulation
everywhere a sum crosses partitions; `ln` rounded to the 6-dp grid on both
sides before exact decimal summation; ratios emitted as identically
parenthesized IEEE expressions over engine-identical operands; Benford's
expected shares inlined as repr'd Python literals so both engines compare
against the same constants.

The reference has no analytics surface beyond two-table SQL
(/root/reference/notebooks/3_sql.ipynb); these extend the north-star set.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum
from .queries import query

# ---------------------------------------------------------------------------
# q156 — Benford first-digit law over order totals
# ---------------------------------------------------------------------------

_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_CASE_SQL = " ".join(
    f"WHEN {d} THEN CAST({_BENFORD[d]!r} AS DOUBLE)" for d in range(1, 10)
)


@query(
    "q156_benford_digits",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                  AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit
      FROM orders),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit,
           CAST(c.n AS BIGINT) AS n_orders,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
             - (CASE c.digit {_BENFORD_CASE_SQL} END) AS deviation
    FROM c, t
    ORDER BY c.digit
    """,
)
def q156_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit census over order totals — the classic
    fraud/fabrication screen (synthetic data rarely follows the law; the
    deviation column IS the signal). The first significant digit comes
    from integer-cents STRING formatting (bigint→varchar is byte-identical
    in both engines), never from log10 float arithmetic whose boundary
    behavior at powers of ten differs. Expected shares are repr'd Python
    literals inlined into BOTH engines; share and deviation are one
    division and one subtraction over identical operands. One aggregate
    pass; the 9-row digit frame re-attaches the scalar total by forced
    broadcast."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    d = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    expected = F.element_at(
        F.create_map(
            *[
                x
                for dd in range(1, 10)
                for x in (F.lit(dd), F.lit(_BENFORD[dd]))
            ]
        ),
        F.col("digit"),
    )
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("long").alias("n_orders"),
            share.alias("share"),
            (share - expected).alias("deviation"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# q157 — Zipf rank-frequency slope over the corpus vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPN = 100

_TOKS_SQL = (
    "list_filter(string_split(regexp_replace(regexp_replace("
    "lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'), ' '),"
    " x -> x != '')"
)


@query(
    "q157_zipf_slope",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKS_SQL}) AS tok FROM documents),
    counts AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    top AS (
      SELECT tok, cnt FROM counts
      ORDER BY cnt DESC, tok LIMIT {_ZIPF_TOPN}),
    ranked AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
      FROM top),
    q AS (
      SELECT CAST(ROUND(ln(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
      FROM ranked),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM q)
    SELECT CAST(n AS BIGINT) AS n_words,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS zipf_slope
    FROM m
    """,
)
def q157_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the top-{100} vocabulary: OLS slope of
    ln(frequency) against ln(rank) — the corpus-health diagnostic (natural
    text ≈ −1; templated/boilerplate corpora diverge). The vocabulary
    rollup is the only corpus-sized stage (map-side combined); the top-k
    cut compiles to TakeOrderedAndProject (never a global sort), and the
    rank window runs over exactly {100} surviving rows. `ln` outputs land
    on the 6-dp grid (the q134 PMI contract) and become DECIMAL BEFORE
    the moment sums, so every cross-partition accumulation is exact; the
    final slope is identically parenthesized IEEE arithmetic on the
    9-dp grid."""
    from .functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(tokens("text").alias("_toks")).select(
        F.explode("_toks").alias("tok")
    )
    counts = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), "tok").limit(_ZIPF_TOPN)
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "tok"))
        .alias("rank"),
    )
    dec = "decimal(18,6)"
    q = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 6).cast(dec).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6).cast(dec).alias("y"),
    )
    m = q.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_words"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            9,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# q158 — KMV (k-minimum-values) distinct sketch, fully exact oracle
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SCALE = float(1 << 60)  # hash domain size (15 hex chars)


@query(
    "q158_kmv_distinct",
    oracle=f"""
    WITH c AS (SELECT DISTINCT o_custkey FROM orders),
    h AS (
      SELECT DISTINCT CAST('0x' || substr(md5('c:' || CAST(o_custkey AS VARCHAR)),
                           1, 15) AS BIGINT) AS hv
      FROM c),
    kmin AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
    stats AS (
      SELECT (SELECT COUNT(*) FROM c) AS exact_customers,
             (SELECT MAX(hv) FROM kmin) AS kth_hash)
    SELECT CAST(exact_customers AS BIGINT) AS exact_customers,
           kth_hash,
           CAST({(_KMV_K - 1) * _KMV_SCALE!r} AS DOUBLE)
             / CAST(kth_hash AS DOUBLE) AS kmv_estimate,
           (ABS(CAST({(_KMV_K - 1) * _KMV_SCALE!r} AS DOUBLE)
                  / CAST(kth_hash AS DOUBLE)
                - CAST(exact_customers AS DOUBLE))
            <= 0.25 * CAST(exact_customers AS DOUBLE)) AS within_bound
    FROM stats
    """,
)
def q158_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over ordering
    customers — the mergeable bottom-k companion to q81's HLL, with a
    STRONGER contract: because the hash is portable md5 arithmetic, the
    estimate itself (not just its error bound) is bit-reproducible and
    oracle-checked. Estimate = (k−1)·D/h_k where h_k is the k-th smallest
    distinct hash over a domain of size D: the bottom-k cut compiles to
    TakeOrderedAndProject over the distinct-hash aggregate (mergeable
    state — at 100 TB each partition keeps its own bottom-k and the
    driver merges k·P values), and the theoretical RSD 1/√(k−2) ≈ 6.3%
    sits 4× inside the pinned 25% bound. ``exact_customers`` counts
    DISTINCT o_custkey values (not distinct 15-hex hash prefixes — a
    prefix collision would silently merge two customers; probability
    ~n²/2^61, but 'exact' should mean exact); the sketch side still
    dedups on the hash value, as KMV requires."""
    o = load_table(spark, sf_dir, "orders")
    cust = (
        o.select("o_custkey").distinct().localCheckpoint(eager=True)
    )  # read twice: exact count + hash bottom-k
    h = cust.select(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("hv")
    ).distinct()
    kth = (
        h.orderBy("hv")
        .limit(_KMV_K)
        .agg(F.max("hv").alias("kth_hash"))
    )
    est = F.lit((_KMV_K - 1) * _KMV_SCALE) / F.col("kth_hash").cast("double")
    exact_d = F.col("exact_customers").cast("double")
    return (
        cust.agg(F.count("*").alias("exact_customers"))
        .crossJoin(F.broadcast(kth))
        .select(
            F.col("exact_customers").cast("long").alias("exact_customers"),
            "kth_hash",
            est.alias("kmv_estimate"),
            (F.abs(est - exact_d) <= 0.25 * exact_d).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# q159 — incremental aggregate maintenance (IVM) vs full recompute
# ---------------------------------------------------------------------------

_IVM_CUTOFF = "2024-01-20 00:00:00"


@query(
    "q159_incremental_agg",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {oracle_dsum('value')} AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q159_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the BASE aggregate (events before the
    cutoff) merged with the DELTA aggregate (events after) must equal the
    full recompute the oracle runs — the contract behind maintaining a
    100 TB rollup from daily increments instead of rescanning history.
    Merge algebra per group: counts add, sums add IN DECIMAL (two partial
    decimal sums added exactly equal the one-pass decimal sum — double
    partials would NOT re-associate), min/max combine via least/greatest
    with null passthrough for groups absent from one side (full-outer
    merge join on the group key)."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(28,6)"

    def agg_side(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum(F.col("value").cast(dec)).alias(f"s_{tag}"),
            F.min("value").alias(f"mn_{tag}"),
            F.max("value").alias(f"mx_{tag}"),
        )

    base = agg_side(ev.filter(F.col("ts") < _IVM_CUTOFF), "b")
    delta = agg_side(ev.filter(F.col("ts") >= _IVM_CUTOFF), "d")
    z = F.lit(0)
    zd = F.lit(0).cast(dec)
    return (
        base.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n_b", z) + F.coalesce("n_d", z))
            .cast("long")
            .alias("n_events"),
            (F.coalesce("s_b", zd) + F.coalesce("s_d", zd))
            .cast("double")
            .alias("total_value"),
            F.least("mn_b", "mn_d").alias("min_value"),
            F.greatest("mx_b", "mx_d").alias("max_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q160 — Rabin-Karp polynomial fingerprints (rolling-hash dedup)
# ---------------------------------------------------------------------------

_RK_BASE = 257
_RK_MOD = 2_147_483_647  # 2^31 − 1 (Mersenne); acc·base + c < 2^40 fits i64


@query(
    "q160_rolling_hash_groups",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(trim(text)),
                 '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g') AS nt
      FROM documents),
    hashed AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(nt, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * {_RK_BASE} + c) % {_RK_MOD}) AS rk_hash
      FROM norm)
    SELECT rk_hash,
           MIN(doc_id) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM hashed
    GROUP BY rk_hash
    """,
)
def q160_rolling_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by Rabin-Karp polynomial rolling hash
    (acc·257 + byte mod 2³¹−1 over the normalized text) — the q24 exact
    dedup shape with an ARITHMETIC fingerprint instead of md5: the
    polynomial form is what substring/window fingerprint schemes (winnowing,
    content-defined chunking) extend, so certifying the fold certifies
    the primitive. The per-character fold is a single JVM higher-order
    `aggregate` over a STAGED char array (own projection — the
    lambda-inlining trap documented at dedup/ngram.py would re-run the
    normalization regex per character); only the 8-byte hash shuffles,
    never text."""
    from .functions.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", F.split(normalize_text("text"), "").alias("_chars")
    ).localCheckpoint(eager=True)
    code = lambda c: F.ascii(c).cast("long")  # noqa: E731
    rk = F.aggregate(
        "_chars",
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _RK_BASE + code(c)) % _RK_MOD,
    )
    return (
        staged.select("doc_id", rk.alias("rk_hash"))
        .groupBy("rk_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# q161 — first-touch session attribution
# ---------------------------------------------------------------------------

_ATTR_GAP_MIN = 30


@query(
    "q161_first_touch_attribution",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('microsecond', LAG(ts) OVER w, ts)
                     > {_ATTR_GAP_MIN * 60 * 1_000_000}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e),
    f AS (
      SELECT user_id, event_id, event_type, session_id,
             FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id, session_id ORDER BY ts, event_id)
               AS first_touch
      FROM s)
    SELECT first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM f
    WHERE event_type = 'purchase'
    GROUP BY first_touch
    ORDER BY first_touch
    """,
)
def q161_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: every purchase credits the event type that
    OPENED its session (30-min inactivity gap — the q77 sessionization
    composed with a per-session first_value). All three windows partition
    by user (and session) — parallelism is the user count, no global
    window — with the (ts, event_id) total order making session ids and
    first events deterministic under timestamp ties. The report is
    |event types|² at most, independent of event volume."""
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _ATTR_GAP_MIN * 60 * 1_000_000
    # MICROSECOND timestamp_diff: exact on TIMESTAMP_NTZ and the one
    # granularity where Spark's elapsed-floor and DuckDB's
    # boundary-crossing semantics coincide (the q77 contract)
    is_new = F.when(
        F.lag("ts").over(wu).isNull()
        | (
            F.timestamp_diff("MICROSECOND", F.lag("ts").over(wu), F.col("ts"))
            > gap_us
        ),
        1,
    ).otherwise(0)
    s = ev.select("user_id", "event_id", "ts", "event_type", is_new.alias("is_new"))
    s = s.withColumn(
        "session_id",
        F.sum("is_new").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    f = s.withColumn("first_touch", F.first("event_type").over(ws))
    return (
        f.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("first_touch")
    )
