"""Warehouse-modeling / quality-signal queries (round 4).

SCD2 validity intervals (the CDC-to-dimension transform that pairs with
`operators/cdc.py`), per-document unigram entropy (the information-density
quality filter next to the Gopher/C4 repetition set), and deterministic
per-group argmax via struct-max (the max_by shape with an explicit,
engine-stable tie-break).

The reference has no windowed modeling surface (SURVEY §2.5: it imports
Window and never uses it); these extend the declared north-star set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q105 — SCD2 validity intervals from an event/CDC history
# ---------------------------------------------------------------------------

@query(
    "q105_scd2_intervals",
    oracle="""
    SELECT user_id, event_type AS attr_value, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WHERE user_id % 97 = 0
    ORDER BY user_id, valid_from, event_id
    """,
)
def q105_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a per-key change history into
    [valid_from, valid_to) intervals with an is_current flag — the standard
    CDC→dimension transform (pairs with q74's latest-row compaction: that
    keeps the head, this keeps the full versioned timeline). One window per
    key, ordered by (ts, event_id) so same-timestamp changes have a total
    order; the open interval's NULL valid_to marks the current row. At
    100 TB this is a single shuffle on the key — and the key partitioning
    is reusable by every downstream as-of join (q50) against the dimension."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 97 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
            "event_id",
        )
        .orderBy("user_id", "valid_from", "event_id")
        .drop("event_id")
    )


# ---------------------------------------------------------------------------
# q106 — per-document unigram entropy (information-density quality signal)
# ---------------------------------------------------------------------------

_NORM = (
    "regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')"
)
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x != '')"


@query(
    "q106_token_entropy",
    oracle=f"""
    SELECT doc_id,
           ROUND(COALESCE(-SUM(
               (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)
           ), 0.0), 6) AS entropy,
           CAST(MAX(n) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, token, COUNT(*) AS c,
             SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS n
      FROM (
        SELECT doc_id, unnest({_TOKS}) AS token FROM documents
      )
      GROUP BY doc_id, token)
    GROUP BY doc_id
    """,
)
def q106_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram (Shannon) entropy per document — the information-density
    quality filter: repeated-token spam scores near 0, natural text near
    log(vocab). Plan: one explode before the shuffle (only (doc_id, token)
    moves), one count aggregation, one per-doc window for the total, one
    final per-doc sum — all map-side-combinable. The single ``ln`` is the
    one non-correctly-rounded float op in the engine's oracle surface, so
    the output rounds to 6 decimals on BOTH sides (libm vs Math.log can
    differ in the last ulp; a 1e-6 grid makes the compare engine-stable)."""
    from .functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    counts = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        counts.withColumn("n", n)
        .groupBy("doc_id")
        .agg(
            F.round(
                F.coalesce(-F.sum(p * F.log(p)), F.lit(0.0)), 6
            ).alias("entropy"),
            F.max("n").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# q107 — deterministic per-group argmax via struct max
# ---------------------------------------------------------------------------

@query(
    "q107_top_order_per_nation",
    oracle="""
    SELECT c.c_nationkey,
           MAX({'p': CAST(o.o_totalprice AS DOUBLE), 'k': o.o_orderkey}).p
             AS top_price,
           MAX({'p': CAST(o.o_totalprice AS DOUBLE), 'k': o.o_orderkey}).k
             AS top_orderkey
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q107_top_order_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation argmax (the max_by shape) with a DETERMINISTIC tie-break:
    MAX over struct(price, orderkey) orders lexicographically in both
    engines, so equal prices resolve by key instead of partition order —
    the correctness trap in naive max_by at scale, where ties ARE hit.
    One broadcast join (customer nationkey map) + one aggregation whose
    state is a single struct per group — constant memory, map-side
    combinable, no window, no sort of the fact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    top = F.max(
        F.struct(
            F.col("o_totalprice").cast("double").alias("p"),
            F.col("o_orderkey").alias("k"),
        )
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(top.alias("t"))
        .select(
            "c_nationkey",
            F.col("t.p").alias("top_price"),
            F.col("t.k").alias("top_orderkey"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# q108 — Delta-style MERGE (upsert + delete) applied to a snapshot
# ---------------------------------------------------------------------------

@query(
    "q108_merge_upsert",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer),
    src AS (
      SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal,
             FALSE AS del
      FROM tgt WHERE c_custkey % 5 = 0 AND c_custkey % 131 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW_' || CAST(c_custkey AS VARCHAR), 0.0,
             FALSE
      FROM tgt WHERE c_custkey % 97 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_acctbal, TRUE
      FROM tgt WHERE c_custkey % 131 = 0)
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
                ELSE t.c_name END AS c_name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal
    FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    WHERE NOT (s.c_custkey IS NOT NULL AND s.del)
    """,
)
def q108_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE: apply a CDC batch (updates, inserts, deletes) to
    the customer snapshot in ONE full-outer join — the operator that closes
    the CDC trio (q74 compacts the log, this applies it, q84 audits the
    result). The source batch is derived deterministically from the target
    (every 5th key updated +100, every 97th key re-inserted under a new id,
    every 131st deleted) so both engines construct the identical merge
    input. Source payload wins outright on match — including NULLs — which
    is why the merge uses branch selection, not COALESCE, per column."""
    from .operators.cdc import merge_upsert

    # The snapshot feeds four consumers (merge target + the three derived
    # CDC branches); bare, each re-scans customer with identical columns
    # (replay audit: 4 opens, 1 legitimate). customer is a bounded dim, so
    # checkpoint once — unlike q84, whose 3× pruned re-scan of the events
    # FACT is the documented cheaper trade vs materializing it.
    c = (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .localCheckpoint(eager=True)
    )
    k = F.col("c_custkey")
    upd = (
        c.filter((k % 5 == 0) & (k % 131 != 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("_deleted", F.lit(False))
    )
    ins = c.filter(k % 97 == 0).select(
        (k + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW_"), k.cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit(False).alias("_deleted"),
    )
    dele = c.filter(k % 131 == 0).withColumn("_deleted", F.lit(True))
    src = upd.unionByName(ins).unionByName(dele)
    return merge_upsert(c, src, ["c_custkey"], delete_col="_deleted")


# ---------------------------------------------------------------------------
# q112 — time-series gap filling with forward fill (LOCF)
# ---------------------------------------------------------------------------

@query(
    "q112_gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE user_id % 83 = 0
      GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1),
    spine AS (
      SELECT b.user_id, CAST(u.d AS DATE) AS day
      FROM bounds b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS u(d)),
    joined AS (
      SELECT s.user_id, s.day, d.n,
             CASE WHEN d.n IS NULL THEN 0 ELSE 1 END AS observed
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           LAST_VALUE(n IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled,
           observed
    FROM joined
    ORDER BY user_id, day
    """,
)
def q112_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: build the complete per-user day spine
    (sequence + explode between each user's first and last active day),
    left-join the observed daily counts, and forward-fill gaps with
    last-observation-carried-forward — the TimescaleDB ``locf``/gap-fill
    contract. The spine generates inside each user's row (no cross join
    against a global calendar — at 100 TB a global spine × users explodes;
    per-user bounds keep it |active days| total), and the fill is one
    ``last_value(ignoreNulls)`` window over the same user partitioning the
    join already established."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 83 == 0)
    daily = (
        e.groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count("*").alias("n"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left").withColumn(
        "observed", F.when(F.col("n").isNull(), F.lit(0)).otherwise(F.lit(1))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.select(
            "user_id",
            F.col("day").cast("string").alias("day"),  # DATE renders engine-
            F.last("n", ignorenulls=True).over(w).alias("n_filled"),  # specific; compare as text
            "observed",
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# q113 — relative-rank windows (percent_rank / cume_dist)
# ---------------------------------------------------------------------------

@query(
    "q113_relative_ranks",
    oracle="""
    SELECT c_custkey,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 9)
             AS pr,
           ROUND(CUME_DIST() OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey), 9)
             AS cd
    FROM customer WHERE c_custkey % 11 = 0
    """,
)
def q113_relative_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — the relative-standing windows completing
    the ranking family (row_number q13, rank/dense_rank q35, ntile q61).
    The order key includes c_custkey so ties are totally ordered and both
    engines compute identical ranks; the division output rounds to 9
    decimals (rank ratios are exact small-integer divisions, but a fixed
    grid documents the comparison contract)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 11 == 0)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )


# ---------------------------------------------------------------------------
# q114 — sweep-line interval concurrency
# ---------------------------------------------------------------------------

@query(
    "q114_max_concurrency",
    oracle="""
    WITH deltas AS (
      SELECT ts AS t, 1 AS delta FROM events WHERE user_id % 7 = 0
      UNION ALL
      SELECT ts + INTERVAL 5 MINUTE, -1 FROM events WHERE user_id % 7 = 0),
    running AS (
      SELECT SUM(delta) OVER (ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
      FROM deltas)
    SELECT CAST(MAX(live) AS BIGINT) AS max_concurrent,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
    FROM running
    """,
)
def q114_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: treat each event as a 5-minute
    activity interval and find the peak number of simultaneously-live
    intervals — the classic capacity/concurrency operator Spark has no
    built-in for, expressed as ±1 boundary deltas + one running-sum window.
    Ordering (t, delta) closes intervals before opening at the same instant
    (half-open semantics), and the MAX over prefix sums is invariant to
    tie permutation within equal (t, delta) runs, so the single-row answer
    is engine-exact. The one unpartitioned window is the documented serial
    point — the partitioned production variant (per tenant/user) shards
    the same plan by key."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    starts = e.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = e.select(
        (F.col("ts") + F.expr("interval 5 minutes")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends)
    w = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running = deltas.select(F.sum("delta").over(w).alias("live"))
    return running.agg(
        F.max("live").alias("max_concurrent"),
        (F.count("*") / 2).cast("long").alias("n_intervals"),
    )


# ---------------------------------------------------------------------------
# q115 — exact weighted median (cumulative-weight crossing)
# ---------------------------------------------------------------------------

@query(
    "q115_weighted_median",
    oracle="""
    WITH ordered AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DOUBLE) AS price,
             SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
               PARTITION BY l_returnflag) AS totw
      FROM lineitem)
    SELECT l_returnflag,
           MIN(price) AS weighted_median,
           CAST(MAX(totw) AS DOUBLE) AS total_weight
    FROM ordered
    WHERE 2 * cumw >= totw
    GROUP BY l_returnflag
    """,
)
def q115_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: the smallest price whose cumulative quantity
    weight reaches half the group's total — the weighted-percentile
    operator (corpus rebalancing, fair-share cutoffs) Spark only ships in
    approximate form. One windowed pass: cumulative DECIMAL weight over a
    TOTALLY ordered frame (price, orderkey, linenumber) plus the partition
    total, then the crossing row via `2·cumw ≥ totw` (exact decimal
    compare — no division, no float). Same single shuffle as any grouped
    window; the aggregation state after the filter is one row per group."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("decimal(28,6)")
    ordw = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    allw = Window.partitionBy("l_returnflag")
    ordered = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.sum(wq).over(ordw).alias("cumw"),
        F.sum(wq).over(allw).alias("totw"),
    )
    return (
        ordered.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median"),
            F.max("totw").cast("double").alias("total_weight"),
        )
    )


# ---------------------------------------------------------------------------
# q116 — salted two-phase aggregation (skew mitigation, salt-invariant result)
# ---------------------------------------------------------------------------

@query(
    "q116_salted_event_totals",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS count_event_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q116_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event totals through the SALTED two-phase aggregation
    (`operators/skew.py::salted_agg`): phase 1 aggregates on (key, salt)
    so a hot key splits across 16 reducers, phase 2 merges the per-salt
    partials — the mitigation for key skew AQE can't fix (a single hot
    GROUP BY key is one shuffle partition no matter how AQE splits files).
    The oracle is the PLAIN group-by: re-aggregatable functions make the
    result salt-assignment-invariant, which is exactly the correctness
    contract the driver gate certifies here. The value sum rides DECIMAL
    through both phases so associativity is exact, not approximate."""
    from .operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(28,6)")
    )
    out = salted_agg(
        e,
        ["event_type"],
        {"event_id": "count", "value_dec": "sum", "value": "max"},
        salt_factor=16,
    )
    return out.select(
        "event_type",
        F.col("count_event_id"),
        F.col("sum_value_dec").cast("double").alias("sum_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


# ---------------------------------------------------------------------------
# q120 — multiset set operations (EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------

@query(
    "q120_multiset_ops",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'),
    ex AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b),
    ix AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_except_all,
      (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) FROM ex) AS d_except_all,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ix) AS n_intersect_all,
      (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) FROM ix) AS d_intersect_all
    """,
)
def q120_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — MULTISET semantics (per-value
    multiplicity arithmetic: max(m_a − m_b, 0) and min(m_a, m_b)), the
    bag-algebra completion of q15's distinct set ops (which certifies
    Spark's built-in set operators; this query certifies the bag algebra
    itself). Computed as ONE conditional-count pass over the fact — per
    key, m_a = rows with l_returnflag='R' and m_b = rows with
    l_linestatus='F', then the four bag statistics are exact integer
    arithmetic over the key-sized multiplicity frame. The naive
    a.exceptAll(b)/a.intersectAll(b) formulation scanned lineitem 4×
    (each side re-derived per set op — replay audit r7: 4 opens) and
    shuffled the fact twice; this shape is 1 scan + 1 key-sized shuffle,
    the form that survives 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            F.col("l_suppkey").alias("k"),
            (F.col("l_returnflag") == "R").cast("long").alias("in_a"),
            (F.col("l_linestatus") == "F").cast("long").alias("in_b"),
        )
        .groupBy("k")
        .agg(F.sum("in_a").alias("m_a"), F.sum("in_b").alias("m_b"))
    )
    # The d_* statistics mirror the oracle's COUNT(DISTINCT k), which
    # excludes NULL — but groupBy("k") keeps a NULL-key group (set-op bag
    # semantics treat NULLs as equal, so the n_* totals correctly include
    # it). Inert on TPC-H (l_suppkey is NOT NULL); exact on any schema.
    _k_ok = F.col("k").isNotNull()
    return m.agg(
        F.sum(F.greatest(F.col("m_a") - F.col("m_b"), F.lit(0))).alias(
            "n_except_all"
        ),
        F.count_if(_k_ok & (F.col("m_a") > F.col("m_b"))).alias(
            "d_except_all"
        ),
        F.sum(F.least("m_a", "m_b")).alias("n_intersect_all"),
        F.count_if(_k_ok & (F.col("m_a") > 0) & (F.col("m_b") > 0)).alias(
            "d_intersect_all"
        ),
    ).select(
        "n_except_all", "d_except_all", "n_intersect_all", "d_intersect_all"
    )


# ---------------------------------------------------------------------------
# q125 — exact higher moments (skewness / kurtosis)
# ---------------------------------------------------------------------------

@query(
    "q125_higher_moments",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(value) AS DOUBLE) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value*value AS DECIMAL(28,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(value*value*value AS DECIMAL(28,6))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(value*value*value*value AS DECIMAL(28,6))) AS DOUBLE) AS s4
      FROM events GROUP BY event_type)
    SELECT event_type,
           ROUND((s3/n - 3*(s1/n)*(s2/n) + 2*((s1/n)*(s1/n)*(s1/n)))
             / ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n))), 9)
             AS skewness,
           ROUND((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
              - 3*((s1/n)*(s1/n)*(s1/n)*(s1/n)))
             / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0, 9)
             AS excess_kurtosis
    FROM s ORDER BY event_type
    """,
)
def q125_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per event type via EXACT
    decimal raw-moment sums (S1..S4) — completing the deterministic moment
    family (mean/stddev q07, correlation q85, z-scores q86). Per-row powers
    are left-associated double products (identical in both engines), the
    four sums are exact decimals, and the final combination uses only
    IEEE-correctly-rounded ops (+,−,×,÷,sqrt; no pow, whose libm rounding
    is engine-specific) in mirrored association order; outputs round
    to 9 decimals because engines may fuse multiply-adds differently
    (observed 2-ulp kurtosis drift), the same grid policy as q106's ln. One aggregation, four
    extra decimal sums of state per group."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    dec = "decimal(28,6)"
    agg = e.groupBy("event_type").agg(
        F.count("value").cast("double").alias("n"),
        F.sum(v.cast(dec)).cast("double").alias("s1"),
        F.sum((v * v).cast(dec)).cast("double").alias("s2"),
        F.sum((v * v * v).cast(dec)).cast("double").alias("s3"),
        F.sum((v * v * v * v).cast(dec)).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    skew = (s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * (mean * mean * mean)) / (
        m2 * F.sqrt(m2)
    )
    kurt = (
        s4 / n
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * (mean * mean * mean * mean)
    ) / (m2 * m2) - F.lit(3.0)
    return agg.select(
        "event_type",
        F.round(skew, 9).alias("skewness"),
        F.round(kurt, 9).alias("excess_kurtosis"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q144 — median absolute deviation (robust spread, two-level exact median)
# ---------------------------------------------------------------------------

@query(
    "q144_mad_robust_stats",
    oracle="""
    WITH base AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x
      FROM lineitem),
    m1 AS (
      SELECT l_returnflag, x,
             COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM base),
    med AS (
      SELECT l_returnflag, MIN(x) AS median_price
      FROM m1 WHERE 2 * cum >= n GROUP BY l_returnflag),
    dev AS (
      SELECT b.l_returnflag, ABS(b.x - med.median_price) AS d
      FROM base b JOIN med USING (l_returnflag)),
    m2 AS (
      SELECT l_returnflag, d,
             COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS cum,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM dev)
    SELECT m2.l_returnflag,
           med.median_price,
           MIN(m2.d) AS mad
    FROM m2 JOIN med USING (l_returnflag)
    WHERE 2 * m2.cum >= m2.n
    GROUP BY m2.l_returnflag, med.median_price
    ORDER BY m2.l_returnflag
    """,
)
def q144_mad_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per return flag — the robust spread
    statistic (outlier-immune, unlike stddev) a fraud/quality screen
    prefers. Exact LOWER median via the cumulative-count crossing (the
    q115 weighted-median discipline with unit weights: min value where
    2·cum ≥ n — tie-proof, no interpolation), applied twice: once to the
    prices, once to |x − median|. Each level uses the TWO-PHASE
    ``grouped_lower_median`` (VERDICT r5 item 3): per-(flag, value)
    counts aggregate with map-side combine, and the cumulative window
    runs over those |distinct values| rows — with only 3 return flags the
    row-level window would be one task sorting a third of lineitem.
    (Local tradeoff, measured: sf0.1 prices are near-unique so the value
    rollup doesn't shrink and the extra exchange costs ~0.8 s vs the
    serial window; at 100 TB distinct cent-values saturate around 10⁷
    while rows reach 10¹¹ — the sorted window input shrinks ~10⁴× and the
    serial variant simply stops finishing.) The per-group medians
    re-attach by broadcast (|groups| rows) and the ``med`` frame
    localCheckpoints: it is consumed twice (deviation join + final
    re-attach) and its lineage is a full median pass — bare, the plan
    replayed that pass and re-scanned lineitem 3×. The fact projection
    itself is deliberately NOT checkpointed: two column-pruned scans
    (one per median level) beat materializing a 10¹¹-row frame. All
    arithmetic is single IEEE ops over the raw doubles — deterministic
    in any engine and partitioning."""
    from .operators.scale import grouped_lower_median

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("x")
    )
    med = grouped_lower_median(
        li, ["l_returnflag"], "x", "median_price"
    ).localCheckpoint(eager=True)
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "median_price",
        F.abs(F.col("x") - F.col("median_price")).alias("d"),
    )
    mad = grouped_lower_median(dev, ["l_returnflag"], "d", "mad")
    return (
        med.join(mad, "l_returnflag")
        .select("l_returnflag", "median_price", "mad")
        .orderBy("l_returnflag")
    )
