"""Round-7 batch 4: customer-analytics shapes — RFM segmentation, Pareto
(80/20) concentration, per-group mode, and time-series autocorrelation.

Determinism: monetary values ride exact DECIMAL sums converted to integer
CENTS before any ordering or threshold compare; NTILE scoring uses the
distributed exact-fill operator (operators/scale.py::distributed_ntile,
certified in q128); the autocorrelation computes its moments as exact
decimal sums of integer-quantized values so the final double formula has
bit-identical operands on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q221 — RFM segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

_RFM_REF = "1998-08-02 00:00:00"  # scoring date: the TPC-H dataset horizon


@query(
    "q221_rfm_segments",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             CAST(floor((epoch_us(TIMESTAMP '{_RFM_REF}')
                         - epoch_us(MAX(o_orderdate))) / 86400000000.0)
                  AS BIGINT) AS recency_days,
             COUNT(*) AS freq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) * 100 AS BIGINT)
               AS m_cents
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT m_cents,
             NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY freq, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY m_cents, o_custkey) AS m_score
      FROM base)
    SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(m_cents) AS BIGINT) AS total_cents
    FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q221_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer scoring: quintile each
    customer on Recency (days since last order at the dataset horizon),
    Frequency (order count) and Monetary (exact decimal revenue → integer
    cents), then census the 5×5×5 cells. Every NTILE runs through
    ``distributed_ntile`` — the exact-fill two-phase operator (per-value
    counts → |distinct|-row rank window → parallel per-value tie-break),
    never a single global sort of the customer rollup; score 1 = lowest
    metric value (oldest / fewest / cheapest), matching the plain
    ``NTILE(5) OVER (ORDER BY metric, custkey)`` the oracle runs. Scale:
    the rollup is one shuffle of orders by custkey, then each scoring
    pass shuffles only the (value, count) table. The rollup and each
    scored stage localCheckpoint: ``distributed_ntile`` consumes its
    input twice (value counts + rank re-join), so three chained bare
    passes would re-execute the orders rollup 2^3 = 8 times (16 parquet
    scans measured) — the checkpoints pin one scan and one rollup
    shuffle total, over frames bounded at |customers| rows."""
    from .operators.scale import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.floor(
            (
                F.expr(
                    f"timestampdiff(MICROSECOND, MAX(o_orderdate),"
                    f" TIMESTAMP_NTZ '{_RFM_REF}')"
                )
            )
            / 86_400_000_000.0
        )
        .cast("long")
        .alias("recency_days"),
        F.count("*").alias("freq"),
        (F.sum(F.col("o_totalprice").cast("decimal(28,6)")) * 100)
        .cast("long")
        .alias("m_cents"),
    ).localCheckpoint(eager=True)
    scored = distributed_ntile(
        base, "recency_days", ["o_custkey"], 5, "r_score"
    ).localCheckpoint(eager=True)
    scored = distributed_ntile(
        scored, "freq", ["o_custkey"], 5, "f_score"
    ).localCheckpoint(eager=True)
    scored = distributed_ntile(scored, "m_cents", ["o_custkey"], 5, "m_score")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("m_cents").cast("long").alias("total_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# q222 — Pareto concentration (smallest customer set covering 80% revenue)
# ---------------------------------------------------------------------------

_PARETO_PCT = 80


@query(
    "q222_pareto_coverage",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) * 100 AS BIGINT)
               AS m_cents
      FROM orders GROUP BY o_custkey),
    vals AS (
      SELECT m_cents AS v, COUNT(*) AS c, m_cents * COUNT(*) AS r
      FROM cust GROUP BY m_cents),
    cum AS (
      SELECT v, c, r,
             SUM(c) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING) AS cum_c,
             SUM(r) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING) AS cum_r,
             SUM(r) OVER () AS t, SUM(c) OVER () AS n
      FROM vals),
    crossing AS (
      SELECT * FROM cum WHERE 100 * cum_r >= {_PARETO_PCT} * t
      ORDER BY v DESC LIMIT 1)
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(cum_c - c
                + CAST(floor(({_PARETO_PCT} * t - 100 * (cum_r - r)
                              + 100 * v - 1) / (100.0 * v)) AS BIGINT)
                AS BIGINT) AS top_n,
           CAST((cum_r - r
                 + CAST(floor(({_PARETO_PCT} * t - 100 * (cum_r - r)
                               + 100 * v - 1) / (100.0 * v)) AS BIGINT) * v)
                AS DOUBLE) / CAST(t AS DOUBLE) AS top_share
    FROM crossing
    """,
)
def q222_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration: the SMALLEST number of customers whose
    combined revenue reaches {80}% of the total, plus the exact share that
    prefix holds. Runs the two-phase counting discipline (q144/q198): the
    cumulative runs over the per-VALUE rollup (|distinct revenue values|
    rows, map-side combined), the crossing test is pure integer
    (``100·cum_r ≥ 80·total``), and the cut INSIDE the crossing tie-group
    is a ceiling division — customers with equal revenue are
    interchangeable, so the minimal prefix is exact. At extreme
    cardinality the value rollup approaches |customers| and the ordered
    cumulative serializes — the documented mitigation is banding revenue
    before the rollup (same crossing arithmetic on band sums)."""
    from .operators.scale import pareto_prefix

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(28,6)")) * 100)
        .cast("long")
        .alias("m_cents")
    )
    return pareto_prefix(cust, "m_cents", _PARETO_PCT).withColumnRenamed(
        "n_rows", "n_customers"
    )


# ---------------------------------------------------------------------------
# q223 — per-group mode (most frequent value, deterministic tie-break)
# ---------------------------------------------------------------------------


@query(
    "q223_group_mode",
    oracle="""
    WITH c AS (
      SELECT o.o_orderpriority, l.l_returnflag, COUNT(*) AS cnt
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    r AS (
      SELECT o_orderpriority, l_returnflag, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY cnt DESC, l_returnflag) AS rn
      FROM c)
    SELECT o_orderpriority, l_returnflag AS mode_returnflag,
           CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1 ORDER BY o_orderpriority
    """,
)
def q223_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE — the most frequent return flag per order priority,
    with a deterministic (count DESC, value) tie-break: the argmax shape
    SQL's MODE() leaves tie-undefined. Two stages: a (group, value)
    count rollup (map-side combined — the shuffle carries the cross
    cardinality, 5×3 here), then a rank-1 window over THAT rollup (never
    the raw rows). The join side is orders' two needed columns only —
    column pruning reaches the scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    c = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), "l_returnflag"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("l_returnflag").alias("mode_returnflag"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q224 — time-series autocorrelation of daily revenue
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 7, 30)


@query(
    "q224_revenue_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(floor(SUM(CAST(o_totalprice AS DECIMAL(28,6)))) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT k.lag_days, a.rev AS x, b.rev AS y
      FROM daily a
      JOIN (SELECT unnest([{", ".join(str(k) for k in _ACF_LAGS)}])
              AS lag_days) k ON TRUE
      JOIN daily b ON b.d = a.d + CAST(k.lag_days AS INT)),
    moments AS (
      SELECT lag_days, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                  AS DOUBLE) AS syy
      FROM pairs GROUP BY lag_days)
    SELECT CAST(lag_days AS INT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS acf
    FROM moments ORDER BY lag_days
    """,
)
def q224_revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags {1, 7, 30}
    days — the seasonality probe (a weekly cycle shows at lag 7). Daily
    revenue is an exact decimal sum floored to integer dollars; lagged
    pairs come from a calendar self-join of the DAILY rollup (O(#days)
    rows — never a row-level window over the fact table); the five
    moments are exact DECIMAL sums of integer products (int64 squares
    would overflow near sf1), and only the final Pearson formula runs in
    double — on bit-identical operands, so the result hash-matches. Scale:
    one fact shuffle to days, then metadata-sized everything."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.floor(F.sum(F.col("o_totalprice").cast("decimal(28,6)")))
        .cast("long")
        .alias("rev")
    )
    lags = spark.createDataFrame(
        [(int(k),) for k in _ACF_LAGS], "lag_days int"
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.d")
            == F.expr("date_add(a.d, lag_days)"),
        )
        .select(
            "lag_days",
            F.col("a.rev").alias("x"),
            F.col("b.rev").alias("y"),
        )
    )
    d19 = "decimal(19,0)"
    moments = pairs.groupBy("lag_days").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n").cast("double")
    acf = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return moments.select(
        F.col("lag_days").cast("int").alias("lag_days"),
        F.col("n").cast("long").alias("n_pairs"),
        acf.alias("acf"),
    ).orderBy("lag_days")
