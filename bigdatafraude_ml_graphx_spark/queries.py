"""Declared query set: every operator from SURVEY.md §2, as (Spark fn, oracle SQL).

This is the engine's judged surface. Each entry registers

  * a Spark callable ``(spark, sf_dir) -> DataFrame`` built on the engine's
    operator modules (idiomatic DataFrame API — Catalyst plans everything), and
  * an equivalent ANSI-SQL string the DuckDB oracle runs over the same parquet.

Column names are aliased identically on both sides (the driver sorts columns by
name and hashes values). Float aggregates use the deterministic DECIMAL-sum
construction from :mod:`..functions.deterministic` on BOTH sides so results are
bit-identical regardless of partitioning/order.

Reference-parity citations are in each query's docstring (``path:line`` into
/root/reference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import (
    davg,
    dstddev_samp,
    dsum,
    oracle_davg,
    oracle_dstddev_samp,
    oracle_dsum,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4) + sorts (§2.6)
# ---------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS num_rows,
           {oracle_dsum('l_quantity')} AS sum_qty,
           {oracle_dsum('l_extendedprice')} AS sum_base_price,
           {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oracle_davg('l_quantity')} AS avg_qty,
           {oracle_davg('l_discount')} AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship multi-aggregate group-by (A2/O1).

    The reference's per-class amount statistics —
    ``groupBy("label").agg(count, avg, sum, max, min, stddev)`` at
    ``notebooks/2_sql_analysis.ipynb:237-256 (cell d7dee7d7)`` — generalized to
    the TPC-H Q1 pricing-summary shape. Catalyst gives partial+final hash
    aggregation; the shipdate filter is pushed into the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("num_rows"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
        )
    )


@query(
    "q02_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q02_top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by sort+limit (O4): the reference's top-10-amounts query
    ``orderBy(col("Amount").desc()).limit(10)``
    (``notebooks/2_sql_analysis.ipynb:446-449``). Spark compiles this to
    ``TakeOrderedAndProject`` — no full sort at any scale. Unique-key
    tie-break keeps the answer set deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_BUCKET_SQL = """
    CASE WHEN o_totalprice < 25000 THEN '0-25k'
         WHEN o_totalprice < 100000 THEN '25k-100k'
         WHEN o_totalprice < 200000 THEN '100k-200k'
         ELSE '200k+' END
"""


@query(
    "q03_price_histogram",
    oracle=f"""
    SELECT {_BUCKET_SQL} AS price_bucket,
           o_orderstatus,
           COUNT(*) AS num_orders,
           {oracle_davg('o_totalprice')} AS avg_price
    FROM orders
    GROUP BY price_bucket, o_orderstatus
    """,
)
def q03_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN binning + multi-key group-by-expression (P8/A3/O3): the
    reference's amount-range histogram
    (``notebooks/2_sql_analysis.ipynb:368-383`` and SQL form at
    ``:617-641 (cell 29fb6cb7)``)."""
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 25000, "0-25k")
        .when(F.col("o_totalprice") < 100000, "25k-100k")
        .when(F.col("o_totalprice") < 200000, "100k-200k")
        .otherwise("200k+")
    )
    return (
        o.withColumn("price_bucket", bucket)
        .groupBy("price_bucket", "o_orderstatus")
        .agg(F.count("*").alias("num_orders"), davg("o_totalprice", "avg_price"))
    )


@query(
    "q04_revenue_filter",
    oracle=f"""
    SELECT {oracle_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS num_rows
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q04_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate under a compound range predicate (P6/A4) — the
    reference's ``WHERE label = 1 AND Amount > 1000`` shape
    (``notebooks/2_sql_analysis.ipynb:552-556``), TPC-H Q6 form. Both
    predicates push down to the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count("*").alias("num_rows"),
    )


@query(
    "q05_null_census",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_nulls,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey_nulls,
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_nulls,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_nulls,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderdate_nulls,
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_nulls
    FROM orders
    """,
)
def q05_null_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Programmatic per-column null census (P7/A4): the reference's
    ``select([sum(col(c).isNull().cast("int")).alias(c) for c in df.columns])``
    (``notebooks/1_data_cleaning.ipynb:167-171 (cell 0120673f)``)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}_nulls")
            for c in o.columns
        ]
    )


@query(
    "q06_distinct_segments",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q06_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + distinct (P1/P10): reference dedups projected vertex
    frames with ``.distinct()`` (``notebooks/4_graphx.ipynb:150,208``)."""
    return t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@query(
    "q07_global_stats",
    oracle=f"""
    SELECT COUNT(l_extendedprice) AS cnt,
           {oracle_davg('l_extendedprice')} AS mean,
           {oracle_dstddev_samp('l_extendedprice')} AS stddev,
           MIN(l_extendedprice) AS min_v,
           MAX(l_extendedprice) AS max_v
    FROM lineitem
    """,
)
def q07_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``describe()``-style summary statistics (A5), computed as a plain
    aggregate: reference ``df.select("Amount").describe()``
    (``notebooks/1_data_cleaning.ipynb:228``)."""
    li = t(spark, sf_dir, "lineitem")
    c = F.col("l_extendedprice")
    return li.agg(
        F.count(c).alias("cnt"),
        davg(c, "mean"),
        dstddev_samp(c, "stddev"),
        F.min(c).alias("min_v"),
        F.max(c).alias("max_v"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@query(
    "q08_segment_revenue",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS num_orders,
           {oracle_dsum('o.o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q08_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + group-by (J4/A1): reference
    ``cc_results.join(component_sizes, "component")`` then aggregate
    (``notebooks/4_graphx.ipynb:524``). The customer side is dimension-sized →
    explicitly broadcast, so the fact table never shuffles for the join."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("num_orders"), dsum("o_totalprice", "total_price"))
    )


@query(
    "q09_customer_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS num_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def q09_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (J2/J3): reference
    ``current_vertices.join(new_pageranks, "id", "left_outer")``
    (``notebooks/4_graphx.ipynb:872-876``)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("num_orders"))
    )


@query(
    "q10_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q10_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (§2.3 gap noted in SURVEY — reference never uses
    semi/anti; the engine exposes them as first-class)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q11_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q11_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (§2.3 gap)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q12_nation_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS num_items,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q12_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema multi-join with broadcast dimension tables (J4/J5 + the
    broadcast hint SURVEY §2.3 flags as missing in the reference). supplier /
    nation / region are tiny → all three broadcast; the 100 TB lineitem fact
    never shuffles for the joins, only for the final aggregation."""
    li = t(spark, sf_dir, "lineitem")
    s = F.broadcast(t(spark, sf_dir, "supplier"))
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("num_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.5 — implied-but-missing capability)
# ---------------------------------------------------------------------------

@query(
    "q13_top3_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) ranked
    WHERE rn <= 3
    """,
)
def q13_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (SURVEY §2.5: ``Window`` is imported
    but never used in the reference — its top-10-amounts query, cell c7e1b5f5,
    generalized per-group). Partition-local sort only; no global sort."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q14_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
    FROM orders
    """,
)
def q14_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame window (running sum per customer) — §2.5 gap coverage.
    Decimal accumulation keeps the running values engine-identical."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7 — gap coverage)
# ---------------------------------------------------------------------------

@query(
    "q15_set_union_except",
    oracle="""
    WITH big_spenders AS (
      SELECT o_custkey AS c FROM orders GROUP BY o_custkey
      HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) > 300000
    ),
    building AS (SELECT c_custkey AS c FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT c FROM big_spenders UNION SELECT c FROM building)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT c FROM big_spenders INTERSECT SELECT c FROM building)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT c FROM big_spenders EXCEPT SELECT c FROM building)
    """,
)
def q15_set_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (§2.7: none exist in the reference; engine exposes
    Spark's built-ins union/intersect/exceptAll)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    # Each side is consumed 3× (union / intersect / except); bare lineage
    # re-runs the orders rollup and the customer filter per consumption
    # (4 opens measured at r7, REPLAY_AUDIT_r07.json). Both frames are
    # key-only and bounded by the distinct-customer count, so checkpoint
    # once and reuse.
    big = (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "spend"))
        .filter(F.col("spend") > 300000)
        .select(F.col("o_custkey").alias("c"))
        .localCheckpoint(eager=True)
    )
    building = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("c"))
        .localCheckpoint(eager=True)
    )
    def n(df, op):
        return df.agg(F.count("*").alias("n")).select(F.lit(op).alias("op"), "n")
    return (
        n(big.union(building).distinct(), "union")
        .unionByName(n(big.intersect(building), "intersect"))
        .unionByName(n(big.exceptAll(building).distinct(), "except"))
    )


# ---------------------------------------------------------------------------
# Scalar functions / JSON / time (SURVEY §2.8) over the events table
# ---------------------------------------------------------------------------

@query(
    "q16_hourly_event_stats",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_ts, event_type,
           COUNT(*) AS num_events,
           {oracle_dsum('value')} AS total_value,
           {oracle_davg('value')} AS avg_value
    FROM events
    GROUP BY hour_ts, event_type
    """,
)
def q16_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by over a computed time bucket (A3 + F7/F8 time functions): the
    idiomatic batch version of the reference's hour-bucket logic
    ``(Time/3600).cast(int)`` (``notebooks/4_graphx.ipynb:200``)."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("hour_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour_ts", "event_type")
        .agg(
            F.count("*").alias("num_events"),
            dsum("value", "total_value"),
            davg("value", "avg_value"),
        )
    )


@query(
    "q17_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n,
           MAX(value) AS max_value
    FROM events
    GROUP BY k_mod
    """,
)
def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (F9): the reference parses Kafka JSON payloads
    with ``from_json`` (``streaming/spark_streaming.py:36``,
    ``streaming/kafka_to_influxdb.py:79-81``); here over the ``props`` JSON
    column with a group-by on the extracted key."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "k_mod", (F.get_json_object("props", "$.k").cast("int") % 10)
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"), F.max("value").alias("max_value"))
    )


@query(
    "q18_cast_projection",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(o_custkey AS VARCHAR) AS custkey_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def q18_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type casts (P9): ``.cast("int"/"string"/"decimal(10,2)")`` as in
    ``notebooks/4_graphx.ipynb:334-336`` and
    ``streaming/kafka_to_influxdb.py:141``."""
    o = t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("o_custkey").cast("string").alias("custkey_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
    )


@query(
    "q19_rollup_counts",
    oracle="""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
)
def q19_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation (§2.4 'not present' list — cube/rollup come free
    with Spark; declared here as first-class)."""
    return (
        t(spark, sf_dir, "customer")
        .rollup("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("n"))
    )
