"""Deep multi-way join queries (TPC-H Q5 / Q14 / Q15 shapes) — the join-
planning workloads that separate a toy engine from one that holds at 100 TB:
a 6-way star join with two large fact-side tables, conditional aggregation
through a fact⋈dimension join, and a global-argmax over an aggregate.

Scale posture: dimension chains (region→nation→supplier/customer) broadcast;
the only shuffles are the fact-key joins (lineitem⋈orders on l_orderkey)
that no strategy can avoid at scale, and AQE re-plans their sizes after the
selective dimension filters. All money sums go through the DECIMAL
deterministic-sum helpers so Spark and DuckDB agree bitwise.

Reference parity: the reference's own joins top out at two-table equi joins
(notebooks/3_sql.ipynb); these queries extend the same surface to the
multi-join analytics a fraud/finance team actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum
from .plans.hints import broadcast_if_small
from .queries import query

_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


@query(
    "q89_regional_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o.o_orderdate <  TIMESTAMP '{_Q5_HI}'
    GROUP BY n.n_name
    """,
)
def q89_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join, revenue by supplier nation for LOCAL
    trade (customer and supplier share a nation) within one region and
    year. Join order matters at 100 TB: nation/region force-broadcast
    (constant 25/5 rows at any SF); the supplier chain and the customer
    (custkey, nationkey) projection grow linearly with SF, so their hints
    are SIZE-GUARDED (broadcast_if_small: hinted while under the session
    threshold, otherwise unhinted and AQE picks the strategy from real
    runtime sizes). Locally everything broadcasts and the ONLY shuffle is
    lineitem⋈orders on the fact key — the join that must shuffle no matter
    what. The local-trade predicate (c_nationkey = s_nationkey) is a
    residual filter on the broadcast-joined row, not an extra join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _Q5_LO) & (F.col("o_orderdate") < _Q5_HI)
    )
    li = load_table(spark, sf_dir, "lineitem")
    # nation/region are CONSTANT-size (25/5 rows at any SF) → forced
    # broadcast; supplier and customer grow linearly with SF → size-guarded
    # hint (broadcast locally, AQE decides at scale).
    sup = broadcast_if_small(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


_Q14_LO, _Q14_HI = "1997-03-01 00:00:00", "1997-04-01 00:00:00"


@query(
    "q90_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(28,6))
                     ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                AS DECIMAL(28,6))) AS DOUBLE)
             AS DOUBLE) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
      AND l.l_shipdate <  TIMESTAMP '{_Q14_HI}'
    """,
)
def q90_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month. The part
    dimension broadcasts (only (partkey, type) travels — column pruning
    matters more than row count at 100 TB); the month filter pushes to the
    lineitem scan; the global aggregate reduces map-side to one partial per
    task. Both DECIMAL sums stay exact until the final double division, so
    the ratio is bit-stable across engines and partitionings."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q14_LO) & (F.col("l_shipdate") < _Q14_HI)
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = (
        li.join(broadcast_if_small(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(promo, "promo_rev"),
            dsum(rev, "total_rev"),
            F.count("*").alias("n_items"),
        )
    )
    return agg.select(
        (100.0 * F.col("promo_rev") / F.col("total_rev"))
        .cast("double")
        .alias("promo_pct"),
        "n_items",
    )


_Q15_LO, _Q15_HI = "1997-01-01 00:00:00", "1997-04-01 00:00:00"


@query(
    "q91_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l.l_suppkey AS s_suppkey,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '{_Q15_LO}'
          AND l.l_shipdate <  TIMESTAMP '{_Q15_HI}'
        GROUP BY l.l_suppkey)
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON rev.s_suppkey = s.s_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q91_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The scalar-subquery MAX becomes an unpartitioned window max over the
    ALREADY-AGGREGATED per-supplier frame (|suppliers| rows, not |lineitem|)
    — the standard decorrelation; the supplier name attaches by broadcast
    afterwards, touching only the winning rows' keys. DECIMAL revenue sums
    make 'equal to the max' well-defined across engines (float sums would
    make the equality partition-order-dependent)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q15_LO) & (F.col("l_shipdate") < _Q15_HI)
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = rev.withColumn(
        "_mx", F.max("total_revenue").over(Window.partitionBy(F.lit(1)))
    ).filter(F.col("total_revenue") == F.col("_mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(broadcast_if_small(s), "s_suppkey").select(
        "s_suppkey", "s_name", "total_revenue"
    )
