"""Round-5 TPC-H shape extensions (Q12 / Q9 / Q21 adapted to the slim
testdata schema — no shipmode/commitdate/partsupp columns, so each keeps
the QUERY SHAPE that matters to the planner and maps the predicate onto
available columns).

Scale posture follows the round-4/5 discipline: constant dimensions
(nation) force-broadcast, linear dimensions (part, supplier) and per-key
aggregates take size-guarded hints (``plans.hints.broadcast_if_small``),
facts shuffle only on unavoidable fact keys, and every money sum is the
exact DECIMAL helper so Spark and DuckDB agree bitwise.

Reference parity: the reference's SQL stops at two-table equi joins
(/root/reference/notebooks/3_sql.ipynb); these extend the declared surface
to conditional-aggregation joins, multi-dimension profit rollups, and
double-correlated EXISTS/NOT-EXISTS — the shapes a fraud-analytics team
runs daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum
from .plans.hints import broadcast_if_small
from .queries import query

# ---------------------------------------------------------------------------
# q129 — TPC-H Q12 shape: priority line counts by line status
# ---------------------------------------------------------------------------

_Q12_LO, _Q12_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"


@query(
    "q129_priority_by_linestatus",
    oracle=f"""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO}'
      AND l.l_shipdate <  TIMESTAMP '{_Q12_HI}'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q129_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus on the slim schema): count
    urgent vs non-urgent order lines per line status in one ship year.
    The double conditional count rides ONE fact join — the CASE pair
    aggregates in the same pass (no per-priority second scan); the date
    filter pushes to the lineitem scan and both scans prune to 3 columns.
    The join is fact⋈fact on the order key — the shuffle that must exist —
    and AQE right-sizes it after the year filter."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q12_LO) & (F.col("l_shipdate") < _Q12_HI)
    ).select("l_orderkey", "l_linestatus")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q130 — TPC-H Q9 shape: profit by supplier nation and order year
# ---------------------------------------------------------------------------

_Q9_PART_PAT = "%red%"  # p_name filter (Q9's '%green%' on the slim names)


@query(
    "q130_profit_by_nation_year",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)'
                        ' - 0.1 * p.p_retailprice * l.l_quantity')} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '{_Q9_PART_PAT}'
    GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    ORDER BY nation, o_year DESC
    """,
)
def q130_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation × order year
    (cost = 0.1·retailprice·qty standing in for the absent partsupp
    supplycost — same join tree, same rollup). Part (name-filtered) and
    supplier⋈nation take size-guarded broadcast hints; the only shuffles
    are lineitem⋈orders on the order key and the final small rollup.
    Profit stays DECIMAL end-to-end: the subtraction of two money
    products is exactly where float partial sums would diverge between
    engines and partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(_Q9_PART_PAT)
    ).select("p_partkey", "p_retailprice")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(broadcast_if_small(p), li.l_partkey == p.p_partkey)
        .join(broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(dsum(amount, "profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q131 — TPC-H Q21 shape: suppliers who alone kept multi-supplier orders late
# ---------------------------------------------------------------------------

_Q21_LATE_DAYS = 60
_Q21_TOPN = 25


@query(
    "q131_waiting_orders",
    oracle=f"""
    WITH lines AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY)
               AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late) l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lines l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lines l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT {_Q21_TOPN}
    """,
)
def q131_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late shipper on finalized
    multi-supplier orders (late = shipped >60 days after the order date on
    the slim schema). The double correlation decorrelates into ONE
    per-order aggregate — n_suppliers, n_late_suppliers, and the only
    late supplier's key via min/max — instead of the literal EXISTS +
    NOT-EXISTS re-joins (three passes over lineitem in the naive plan,
    one here). A qualifying order has ≥2 suppliers, exactly 1 late
    supplier, and every late line from that supplier: the filter is pure
    aggregate arithmetic, then the tiny qualifying set joins supplier
    names with a size-guarded hint. Top-k by (numwait, name) compiles to
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lines = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"interval {_Q21_LATE_DAYS} days"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
        .distinct()
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.min(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    waiting = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select(F.col("late_supp").alias("s_suppkey"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(broadcast_if_small(s), "s_suppkey")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(_Q21_TOPN)
    )
