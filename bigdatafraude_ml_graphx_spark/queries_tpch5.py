"""Round-6 TPC-H shape extensions (Q2 / Q11 / Q16 / Q20 adapted to the slim
testdata schema — no partsupp table, so the part×supplier "supply" relation
is derived from lineitem, keeping each query's SHAPE: the decorrelated
per-group argmin (Q2), the scalar-subquery HAVING threshold (Q11), the
NOT-IN exclusion + grouped COUNT DISTINCT (Q16), and the nested
semi-join sweep over a derived share (Q20).

Scale posture follows queries_tpch4.py: constant dimensions (nation/region)
force-broadcast, linear dimensions (part, supplier, per-key aggregates)
take size-guarded hints, money sums are exact DECIMAL, ratio comparisons
are single IEEE ops over decimal-exact operands, and argmin ties break on
keys via struct ordering.

Reference parity: the reference's SQL stops at two-table equi joins
(/root/reference/notebooks/3_sql.ipynb); these extend the declared surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum
from .plans.hints import broadcast_if_small
from .queries import query

# ---------------------------------------------------------------------------
# q152 — TPC-H Q2 shape: cheapest supplier per part within a region
# ---------------------------------------------------------------------------

_Q2_REGION = "EUROPE"
_Q2_MIN_SIZE = 40
_Q2_TOPN = 20


@query(
    "q152_min_cost_supplier",
    oracle=f"""
    WITH eu_sup AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = '{_Q2_REGION}'),
    offers AS (
      SELECT l.l_partkey, l.l_suppkey,
             l.l_extendedprice / l.l_quantity AS unit_cost
      FROM lineitem l
      JOIN eu_sup s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size >= {_Q2_MIN_SIZE}),
    best AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cost, l_suppkey) AS rn
      FROM offers)
    SELECT b.l_partkey AS p_partkey, p.p_name,
           s.s_name, s.s_acctbal, b.unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN eu_sup s ON s.s_suppkey = b.l_suppkey
    WHERE b.rn = 1
    ORDER BY s.s_acctbal DESC, s.s_name, p_partkey
    LIMIT {_Q2_TOPN}
    """,
)
def q152_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the cheapest regional supplier for every qualifying
    part (unit cost = extendedprice/quantity standing in for the absent
    partsupp supplycost). The correlated MIN subquery decorrelates into a
    per-part struct-min argmin — ONE aggregate over the offers, no
    re-join of the fact against itself, deterministic ties via
    (cost, suppkey) struct ordering (the q107 max_by discipline).
    Supplier⋈nation⋈region and the size-filtered part list take
    size-guarded broadcasts; the fact scans once. Unit cost is one IEEE
    division — bit-identical in both engines — and is never summed, so
    no decimal staging is needed. Top-k compiles to
    TakeOrderedAndProject."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q2_REGION
    ).select("r_regionkey")
    eu_sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") >= _Q2_MIN_SIZE
    ).select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    offers = li.join(
        broadcast_if_small(eu_sup.select("s_suppkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).join(
        broadcast_if_small(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    best = offers.groupBy("l_partkey").agg(
        F.min(
            F.struct(
                F.col("unit_cost").alias("c"), F.col("l_suppkey").alias("k")
            )
        ).alias("b")
    ).select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("b.k").alias("s_suppkey"),
        F.col("b.c").alias("unit_cost"),
    )
    return (
        best.join(broadcast_if_small(p), "p_partkey")
        .join(broadcast_if_small(eu_sup), "s_suppkey")
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(_Q2_TOPN)
    )


# ---------------------------------------------------------------------------
# q153 — TPC-H Q11 shape: important parts by national supply value
# ---------------------------------------------------------------------------

_Q11_NATION = "NATION_7"
_Q11_FRACTION = 0.002
_Q11_TOPN = 50


@query(
    "q153_important_part_values",
    oracle=f"""
    WITH nat_lines AS (
      SELECT l.l_partkey,
             l.l_extendedprice * (1 - l.l_discount) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = '{_Q11_NATION}'),
    per_part AS (
      SELECT l_partkey, {oracle_dsum('val')} AS value
      FROM nat_lines GROUP BY l_partkey),
    total AS (SELECT {oracle_dsum('val')} AS tot FROM nat_lines)
    SELECT p.l_partkey AS p_partkey, p.value
    FROM per_part p, total t
    WHERE p.value > {_Q11_FRACTION} * t.tot
    ORDER BY p.value DESC, p_partkey
    LIMIT {_Q11_TOPN}
    """,
)
def q153_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose supply value from one nation's
    suppliers exceeds a fraction of that nation's total supply value —
    the scalar-subquery HAVING threshold. The fact is scanned ONCE: the
    per-part rollup keeps its exact DECIMAL partial and the global total
    re-aggregates those |parts| partials (decimal addition is
    associative, so this equals the oracle's flat sum bit-for-bit) — no
    second fact pass, no fact-sized checkpoint. The 1-row total
    re-attaches by forced broadcast (a scalar is provably tiny); the
    threshold comparison is one IEEE multiply over engine-identical
    doubles. Top-k compiles to TakeOrderedAndProject."""
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q11_NATION
    ).select("n_nationkey")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
    )
    # ONE fact pass: the per-part rollup keeps its EXACT decimal partial,
    # and the scalar total re-aggregates those partials (decimal addition
    # is associative, so Σ_parts Σ_lines ≡ Σ_lines — the oracle computes
    # the flat sum and matches bit-for-bit). No fact-sized checkpoint.
    per_part_dec = li.join(
        broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey")
    ).groupBy("l_partkey").agg(
        F.sum(F.col("val").cast("decimal(28,6)")).alias("dec_value")
    ).localCheckpoint(eager=True)  # |parts| rows feed rollup AND total
    per_part = per_part_dec.select(
        "l_partkey", F.col("dec_value").cast("double").alias("value")
    )
    total = per_part_dec.agg(
        F.sum("dec_value").cast("double").alias("tot")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > _Q11_FRACTION * F.col("tot"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), "p_partkey")
        .limit(_Q11_TOPN)
    )


# ---------------------------------------------------------------------------
# q154 — TPC-H Q16 shape: supplier diversity per part attribute
# ---------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#3"


@query(
    "q154_supplier_diversity",
    oracle=f"""
    WITH ok_sup AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0),
    pl AS (
      SELECT DISTINCT p.p_brand, p.p_size, l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN ok_sup s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
        AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22))
    SELECT p_brand, p_size,
           CAST(COUNT(*) AS BIGINT) AS supplier_cnt
    FROM pl
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q154_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (non-excluded) suppliers serve
    each part attribute group. The NOT-IN complaint exclusion (negative
    account balance standing in for the comment filter) becomes a
    LEFT-ANTI join computed once on the supplier dimension; the
    attribute-filtered part list broadcasts (size-guarded); COUNT
    DISTINCT reduces via the (brand, size, suppkey) distinct — map-side
    partial dedup — never a full fact shuffle of raw lines.

    The exclusion is NULL-symmetric with the oracle's ``ok_sup`` inner
    join (``s_acctbal >= 0`` keeps): the anti-join side lists suppliers
    failing that predicate — ``s_acctbal < 0 OR s_acctbal IS NULL`` — so
    an unknown balance is excluded on both engines rather than kept by
    the anti join and dropped by the oracle (ADVICE r6)."""
    bad = load_table(spark, sf_dir, "supplier").filter(
        (F.col("s_acctbal") < 0) | F.col("s_acctbal").isNull()
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_EXCL_BRAND)
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),  # complaints list: tiny by construction
            F.col("l_suppkey") == bad.s_suppkey,
            "left_anti",
        )
        .select("p_brand", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


# ---------------------------------------------------------------------------
# q155 — TPC-H Q20 shape: dominant suppliers of promoted parts
# ---------------------------------------------------------------------------

_Q20_NAME_PREFIX = "red%"
_Q20_YEAR_LO, _Q20_YEAR_HI = "1995-01-01 00:00:00", "1996-01-01 00:00:00"
_Q20_SHARE = 0.5


@query(
    "q155_dominant_suppliers",
    oracle=f"""
    WITH promo_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_NAME_PREFIX}'),
    shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
      FROM lineitem l
      JOIN promo_parts p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '{_Q20_YEAR_LO}'
        AND l.l_shipdate <  TIMESTAMP '{_Q20_YEAR_HI}'
      GROUP BY l.l_partkey, l.l_suppkey),
    totals AS (
      SELECT l_partkey, {oracle_dsum('qty')} AS part_qty
      FROM shipped GROUP BY l_partkey)
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM shipped sh
    JOIN totals t ON t.l_partkey = sh.l_partkey
    JOIN supplier s ON s.s_suppkey = sh.l_suppkey
    WHERE sh.qty > {_Q20_SHARE} * t.part_qty
    GROUP BY s.s_name
    ORDER BY n_dominated_parts DESC, s.s_name
    """,
)
def q155_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant (>50%) share of a
    promoted part's shipped volume in one year — the nested-IN sweep
    (parts by name → supply share per supplier → qualifying suppliers)
    decorrelated to two stacked aggregates over ONE filtered fact pass:
    per-(part, supplier) quantities, then per-part totals derived FROM
    THOSE PARTIALS (a second tiny rollup, not a second fact scan). The
    share comparison is one IEEE multiply over decimal-exact quantities;
    the qualifying pair set is small and joins supplier names with a
    size-guarded hint."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like(_Q20_NAME_PREFIX)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _Q20_YEAR_LO)
        & (F.col("l_shipdate") < _Q20_YEAR_HI)
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(broadcast_if_small(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty"))
        .localCheckpoint(eager=True)  # feeds pair shares AND part totals
    )
    totals = shipped.groupBy("l_partkey").agg(dsum("qty", "part_qty"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        shipped.join(broadcast_if_small(totals), "l_partkey")
        .filter(F.col("qty") > _Q20_SHARE * F.col("part_qty"))
        .join(broadcast_if_small(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("n_dominated_parts"))
        .orderBy(F.col("n_dominated_parts").desc(), "s_name")
    )
