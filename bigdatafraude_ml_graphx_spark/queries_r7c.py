"""Round-7 batch 3: lakehouse layout operators — Z-order clustering keys,
small-file compaction planning, interval-union coverage (gaps-and-islands),
and a zone-map pruning audit.

These are the table-MAINTENANCE side of a 100 TB deployment: the engine's
query operators assume a sane layout; these queries compute that layout
(and measure when it is working). All arithmetic is integer (bit
interleaves, row counts, epoch microseconds) so every oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

# ---------------------------------------------------------------------------
# q217 — Z-order (Morton) clustering keys
# ---------------------------------------------------------------------------

_Z_BITS = 8          # 8 bits per dimension -> 16-bit z-value
_Z_BUCKET_SHIFT = 8  # bucket = z >> 8 (256 buckets)
_Z_TOPN = 20


@query(
    "q217_zorder_keys",
    oracle=f"""
    WITH k AS (
      SELECT l_partkey % {1 << _Z_BITS} AS zx, l_suppkey % {1 << _Z_BITS} AS zy
      FROM lineitem),
    z AS (
      SELECT zx, zy,
             CAST(list_sum(list_transform(generate_series(0, {_Z_BITS - 1}),
               i -> (((zx >> i) & 1) << (2*i)) + (((zy >> i) & 1) << (2*i+1))))
               AS BIGINT) AS zval
      FROM k)
    SELECT CAST(zval >> {_Z_BUCKET_SHIFT} AS BIGINT) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zx) AS BIGINT) AS x_min, CAST(MAX(zx) AS BIGINT) AS x_max,
           CAST(MIN(zy) AS BIGINT) AS y_min, CAST(MAX(zy) AS BIGINT) AS y_max
    FROM z GROUP BY 1 ORDER BY zbucket LIMIT {_Z_TOPN}
    """,
)
def q217_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys — the multi-dimensional layout key
    behind Delta/Iceberg OPTIMIZE ZORDER: interleave the low {8} bits of
    two join/filter columns so rows close in EITHER dimension land in the
    same file, making zone maps (q220) effective on both. The interleave
    is a pure integer ``aggregate(sequence(...))`` fold (JVM-side, no
    UDF); the per-bucket x/y ranges in the output are the audit — each
    z-bucket bounds BOTH dimensions, which a single-column sort cannot.
    Scale: one narrow projection + one {256}-key aggregate; writing the
    layout is then ``repartitionByRange(zval)``, the same expression."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.select(
        F.pmod("l_partkey", F.lit(1 << _Z_BITS)).cast("long").alias("zx"),
        F.pmod("l_suppkey", F.lit(1 << _Z_BITS)).cast("long").alias("zy"),
    )
    z = k.withColumn(
        "zval",
        F.expr(
            f"aggregate(sequence(0, {_Z_BITS - 1}), CAST(0 AS BIGINT),"
            " (acc, i) -> acc"
            " + shiftleft(shiftright(zx, i) & CAST(1 AS BIGINT), 2*i)"
            " + shiftleft(shiftright(zy, i) & CAST(1 AS BIGINT), 2*i+1))"
        ),
    )
    return (
        z.groupBy(
            F.shiftright("zval", _Z_BUCKET_SHIFT).cast("long").alias("zbucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("zx").alias("x_min"),
            F.max("zx").alias("x_max"),
            F.min("zy").alias("y_min"),
            F.max("zy").alias("y_max"),
        )
        .orderBy("zbucket")
        .limit(_Z_TOPN)
    )


# ---------------------------------------------------------------------------
# q218 — small-file compaction planner (streaming bin-pack)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 2000  # rows per output file (stands in for target bytes)


@query(
    "q218_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT year(l_shipdate) * 100 + month(l_shipdate) AS part_month,
             CAST(l_shipdate AS DATE) AS file_day,
             COUNT(*) AS size_rows
      FROM lineitem GROUP BY 1, 2),
    packed AS (
      SELECT part_month, size_rows,
             CAST(floor(COALESCE(SUM(size_rows) OVER (
               PARTITION BY part_month ORDER BY file_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_COMPACT_TARGET}.0) AS BIGINT) AS bin
      FROM files)
    SELECT CAST(part_month AS BIGINT) AS part_month, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(size_rows) AS BIGINT) AS total_rows
    FROM packed GROUP BY part_month, bin ORDER BY part_month, bin
    """,
)
def q218_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the OPTIMIZE/bin-packing step every
    streaming-ingest table needs: per partition (month), assign the
    per-day input files to output bins by the prefix-sum rule
    ``bin = floor(bytes_before / target)`` — the deterministic streaming
    formulation of first-fit (each bin closes within one target of full,
    no global optimization needed). The window is per-PARTITION (days
    within a month, ~31 rows), never a global serial sort, and the input
    is file METADATA — O(#files), not O(data) — so the plan step costs
    nothing at 100 TB; executing it is one ``repartition`` per bin."""
    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("long")
        .alias("part_month"),
        F.col("l_shipdate").cast("date").alias("file_day"),
    ).agg(F.count("*").alias("size_rows"))
    w = (
        Window.partitionBy("part_month")
        .orderBy("file_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = files.select(
        "part_month",
        "size_rows",
        F.floor(
            F.coalesce(F.sum("size_rows").over(w), F.lit(0)) / _COMPACT_TARGET
        ).alias("bin"),
    )
    return (
        packed.groupBy("part_month", "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("size_rows").cast("long").alias("total_rows"),
        )
        .orderBy("part_month", "bin")
    )


# ---------------------------------------------------------------------------
# q219 — interval-union coverage (gaps-and-islands merge)
# ---------------------------------------------------------------------------

_COVER_TTL_US = 300_000_000  # each event covers [ts, ts + 5 min)


@query(
    "q219_interval_coverage",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + {_COVER_TTL_US} AS f
      FROM events),
    m AS (
      SELECT user_id, event_id, s, f,
             MAX(f) OVER (PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM e),
    isl AS (
      SELECT user_id, s, f,
             SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM m),
    agg AS (
      SELECT user_id, island, MIN(s) AS st, MAX(f) AS en
      FROM isl GROUP BY user_id, island)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(en - st) AS BIGINT) AS covered_micros
    FROM agg GROUP BY user_id ORDER BY user_id
    """,
)
def q219_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION coverage per user: overlay a 5-minute activity
    window on every event and merge overlaps (gaps-and-islands) — total
    covered time and island count, the active-time metric q114's
    max-concurrency twin doesn't give (union length != sum of lengths
    when intervals overlap). Island detection is the running-max trick:
    an interval starts a new island iff its start exceeds the max end of
    ALL earlier intervals (running max — adjacent-only comparison breaks
    on nested intervals). Epochs are integer MICROSECONDS from the NTZ
    column (TZ-independent). Scale: two windows + one aggregate, all
    partitioned by user — one shuffle."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("s"),
    )
    from .operators.temporal import interval_union_coverage

    e = e.withColumn("f", F.col("s") + _COVER_TTL_US)
    return (
        interval_union_coverage(
            e, ["user_id"], "s", "f", tie_cols=["event_id"]
        )
        .withColumnRenamed("covered", "covered_micros")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q220 — zone-map pruning audit
# ---------------------------------------------------------------------------

_ZM_FILE_ROWS = 4096  # orderkeys per simulated file
_ZM_PK_LO, _ZM_PK_HI = 10_000, 14_000
_ZM_PRICE_LO, _ZM_PRICE_HI = 100_000, 150_000


@query(
    "q220_zonemap_pruning",
    oracle=f"""
    WITH zones AS (
      SELECT CAST(floor(o_orderkey / {_ZM_FILE_ROWS}.0) AS BIGINT) AS file_id,
             MIN(o_orderkey) AS k_min, MAX(o_orderkey) AS k_max,
             MIN(o_totalprice) AS p_min, MAX(o_totalprice) AS p_max
      FROM orders GROUP BY 1)
    SELECT 'orderkey_range' AS predicate,
           CAST(COUNT(*) AS BIGINT) AS files_total,
           CAST(SUM(CASE WHEN k_min <= {_ZM_PK_HI} AND k_max >= {_ZM_PK_LO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN k_min <= {_ZM_PK_HI} AND k_max >= {_ZM_PK_LO}
                         THEN 0 ELSE 1 END) AS BIGINT) AS files_pruned
    FROM zones
    UNION ALL
    SELECT 'totalprice_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN p_min <= {_ZM_PRICE_HI} AND p_max >= {_ZM_PRICE_LO}
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN p_min <= {_ZM_PRICE_HI} AND p_max >= {_ZM_PRICE_LO}
                         THEN 0 ELSE 1 END) AS BIGINT)
    FROM zones
    ORDER BY predicate
    """,
)
def q220_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning audit: build per-file min/max statistics (files
    simulated as {4096}-orderkey ranges — the layout a sorted write
    produces) and measure, for one predicate per column, how many files
    a scan could SKIP. The contrast is the point: the clustered column
    (orderkey) prunes nearly everything, the unclustered one
    (totalprice) prunes nothing — the measurement that motivates q217's
    Z-order rewrite. Zone stats are file METADATA (O(#files)); the audit
    never reads data rows. This is the engine-side mirror of the
    PartitionFilters/PushedFilters plan contracts in tests/test_plans.py."""
    o = load_table(spark, sf_dir, "orders")
    zones = o.groupBy(
        F.floor(F.col("o_orderkey") / _ZM_FILE_ROWS).cast("long").alias("file_id")
    ).agg(
        F.min("o_orderkey").alias("k_min"),
        F.max("o_orderkey").alias("k_max"),
        F.min("o_totalprice").alias("p_min"),
        F.max("o_totalprice").alias("p_max"),
    )

    def audit(name: str, lo_c: str, hi_c: str, lo, hi) -> DataFrame:
        overlap = (F.col(lo_c) <= hi) & (F.col(hi_c) >= lo)
        return zones.agg(
            F.lit(name).alias("predicate"),
            F.count("*").cast("long").alias("files_total"),
            F.sum(F.when(overlap, 1).otherwise(0))
            .cast("long")
            .alias("files_scanned"),
            F.sum(F.when(overlap, 0).otherwise(1))
            .cast("long")
            .alias("files_pruned"),
        )

    return (
        audit("orderkey_range", "k_min", "k_max", _ZM_PK_LO, _ZM_PK_HI)
        .unionAll(
            audit("totalprice_range", "p_min", "p_max", _ZM_PRICE_LO, _ZM_PRICE_HI)
        )
        .orderBy("predicate")
    )
