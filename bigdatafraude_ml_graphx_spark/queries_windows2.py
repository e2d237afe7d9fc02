"""Sliding/session windows, exact percentiles, grouping sets, and the
embedding near-dup join — second gap-coverage batch (SURVEY §2.9 'not
present' list + §2.4 extensions + north-star similarity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum
from .queries import query
from .similarity import embedding_near_dup_pairs
from .similarity.cosine import hyperplane_signs


@query(
    "q42_sliding_window",
    oracle=f"""
    SELECT ws AS window_start,
           COUNT(*) AS n_events,
           {oracle_dsum('value')} AS total_value
    FROM (
      SELECT date_trunc('hour', ts) AS ws, value FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
    )
    GROUP BY ws
    """,
)
def q42_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (2h window, 1h slide) — each event lands in
    exactly two windows; the oracle materializes that fan-out explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(F.count("*").alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("win.start").alias("window_start"), "n_events", "total_value"
        )
    )


@query(
    "q43_session_windows",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q43_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) via
    ``session_window`` — the oracle derives identical sessions with the
    classic lag + cumulative-flag construction. Session start = min event
    time in the session (Spark's ``session_window.start``)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "q44_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75
    FROM events GROUP BY event_type
    """,
)
def q44_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (§2.4 extension). Rounded to
    6 decimals on both sides: the interpolation midpoint can differ between
    engines in the last ulp (different but equivalent FP formulations); the
    inputs carry 2 decimals, so digit 6 is never a rounding boundary.
    At 100 TB swap for ``approx_percentile`` (sketch-based, one pass)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 6).alias("p25"),
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.75), 6).alias("p75"),
    )


@query(
    "q45_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
)
def q45_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping() flags — SQL entry point (SURVEY
    §3.2 dual surface: same capability via ``spark.sql`` over a temp view)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q45_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM q45_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


def _near_dup_oracle(threshold: float = 0.25, num_planes: int = 8, dim: int = 64) -> str:
    def qdot(va: str, vb: str) -> str:
        prods = (
            f"[CAST(floor(CAST({va}[i] AS DOUBLE) * CAST({vb}[i] AS DOUBLE) * 1e12 + 0.5)"
            f" AS BIGINT) for i in range(1, {dim + 1})]"
        )
        return f"(CAST(CAST(list_sum({prods}) AS BIGINT) AS DOUBLE) / 1e12)"

    bits = " || ".join(
        "CAST(CAST(("
        + qdot("embedding", "[" + ",".join(str(s) for s in hyperplane_signs(p, dim)) + "]")
        + " >= 0) AS INTEGER) AS VARCHAR)"
        for p in range(num_planes)
    )
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bits} AS bucket FROM embeddings)
    SELECT id_a, id_b, cosine FROM (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
             {qdot('a.embedding', 'b2.embedding')}
               / (sqrt({qdot('a.embedding', 'a.embedding')})
                  * sqrt({qdot('b2.embedding', 'b2.embedding')})) AS cosine
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
    WHERE cosine >= {threshold}
    """


@query("q46_embedding_near_dups", oracle=_near_dup_oracle())
def q46_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, hyperplane-LSH bucketed (the
    O(N²)-free scale path); hyperplanes are md5-derived ±1 literals shared
    verbatim with the oracle."""
    return embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.25, num_planes=8
    )
