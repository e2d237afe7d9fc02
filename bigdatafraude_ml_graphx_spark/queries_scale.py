"""Distributed-exact variants of the documented serial windows (round 5).

q104 and q114 certify exact semantics through single unpartitioned
windows — correct, but a serial point their docstrings could only excuse
in prose. q126/q128 run the SAME computations through the two-phase
operators in :mod:`.operators.scale` (per-bucket parallel windows + a
tiny summary window) and are certified against the SAME oracle SQL —
the 100 TB path as code, not prose (VERDICT r4 item 7). q127 is the
per-group production shape (deciles within language) where the window
partitioning itself provides the parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.scale import distributed_max_concurrency, distributed_ntile
from .queries import query

# ---------------------------------------------------------------------------
# q126 — max interval concurrency via the two-phase distributed sweep
# (same oracle as q114 — identical answer, scalable plan)
# ---------------------------------------------------------------------------


@query(
    "q126_max_concurrency_scaled",
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
def q126_max_concurrency_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q114's sweep-line answer via ``distributed_max_concurrency``: ±1
    deltas bucketed by calendar day, per-day running sums (parallel
    windows), then a |days|-row summary window combines bucket offsets.
    The oracle is q114's serial SQL verbatim — prefix maxima decompose
    exactly over an ordered bucketing, so the distributed plan must hash
    to the identical single row."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    iv = e.select(
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("interval 5 minutes")).alias("end_ts"),
    )
    out = distributed_max_concurrency(iv, "start_ts", "end_ts")
    return out.select(
        F.col("max_concurrent").cast("long"), F.col("n_intervals")
    )


# ---------------------------------------------------------------------------
# q127 — per-language equi-depth deciles (the per-group production shape)
# ---------------------------------------------------------------------------


@query(
    "q127_length_deciles_by_lang",
    oracle="""
    SELECT lang, decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM (
      SELECT lang, n_chars,
             NTILE(10) OVER (PARTITION BY lang
                             ORDER BY n_chars, doc_id) AS decile
      FROM documents)
    GROUP BY lang, decile
    ORDER BY lang, decile
    """,
)
def q127_length_deciles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth length deciles WITHIN each language — the per-group
    variant of q104 where the window's own partitioning (by lang) is the
    parallelism: no unpartitioned window anywhere, every group's NTILE
    runs independently. This is the shape a curriculum/packing pipeline
    actually runs (buckets per language/domain, not global)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        d.select("lang", "n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "decile")
    )


# ---------------------------------------------------------------------------
# q128 — global equi-depth deciles via distributed NTILE
# (same oracle as q104 — identical answer, no global row window)
# ---------------------------------------------------------------------------


@query(
    "q128_length_deciles_scaled",
    oracle="""
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM (
      SELECT n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents)
    GROUP BY decile
    ORDER BY decile
    """,
)
def q128_length_deciles_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q104's global deciles via ``distributed_ntile``: the only
    unpartitioned window runs over the |distinct n_chars| count summary
    (thousands of rows at any corpus size), row ranks come from windows
    partitioned by n_chars value, and NTILE's exact fill rule is applied
    arithmetically to the recomposed global rank. Certified against
    q104's serial oracle verbatim."""
    d = load_table(spark, sf_dir, "documents")
    bucketed = distributed_ntile(
        d.select("n_chars", "doc_id"), "n_chars", ["doc_id"], 10,
        out_col="decile",
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q145 — 2-D Pareto frontier (skyline) of the part catalog
# ---------------------------------------------------------------------------


@query(
    "q145_skyline_pareto",
    oracle="""
    WITH points AS (
      SELECT p_retailprice AS price, MAX(p_size) AS size
      FROM part GROUP BY p_retailprice)
    SELECT CAST(price AS DOUBLE) AS price, CAST(size AS INT) AS size
    FROM points p
    WHERE NOT EXISTS (
      SELECT 1 FROM points q
      WHERE q.price <= p.price AND q.size >= p.size
        AND (q.price < p.price OR q.size > p.size))
    """,
)
def q145_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: cheapest price for every achievable size
    (no other part is both ≤ price and ≥ size with one strict) — the
    skyline operator (best-tradeoff search: cheapest acceptable supplier,
    risk-vs-return frontiers). The oracle states the O(n²) NOT-EXISTS
    definition; the engine runs ``operators.scale.skyline_2d`` —
    per-price reduction, bucket-local running-max skylines in parallel,
    then one global pass over the few survivors."""
    from .operators.scale import skyline_2d

    p = load_table(spark, sf_dir, "part").select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    )
    sky = skyline_2d(p, "price", "size", n_buckets=64)
    return sky.select(
        F.col("price").cast("double").alias("price"),
        F.col("size").cast("int").alias("size"),
    )
