"""Gap-coverage query declarations: capabilities the reference implies but
never wrote (SURVEY §2.5 windows beyond ranking, §2.4 cube, §2.8 time/epoch
functions, P2 selectExpr)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query


@query(
    "q35_lag_lead_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER w AS delta_prev,
           LEAD(o_orderkey) OVER w AS next_order,
           CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderpriority ASC) AS INTEGER)
             AS priority_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q35_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/dense_rank analytic windows — §2.5 gap (the reference imports
    ``Window`` but never uses it, ``notebooks/4_graphx.ipynb:87``). The
    price delta is a single double subtraction per row (deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wr = Window.partitionBy("o_custkey").orderBy(F.col("o_orderpriority").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.dense_rank().over(wr).alias("priority_rank"),
    )


@query(
    "q36_epoch_time_parts",
    oracle="""
    SELECT event_id,
           date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS epoch_s,
           CAST(extract(hour FROM ts) AS INTEGER) AS hour_of_day,
           CAST(extract(day FROM ts) AS INTEGER) AS day_of_month,
           CAST(extract(minute FROM ts) AS INTEGER) AS minute_of_hour
    FROM events WHERE event_id % 37 = 0
    """,
)
def q36_epoch_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch conversion + timestamp part extraction (F7/F8 family:
    ``from_unixtime`` at ``streaming/.ipynb_checkpoints/spark_streaming-checkpoint.py:57``)
    — done timezone-independently on the NTZ column."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") % 37 == 0).select(
        "event_id",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("epoch_s"),
        F.hour("ts").alias("hour_of_day"),
        F.dayofmonth("ts").alias("day_of_month"),
        F.minute("ts").alias("minute_of_hour"),
    )


@query(
    "q37_selectexpr_projection",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS event_id_str,
           value * 100.0 AS value_cents,
           upper(event_type) AS event_type_uc,
           concat(event_type, ':', CAST(user_id AS VARCHAR)) AS type_user
    FROM events WHERE event_id % 53 = 0
    """,
)
def q37_selectexpr_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-expression projection (P2): the reference's
    ``selectExpr("CAST(value AS STRING) as json_str")``
    (``streaming/spark_streaming.py:34``) generalized."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_id") % 53 == 0).selectExpr(
        "CAST(event_id AS STRING) AS event_id_str",
        "value * 100.0 AS value_cents",
        "upper(event_type) AS event_type_uc",
        "concat(event_type, ':', CAST(user_id AS STRING)) AS type_user",
    )


@query(
    "q38_cube_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q38_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (§2.4 'not present' list — free with Spark,
    declared as first-class)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
