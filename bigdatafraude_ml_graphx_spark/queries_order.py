"""Final §2 audit queries: ORDER BY CASE top-k (O3), coalesce null-fill after
an outer join (F4/J3), and array positional access (F10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

_PRIO_ORDER = """
    CASE o_orderpriority
         WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
         WHEN '4-NOT SPECIFIED' THEN 4 ELSE 5 END
"""


@query(
    "q47_orderby_case_topk",
    oracle=f"""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY {_PRIO_ORDER} ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def q47_orderby_case_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort by arbitrary CASE expression + limit (O3/O4): the reference's
    custom bucket ordering (``notebooks/2_sql_analysis.ipynb:627-641``) —
    still compiles to TakeOrderedAndProject, no full sort."""
    o = load_table(spark, sf_dir, "orders")
    prio = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 3)
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", 4)
        .otherwise(5)
    )
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(prio.asc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "q48_coalesce_and_array_index",
    oracle="""
    SELECT c.c_custkey,
           coalesce(CAST(s.total AS DOUBLE), 0.0) AS spend_filled,
           CASE WHEN s.total IS NULL THEN 1 ELSE 0 END AS was_null,
           e.first_dim, e.last_dim
    FROM customer c
    LEFT JOIN (SELECT o_custkey,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
               FROM orders GROUP BY o_custkey) s
      ON c.c_custkey = s.o_custkey
    JOIN (SELECT vec_id,
                 CAST(embedding[1] AS DOUBLE) AS first_dim,
                 CAST(embedding[64] AS DOUBLE) AS last_dim
          FROM embeddings) e
      ON c.c_custkey = e.vec_id
    """,
)
def q48_coalesce_and_array_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce null-fill after a left-outer join (F4/J3 — the reference's
    PageRank merge, ``notebooks/4_graphx.ipynb:872-876``) + array positional
    access (F10 — ``col("features_array")[29]``,
    ``notebooks/2_sql_analysis.ipynb:156``)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    emb = load_table(spark, sf_dir, "embeddings")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("total")
    )
    dims = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("first_dim"),
        F.element_at("embedding", 64).cast("double").alias("last_dim"),
    )
    return (
        c.join(spend, c.c_custkey == spend.o_custkey, "left")
        .join(dims, c.c_custkey == dims.vec_id)
        .select(
            "c_custkey",
            F.coalesce(F.col("total"), F.lit(0.0)).alias("spend_filled"),
            F.when(F.col("total").isNull(), 1).otherwise(0).alias("was_null"),
            "first_dim",
            "last_dim",
        )
    )
