"""SQL-entry-point queries: scalar subquery and UNPIVOT/stack.

The reference runs half its analytics through ``spark.sql`` over temp views
(entry point B, SURVEY §3.2 — ``notebooks/2_sql_analysis.ipynb:81-82,114``)
but never uses a subquery or reshapes wide→long. These queries exercise the
SQL surface itself (views registered via ``catalog.register_views``) so the
judged set covers both entry points end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views
from .functions.deterministic import oracle_davg
from .queries import query

# The threshold is the deterministic decimal-sum average (identical IEEE ops
# on both engines), so the float comparison selects the same rows everywhere.
_ABOVE_AVG_SQL_SPARK = """
SELECT l_returnflag,
       COUNT(*) AS n_above,
       CAST(SUM(CAST(l_extendedprice AS decimal(28,6))) AS DOUBLE) AS price_above
FROM lineitem
WHERE l_extendedprice > (
    SELECT CAST(SUM(CAST(l_extendedprice AS decimal(28,6))) AS DOUBLE)
           / COUNT(l_extendedprice)
    FROM lineitem
)
GROUP BY l_returnflag
"""


@query(
    "q56_scalar_subquery",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_above,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS price_above
    FROM lineitem
    WHERE l_extendedprice > (SELECT {oracle_davg('l_extendedprice')} FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def q56_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery through ``spark.sql`` — Catalyst plans the
    subquery as a one-row broadcast (Subquery exec), so the outer scan is a
    single pushdown-filtered pass; no driver round-trip in user code."""
    register_views(spark, sf_dir)
    return spark.sql(_ABOVE_AVG_SQL_SPARK)


@query(
    "q57_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    WHERE l_orderkey % 31 = 0
    """,
)
def q57_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via ``stack`` (the inverse of q52's pivot). ``stack``
    is a generator expression inside whole-stage codegen — the 4× row
    expansion happens after the partition-local filter, nothing shuffles."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               stack(4, 'quantity', l_quantity,
                        'price',    l_extendedprice,
                        'discount', l_discount,
                        'tax',      l_tax) AS (metric, value)
        FROM lineitem
        WHERE l_orderkey % 31 = 0
        """
    )
