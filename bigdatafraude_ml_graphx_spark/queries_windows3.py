"""Window-frame variety queries: RANGE frames and distribution functions.

Completes SURVEY §2.5 (the reference imports ``Window`` and never uses it):
q13/q14/q35 cover ranking, ROWS frames, and lag/lead; these add value-based
RANGE frames (time-windowed running aggregates — the windowed cousin of the
q51 band join) and ntile/first_value/last_value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

_30D_S = 30 * 86400


@query(
    "q60_range_frame_trailing_sum",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)
               RANGE BETWEEN {_30D_S} PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_30d_spend
    FROM orders
    """,
)
def q60_range_frame_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer: a RANGE frame over epoch seconds —
    value-based framing, so same-timestamp orders aggregate together
    regardless of row order (ties make ROWS frames non-deterministic here;
    RANGE is both correct and deterministic). Decimal-cast sums keep the
    running totals bit-exact."""
    o = load_table(spark, sf_dir, "orders")
    # TZ-independent epoch from the NTZ column (unix_timestamp would shift
    # with the session zone, and DST makes the shift row-dependent)
    epoch_s = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch_s)
        .rangeBetween(-_30D_S, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
    )


@query(
    "q61_ntile_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q61_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles + first_value/last_value per customer. The last_value
    frame is explicitly unbounded-following (the default frame stops at
    CURRENT ROW, a classic silent-wrong-answer); ordering carries the
    o_orderkey tiebreak so every function is deterministic."""
    o = load_table(spark, sf_dir, "orders")
    order_cols = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    w = Window.partitionBy("o_custkey").orderBy(*order_cols)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w_full).alias("priciest_order"),
    )
