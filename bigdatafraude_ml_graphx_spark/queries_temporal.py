"""Temporal-join and reshaping queries: as-of join, keyed range join, pivot,
explode/unnest (SURVEY §2.3 "not present: range/as-of/interval joins" and the
§2.7/§2.8 reshaping gaps — capabilities a user of the reference would reach
for next, absent from ``notebooks/4_graphx.ipynb``'s bucket-collapsed join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum
from .operators.temporal import asof_join, range_join
from .queries import query


@query(
    "q50_asof_join",
    oracle="""
    SELECT p.event_id, p.ts, p.user_id, p.value,
           v.asof_event_id, v.asof_value, v.asof_ts
    FROM events p
    LEFT JOIN LATERAL (
      SELECT e.event_id AS asof_event_id, e.value AS asof_value, e.ts AS asof_ts
      FROM events e
      WHERE e.user_id = p.user_id AND e.event_type = 'view' AND e.ts <= p.ts
      ORDER BY e.ts DESC, e.event_id DESC LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
    """,
)
def q50_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the latest at-or-before view by
    the same user (ties on ts broken by max event_id).

    The scalable formulation of the reference's "events near in time" join
    (``notebooks/4_graphx.ipynb:193-208``): one shuffle on user_id + one
    window pass — no inequality-join row explosion. Purchases with no prior
    view keep nulls (left semantics).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        purchases,
        views,
        key="user_id",
        probe_ts="ts",
        build_ts="ts",
        attach={"asof_event_id": "event_id", "asof_value": "value", "asof_ts": "ts"},
        tie_break="event_id",
    )


@query(
    "q51_range_join",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           COUNT(c.event_id) AS n_clicks,
           {oracle_dsum('c.value')} AS click_value
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
     AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def q51_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed range join: clicks by the same user in the hour before each
    purchase, counted and value-summed per purchase.

    Equi key (user_id) + residual time-band predicates → shuffled sort-merge
    join, never a nested loop (SURVEY §4 theta-join-avoidance rule applied to
    a true band join instead of bucket collapse).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = range_join(
        purchases,
        clicks,
        key="user_id",
        lower=F.col("b.ts") > F.col("p.ts") - F.expr("INTERVAL 1 HOUR"),
        upper=F.col("b.ts") <= F.col("p.ts"),
        how="left",
    )
    return joined.groupBy(
        F.col("p.event_id").alias("event_id"), F.col("p.user_id").alias("user_id")
    ).agg(
        F.count(F.col("b.event_id")).alias("n_clicks"),
        dsum(F.col("b.value"), "click_value"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


@query(
    "q52_pivot_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q52_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot: order counts by status × priority, one column per priority.

    ``groupBy().pivot(col, values)`` with the value list declared up front —
    without it Spark runs an extra distinct-scan job to discover pivot values,
    which at 100 TB is a full pass over the table. Missing combinations are
    coalesced to 0 to match SQL's ``COUNT(*) FILTER`` semantics.
    """
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").pivot("o_orderpriority", _PRIORITIES).count()
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
        ],
    )


@query(
    "q53_token_explode",
    oracle=r"""
    SELECT token, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
      FROM documents WHERE doc_id % 7 = 0
    )
    WHERE token <> ''
    GROUP BY token
    """,
)
def q53_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest: whitespace tokens of every 7th document, counted.

    The lateral-view shape absent from the reference (§2.8 has no string
    ops at all). ``split`` + ``explode`` stay JVM-side in whole-stage codegen;
    the generator runs before the shuffle so only (token) pairs move.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    tokens = d.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return tokens.groupBy("token").agg(F.count("*").alias("n"))


@query(
    "q123_asof_forward",
    oracle="""
    SELECT p.event_id, p.ts, p.user_id, p.value,
           v.next_event_id, v.next_value, v.next_ts
    FROM events p
    LEFT JOIN LATERAL (
      SELECT e.event_id AS next_event_id, e.value AS next_value, e.ts AS next_ts
      FROM events e
      WHERE e.user_id = p.user_id AND e.event_type = 'view' AND e.ts >= p.ts
      ORDER BY e.ts ASC, e.event_id ASC LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
    """,
)
def q123_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase gets the earliest at-or-after view
    by the same user (ties broken by min event_id) — the "next reading
    after the event" lookup that mirrors q50's backward direction. Same
    single-shuffle union+window plan; only the window ordering flips."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        purchases,
        views,
        key="user_id",
        probe_ts="ts",
        build_ts="ts",
        attach={"next_event_id": "event_id", "next_value": "value", "next_ts": "ts"},
        tie_break="event_id",
        direction="forward",
    )
