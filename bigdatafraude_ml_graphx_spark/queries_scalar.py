"""Scalar-function and remaining-aggregate coverage queries (SURVEY §2.8 F-*
rows, A7 distinct counts, G4 weight normalization)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .graph import cooccurrence_edges
from .queries import query


@query(
    "q39_distinct_counts",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def q39_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting per group (A7:
    ``cc_analysis.select("component").distinct().count()``,
    ``/root/reference/notebooks/4_graphx.ipynb:1102``). At 100 TB swap
    ``countDistinct`` for ``approx_count_distinct`` — declared here exact so
    the oracle can check it."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "q40_string_functions",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 12) AS prefix,
           upper(substr(source, 1, 4)) AS src_uc,
           concat(lang, '/', source) AS lang_src,
           length(text) AS text_len,
           replace(substr(text, 1, 20), ' ', '_') AS snake,
           CAST(strpos(text, 'data') AS INTEGER) AS data_pos,
           round(CAST(n_chars AS DOUBLE) / 100.0, 2) AS hectochars
    FROM documents WHERE doc_id % 11 = 0
    """,
)
def q40_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (§2.8's 'not present' row — the reference has
    no substring/concat/replace at all; first-class here): substring, upper,
    concat, length, replace, instr, round."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id",
        F.substring("text", 1, 12).alias("prefix"),
        F.upper(F.substring("source", 1, 4)).alias("src_uc"),
        F.concat_ws("/", "lang", "source").alias("lang_src"),
        F.length("text").cast("bigint").alias("text_len"),
        F.regexp_replace(F.substring("text", 1, 20), " ", "_").alias("snake"),
        F.instr("text", "data").alias("data_pos"),
        F.round(F.col("n_chars").cast("double") / 100.0, 2).alias("hectochars"),
    )


@query(
    "q41_edge_weight_normalization",
    oracle="""
    WITH b AS (SELECT DISTINCT user_id AS entity, date_trunc('hour', ts) AS bucket,
                      event_type
               FROM events),
    e0 AS (SELECT a.entity AS src, b2.entity AS dst, COUNT(*) AS weight
           FROM b a JOIN b b2
             ON a.bucket = b2.bucket AND a.event_type = b2.event_type
            AND a.entity < b2.entity
           GROUP BY 1, 2),
    tot AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS total FROM e0 GROUP BY src)
    SELECT e0.src, e0.dst,
           CAST(e0.weight AS DOUBLE) / CAST(t.total AS DOUBLE) AS norm_weight
    FROM e0 JOIN tot t ON e0.src = t.src
    """,
)
def q41_edge_weight_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source edge weight normalization (G4): the reference's
    amount-share weights (``notebooks/4_graphx.ipynb:681-703``), expressed as
    a window sum over ``src`` rather than the reference's agg + self-join —
    the edge lineage (a co-occurrence self-join) is computed once and
    shuffled once instead of twice plus a join. Integer totals divide in
    double: deterministic, value-identical to the agg+join form."""
    from pyspark.sql import Window

    e = cooccurrence_edges(
        load_table(spark, sf_dir, "events"), "user_id", "ts", "hour", ("event_type",)
    )
    total = F.sum("weight").over(Window.partitionBy("src"))
    return e.select(
        "src",
        "dst",
        (F.col("weight").cast("double") / total.cast("double")).alias(
            "norm_weight"
        ),
    )
