"""Scalar-function and remaining-aggregate coverage queries (SURVEY §2.8 F-*
rows, A7 distinct counts, G4 weight normalization)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .graph import cooccurrence_edges
from .functions.deterministic import oracle_davg, oracle_dstddev_samp
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


_CORR_SCALE = 100  # quantization: values -> int cents; see docstring


def _corr_pair(xq, yq):
    """Pearson correlation from EXACT integer moment sums.

    Each value is quantized once (``floor(x*100 + 0.5)`` — a linear map, and
    Pearson correlation is invariant under positive linear maps of either
    variable, so quantization changes the answer only through the one-time
    rounding of each value, identically in both engines). All five moment
    sums accumulate exactly (DECIMAL(38,0) here, HUGEINT in DuckDB —
    sums of squared cents overflow int64 at sf0.1 row counts), so the final
    double arithmetic is a fixed expression over exact integers:
    bit-identical in any engine, any partitioning.
    """
    d = "decimal(38,0)"
    n = F.count("*").cast(d)
    sx, sy = F.sum(xq.cast(d)), F.sum(yq.cast(d))
    sxx = F.sum((xq * xq).cast(d))
    syy = F.sum((yq * yq).cast(d))
    sxy = F.sum((xq * yq).cast(d))
    num = (n * sxy - sx * sy).cast("double")
    den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
        (n * syy - sy * sy).cast("double")
    )
    return num / den


def _corr_oracle_pair(x: str, y: str) -> str:
    qx = f"CAST(floor({x} * {_CORR_SCALE} + 0.5) AS BIGINT)"
    qy = f"CAST(floor({y} * {_CORR_SCALE} + 0.5) AS BIGINT)"
    n = "CAST(COUNT(*) AS HUGEINT)"
    return f"""CAST({n} * SUM(CAST({qx} * {qy} AS HUGEINT))
         - SUM(CAST({qx} AS HUGEINT)) * SUM(CAST({qy} AS HUGEINT)) AS DOUBLE)
      / (sqrt(CAST({n} * SUM(CAST({qx} AS HUGEINT) * CAST({qx} AS HUGEINT))
              - SUM(CAST({qx} AS HUGEINT)) * SUM(CAST({qx} AS HUGEINT)) AS DOUBLE))
         * sqrt(CAST({n} * SUM(CAST({qy} AS HUGEINT) * CAST({qy} AS HUGEINT))
                - SUM(CAST({qy} AS HUGEINT)) * SUM(CAST({qy} AS HUGEINT)) AS DOUBLE)))"""


@query(
    "q85_correlation_matrix",
    oracle=f"""
    SELECT
        {_corr_oracle_pair('l_quantity', 'l_extendedprice')} AS corr_qty_price,
        {_corr_oracle_pair('l_quantity', 'l_discount')} AS corr_qty_disc,
        {_corr_oracle_pair('l_extendedprice', 'l_discount')} AS corr_price_disc
    FROM lineitem
    """,
)
def q85_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem in ONE aggregate pass
    (map-side partial moment sums; the shuffle carries 15 integers total).
    F.corr is a double-accumulation aggregate whose result depends on
    partition order; this formulation quantizes values once and accumulates
    exact integer moments instead, so the correlation is deterministic and
    oracle-checkable bit-for-bit — the describe()-style profiling matrix a
    100 TB pipeline can actually regression-test."""
    li = load_table(spark, sf_dir, "lineitem")
    q = lambda c: F.floor(F.col(c) * _CORR_SCALE + F.lit(0.5)).cast("long")  # noqa: E731
    qty, price, disc = q("l_quantity"), q("l_extendedprice"), q("l_discount")
    return li.agg(
        _corr_pair(qty, price).alias("corr_qty_price"),
        _corr_pair(qty, disc).alias("corr_qty_disc"),
        _corr_pair(price, disc).alias("corr_price_disc"),
    )


@query(
    "q86_value_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               {oracle_davg('value')} AS mu,
               {oracle_dstddev_samp('value')} AS sigma
        FROM events GROUP BY event_type),
    z AS (
        SELECT e.event_type, abs((e.value - s.mu) / s.sigma) AS abs_z
        FROM events e JOIN stats s ON e.event_type = s.event_type)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COALESCE(SUM(CASE WHEN abs_z > 3.0 THEN 1 END), 0) AS BIGINT)
             AS n_outliers,
           MAX(abs_z) AS max_abs_z
    FROM z GROUP BY event_type
    """,
)
def q86_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier census — the data-quality gate run before
    training on any numeric column. Group stats use the exact decimal-sum
    mean/stddev (functions/deterministic.py), so the z-scores — and the
    outlier verdicts at the |z| > 3 boundary — are bit-identical in any
    engine at any partitioning. Stats frame is |groups| rows -> broadcast
    join back onto events; one aggregate pass each way."""
    from .functions.deterministic import davg, dstddev_samp

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        davg("value", "mu"), dstddev_samp("value", "sigma")
    )
    z = ev.join(F.broadcast(stats), "event_type").withColumn(
        "abs_z", F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    )
    return z.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.coalesce(
            F.sum(F.when(F.col("abs_z") > 3.0, 1)), F.lit(0)
        ).cast("long").alias("n_outliers"),
        F.max("abs_z").alias("max_abs_z"),
    )
