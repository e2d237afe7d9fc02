"""Hierarchical rollup and deterministic-sampling queries (hypertable-style
continuous aggregates and hash sampling — training-pipeline staples absent
from the reference, whose only time bucketing is ``Time/3600`` at
``notebooks/4_graphx.ipynb:200``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.deterministic import dsum, oracle_dsum
from .operators.rollup import hierarchical_rollup
from .operators.sampling import (
    hash_sample,
    oracle_hash_sample_predicate,
    oracle_stratified_sample_predicate,
    stratified_hash_sample,
)
from .queries import query


@query(
    "q54_hierarchical_rollup",
    oracle=f"""
    SELECT 'hour' AS level, event_type, date_trunc('hour', ts) AS bucket_start,
           COUNT(*) AS n, {oracle_dsum('value')} AS value_sum,
           MIN(value) AS value_min, MAX(value) AS value_max
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    UNION ALL
    SELECT 'day', event_type, date_trunc('day', ts),
           COUNT(*), {oracle_dsum('value')}, MIN(value), MAX(value)
    FROM events GROUP BY event_type, date_trunc('day', ts)
    """,
)
def q54_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day rollups of event values per type; the day level is derived
    from the hour partials (one raw scan total), yet bit-matches an oracle
    that aggregates raw rows at both levels — the mergeable-aggregate
    guarantee of ``operators/rollup.py``."""
    ev = load_table(spark, sf_dir, "events")
    return hierarchical_rollup(
        ev, ts_col="ts", key_cols=["event_type"], value_col="value",
        levels=["hour", "day"],
    )


_SAMPLE_KEYS = ["l_orderkey", "l_linenumber"]
_SAMPLE_MAX_HEX = "1800"  # 0x1800/0x10000 = 9.375% of keys


@query(
    "q55_hash_sample",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           {oracle_dsum('l_extendedprice')} AS sampled_price
    FROM lineitem
    WHERE {oracle_hash_sample_predicate(_SAMPLE_KEYS, _SAMPLE_MAX_HEX)}
    GROUP BY l_returnflag
    """,
)
def q55_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~9.4% hash sample of lineitem, aggregated per returnflag.

    Unlike ``df.sample``, the same keys are selected on every engine and every
    run (md5-prefix predicate) — a pure filter, no shuffle beyond the final
    tiny aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    sampled = hash_sample(li, _SAMPLE_KEYS, _SAMPLE_MAX_HEX)
    return sampled.groupBy("l_returnflag").agg(
        F.count("*").alias("n_sampled"),
        dsum(F.col("l_extendedprice"), "sampled_price"),
    )


_STRATA_RATES = {"en": "4000", "zh": "8000"}  # 25% of en keys, 50% of zh, rest kept


@query(
    "q65_stratified_sample",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {oracle_stratified_sample_predicate(['doc_id'], 'lang', _STRATA_RATES)}
    GROUP BY lang
    """,
)
def q65_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus rebalancing: per-language deterministic hash-sample
    rates (downsample the dominant language, keep the tail) — the standard
    training-mix op. Still a pure per-row filter: no shuffle until the final
    tiny per-language aggregation, and the per-key decision is reproducible
    across engines/runs/backfills (md5 prefix, not ``sampleBy``)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(docs, ["doc_id"], "lang", _STRATA_RATES)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "q87_weighted_sample",
    oracle="""
    WITH src AS (
        SELECT l_returnflag, l_orderkey, l_linenumber,
               CAST(l_quantity AS INTEGER) AS w
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'),
    drawn AS (
        SELECT l_returnflag, l_orderkey, l_linenumber, w,
               md5('ws:' || l_returnflag || '|'
                   || CAST(l_orderkey AS VARCHAR) || '|'
                   || CAST(l_linenumber AS VARCHAR) || ':'
                   || CAST(rep AS VARCHAR)) AS draw
        FROM src, unnest(range(1, w + 1)) AS t(rep)),
    pri AS (
        SELECT l_returnflag, l_orderkey, l_linenumber,
               MIN(draw) AS priority, MIN(w) AS w
        FROM drawn GROUP BY 1, 2, 3),
    ranked AS (
        SELECT l_returnflag, l_orderkey, l_linenumber, w, priority,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY priority) AS sample_rank
        FROM pri)
    SELECT l_returnflag, l_orderkey, l_linenumber, w,
           CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked WHERE sample_rank <= 5
    """,
)
def q87_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sampling without replacement, 5 rows per return flag,
    weight = quantity, over one ship month — the explode costs sum-of-weights
    rows, so the demo bounds its slice; the operator itself is
    slice-agnostic (operators/sampling.py::weighted_sample_topk). Each
    row races with `weight` replicated md5 draws and the minimum wins —
    P(a beats b) = w_a/(w_a+w_b), i.e. Efraimidis-Spirakis semantics with no
    floating pow, so the sampled set itself is bit-identical across
    engines."""
    from .operators.sampling import weighted_sample_topk

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-03-01")
        & (F.col("l_shipdate") < "1995-04-01")
    ).select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("w"),
    )
    out = weighted_sample_topk(
        li,
        key_cols=["l_orderkey", "l_linenumber"],
        weight_col="w",
        k=5,
        group_cols=["l_returnflag"],
    )
    return out.select(
        "l_returnflag", "l_orderkey", "l_linenumber", "w", "sample_rank"
    )


@query(
    "q124_corpus_mixture",
    oracle="""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    mc AS (SELECT MIN(n) AS m FROM counts),
    thr AS (
      SELECT source,
             CAST(FLOOR(CAST((SELECT m FROM mc) AS DOUBLE)
                        * 1152921504606846976.0
                        / CAST(n AS DOUBLE)) AS BIGINT) AS t
      FROM counts)
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(d.doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(d.doc_id) AS BIGINT) AS max_doc
    FROM documents d JOIN thr ON d.source = thr.source
    WHERE CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) < thr.t
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q124_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform corpus-mixture downsampling (`operators/sampling.py::
    mixture_sample`): every source contributes ~min-source-count documents,
    selected by a deterministic per-key hash threshold — the source/language
    balancing step before LLM training. The oracle recomputes the identical
    thresholds and membership; outputs per-source kept counts + id bounds
    so the gate certifies the exact membership, not just sizes."""
    from .operators.sampling import mixture_sample

    d = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(d, key_col="doc_id", group_col="source")
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )
