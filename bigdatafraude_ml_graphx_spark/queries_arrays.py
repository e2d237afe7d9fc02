"""Higher-order array-function queries over the embeddings table.

The engine's similarity operators use ``F.aggregate``/``F.zip_with``
internally (``similarity/cosine.py``); this declares the higher-order-function
surface itself as a judged, oracle-checked query. Determinism: each float is
widened to double (exact), squared in double (single IEEE op), cast to
DECIMAL (deterministic), and summed exactly — the same left-fold the oracle's
``list_transform`` + ``list_sum`` performs, so norms are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import query

_DEC = "decimal(28,12)"


@query(
    "q58_array_norms",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC})))
                AS DOUBLE) AS sq_norm
    FROM embeddings
    WHERE vec_id % 13 = 0
    """,
)
def q58_array_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array size / positional access / lambda fold (F10 generalized beyond
    the reference's ``features_array[29]`` at
    ``notebooks/2_sql_analysis.ipynb:156,197,501``). The fold is JVM-side
    whole-stage-codegen — no UDF, no shuffle before the final projection."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 13 == 0)
    x2 = lambda x: (x.cast("double") * x.cast("double")).cast(_DEC)  # noqa: E731
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.col("embedding")[0].cast("double").alias("first_component"),
        # decimal + decimal widens precision by 1; cast back so the fold's
        # accumulator type stays fixed (exact — the running sum fits 28,12)
        F.aggregate(
            "embedding", F.lit(0).cast(_DEC), lambda acc, x: (acc + x2(x)).cast(_DEC)
        )
        .cast("double")
        .alias("sq_norm"),
    )


@query(
    "q66_map_functions",
    oracle="""
    SELECT source,
           CAST(COALESCE(SUM(CASE WHEN lang = 'en' THEN 1 END), 0) AS BIGINT)
             AS en_docs,
           CAST(COALESCE(SUM(CASE WHEN lang = 'zh' THEN 1 END), 0) AS BIGINT)
             AS zh_docs,
           CAST(COUNT(DISTINCT lang) AS INTEGER) AS n_langs
    FROM documents
    GROUP BY source
    """,
)
def q66_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns (absent from the reference, SURVEY §2.8): per-source
    language histogram materialized as a ``map<string,bigint>`` via
    ``map_from_entries(collect_list(struct))``, then key lookups with
    ``element_at`` and cardinality with ``size``. The map is built from an
    already-aggregated (source, lang) frame — |sources|·|langs| entries, so
    collect_list state stays tiny however large the corpus. Oracle states the
    same facts relationally (conditional sums + distinct count)."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source", "lang").agg(F.count("*").alias("n"))
    m = per.groupBy("source").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "n"))).alias("lang_map")
    )
    return m.select(
        "source",
        F.coalesce(F.element_at("lang_map", F.lit("en")), F.lit(0))
        .cast("bigint")
        .alias("en_docs"),
        F.coalesce(F.element_at("lang_map", F.lit("zh")), F.lit(0))
        .cast("bigint")
        .alias("zh_docs"),
        F.size("lang_map").alias("n_langs"),
    )
