"""TF-IDF keyword extraction over the canonical tokenization.

A corpus-preparation staple the reference lacks entirely (its only string ops
are CASE labels, ``/root/reference/notebooks/2_sql_analysis.ipynb:764-775``):
rank each document's terms by term-frequency × corpus rarity, keeping the
top-k as the document's keywords.

Engine-portable determinism: the usual ``log(N/df)`` idf is NOT used because
transcendental functions are not guaranteed bit-identical across engines.
Instead the idf factor is the raw rarity ratio ``N/df`` — every arithmetic
step (int→double cast, multiply, divide) is IEEE-754 exactly rounded, so
Spark and any SQL oracle produce bit-identical scores. Ranking by
``tf·N/df`` orders identically to ``tf·log(N/df)`` within a document
whenever tf ties are broken by the same term order (both are monotone in
``tf`` and in ``1/df``); the frozen contract is the ratio form.

Scale shape: tokenize once (staged array column), explode, ONE hash
aggregation to (doc, term, tf), then df as a count window over the term —
not a separate per-term aggregate joined back, which would re-execute the
whole tokenize→explode→aggregate lineage a second time (observed: two full
scans of the corpus and 5 Exchanges; the window form scans once with 3).
The text itself never shuffles — only (doc_id, term) pairs. df could be
sketched (count-min) at extreme cardinality; exact counts are kept because
the term dictionary is ≪ corpus size. N comes from a count-star over the
corpus — a parquet-footer-only scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by ``tf * (N / df)``.

    Returns ``(id_col, term, tf, df, score, term_rank)``; ties on score break
    alphabetically on the term, so the result is fully deterministic.
    """
    staged = docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
    tf = (
        staged.select(id_col, F.explode("__toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = docs.select(F.count("*").alias("__n"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf").cast("double") * F.col("__n").cast("double"))
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "term_rank")
    )
