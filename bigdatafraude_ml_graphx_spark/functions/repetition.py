"""Gopher/C4-style repetition quality metrics for training-data filtering.

The published heuristics (Rae et al. 2021 "Scaling Language Models" §A1.1;
Raffel et al. 2020 C4) filter documents dominated by repeated content:
a document whose single most frequent word covers a large token share, or
whose bigrams are mostly duplicates, is boilerplate/spam with near-zero
training value. These are the standard corpus filters the reference never
needed (its data is tabular) but a 100 TB text pipeline cannot ship without.

Shape: explode tokens → count per (doc, token) → per-doc aggregate. Two
shuffles keyed on the doc id — and with the documents table stored BUCKETED
by doc id, both collapse into map-side aggregation with zero Exchange
(proven pattern: tests/test_plans.py::test_minhash_agg_no_exchange_on_bucketed_docs).
Per-row higher-order-function alternatives exist but are not portable to the
DuckDB oracle; the exploded formulation is bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.ngram import ngrams_from_tokens
from .text import tokens


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_token_frac: float = 0.2,
    min_distinct_ratio: float = 0.3,
    max_dup_bigram_frac: float = 0.3,
) -> DataFrame:
    """Per-document repetition metrics + a ``keep`` verdict.

    Returns ``(doc, n_tokens, distinct_ratio, top_token_frac,
    dup_bigram_frac, keep)``. Empty documents are kept in the output with
    zero tokens and ``keep = false`` (nothing to train on).

    * ``distinct_ratio``  — distinct tokens / total tokens (low → repetitive)
    * ``top_token_frac``  — share of the single most frequent token
    * ``dup_bigram_frac`` — 1 − distinct bigrams / total bigrams
    """
    base = df.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("_toks")
    )

    tok_counts = (
        base.select("doc", F.explode("_toks").alias("tok"))
        .groupBy("doc", "tok")
        .agg(F.count("*").alias("c"))
    )
    uni = tok_counts.groupBy("doc").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_count"),
    )

    bg_counts = (
        base.select(
            "doc", F.explode(ngrams_from_tokens(F.col("_toks"), 2)).alias("bg")
        )
        .groupBy("doc", "bg")
        .agg(F.count("*").alias("c"))
    )
    bg = bg_counts.groupBy("doc").agg(
        F.sum("c").alias("n_bigrams"),
        F.count("*").alias("n_distinct_bigrams"),
    )

    # Left joins from the full doc list keep empty/1-token docs in the output.
    out = (
        base.select("doc")
        .join(uni, "doc", "left")
        .join(bg, "doc", "left")
        .select(
            "doc",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.when(
                F.col("n_tokens") > 0, F.col("n_distinct") / F.col("n_tokens")
            )
            .otherwise(0.0)
            .alias("distinct_ratio"),
            F.when(
                F.col("n_tokens") > 0, F.col("top_count") / F.col("n_tokens")
            )
            .otherwise(0.0)
            .alias("top_token_frac"),
            F.when(
                F.col("n_bigrams") > 0,
                1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams"),
            )
            .otherwise(0.0)
            .alias("dup_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("n_tokens") > 0)
            & (F.col("top_token_frac") <= max_top_token_frac)
            & (F.col("distinct_ratio") >= min_distinct_ratio)
            & (F.col("dup_bigram_frac") <= max_dup_bigram_frac),
        )
    )
    return out


def oracle_repetition_sql(
    max_top_token_frac: float = 0.2,
    min_distinct_ratio: float = 0.3,
    max_dup_bigram_frac: float = 0.3,
    norm_sql: str | None = None,
) -> str:
    """DuckDB SQL mirroring :func:`repetition_metrics` over ``documents``.

    ``norm_sql`` is the shared normalization fragment (queries_text._NORM);
    both engines tokenize identically, so ratios match bit-for-bit (each is
    a single int/int double division)."""
    toks = (
        f"list_filter(string_split({norm_sql}, ' '), x -> x != '')"
    )
    return f"""
    WITH d AS (SELECT doc_id AS doc, {toks} AS toks FROM documents),
    ex AS (SELECT doc, unnest(toks) AS tok FROM d),
    tc AS (SELECT doc, tok, COUNT(*) AS c FROM ex GROUP BY doc, tok),
    uni AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   COUNT(*) AS n_distinct, MAX(c) AS top_count
            FROM tc GROUP BY doc),
    bgx AS (SELECT doc,
                   unnest(list_transform(range(1, greatest(len(toks), 1)),
                                         i -> array_to_string(toks[i:i+1], ' ')))
                   AS bg
            FROM d WHERE len(toks) >= 2),
    bc AS (SELECT doc, bg, COUNT(*) AS c FROM bgx GROUP BY doc, bg),
    big AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                   COUNT(*) AS n_distinct_bigrams
            FROM bc GROUP BY doc)
    SELECT d.doc,
           COALESCE(uni.n_tokens, 0) AS n_tokens,
           CASE WHEN uni.n_tokens > 0
                THEN CAST(uni.n_distinct AS DOUBLE) / uni.n_tokens
                ELSE 0.0 END AS distinct_ratio,
           CASE WHEN uni.n_tokens > 0
                THEN CAST(uni.top_count AS DOUBLE) / uni.n_tokens
                ELSE 0.0 END AS top_token_frac,
           CASE WHEN big.n_bigrams > 0
                THEN 1.0 - CAST(big.n_distinct_bigrams AS DOUBLE) / big.n_bigrams
                ELSE 0.0 END AS dup_bigram_frac,
           (COALESCE(uni.n_tokens, 0) > 0
            AND CASE WHEN uni.n_tokens > 0
                     THEN CAST(uni.top_count AS DOUBLE) / uni.n_tokens
                     ELSE 0.0 END <= {max_top_token_frac}
            AND CASE WHEN uni.n_tokens > 0
                     THEN CAST(uni.n_distinct AS DOUBLE) / uni.n_tokens
                     ELSE 0.0 END >= {min_distinct_ratio}
            AND CASE WHEN big.n_bigrams > 0
                     THEN 1.0 - CAST(big.n_distinct_bigrams AS DOUBLE) / big.n_bigrams
                     ELSE 0.0 END <= {max_dup_bigram_frac}) AS keep
    FROM d
    LEFT JOIN uni USING (doc)
    LEFT JOIN big USING (doc)
    """
