"""Token-window document chunking — the packing step of a training-data
pipeline: long documents become fixed-size token chunks (the unit a trainer
consumes), short documents pass through as a single chunk.

Shape: tokenize once (staged projection — see dedup/ngram.word_ngrams for why
inlining the tokenizer into a lambda is O(tokens²)), manufacture chunk ids
with ``sequence`` + ``explode`` (JVM-side, no UDF), slice the token array per
chunk. Row growth is bounded by total_tokens/chunk_tokens; nothing shuffles —
the whole operator is a narrow per-row transform, embarrassingly parallel at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
) -> DataFrame:
    """Split each document into ``chunk_tokens``-token chunks.

    Returns ``(doc, chunk_id, n_chunk_tokens, chunk_text)``; ``chunk_id`` is
    0-based and contiguous per doc. Documents with zero tokens produce zero
    chunks (there is nothing to pack).
    """
    k = chunk_tokens
    staged = df.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    exploded = staged.filter(F.col("_n") > 0).select(
        "doc",
        "_toks",
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.ceil(F.col("_n") / k).cast("long") - 1)
        ).alias("chunk_id"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_id") * k + 1, k)
    return exploded.select(
        "doc",
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def oracle_chunk_sql(chunk_tokens: int, norm_sql: str) -> str:
    """DuckDB SQL mirroring :func:`chunk_documents` over ``documents``.
    DuckDB list slices (1-based, inclusive, clamped) match Spark's
    ``slice(arr, start, length)`` when written ``arr[s : s+k-1]``."""
    k = chunk_tokens
    toks = f"list_filter(string_split({norm_sql}, ' '), x -> x != '')"
    return f"""
    WITH d AS (SELECT doc_id AS doc, {toks} AS toks FROM documents),
    c AS (SELECT doc, toks, len(toks) AS n,
                 unnest(range(0, CAST(ceil(len(toks) / {k}.0) AS BIGINT)))
                 AS chunk_id
          FROM d WHERE len(toks) > 0)
    SELECT doc,
           chunk_id,
           len(toks[chunk_id * {k} + 1 : chunk_id * {k} + {k}])
             AS n_chunk_tokens,
           array_to_string(toks[chunk_id * {k} + 1 : chunk_id * {k} + {k}], ' ')
             AS chunk_text
    FROM c
    """
