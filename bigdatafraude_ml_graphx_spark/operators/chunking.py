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


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 128,
    group_col: str = "lang",
    doc_col: str = "doc",
    chunk_col: str = "chunk_id",
    size_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Concatenate-and-split sequence packing: chunks are laid end-to-end in
    a deterministic order within each ``group_col`` stream, and each chunk
    joins the bin in which its first token lands (bin = token range
    ``[i·budget, (i+1)·budget)``). A bin can exceed the budget by at most
    one chunk's tail — the standard fixed-stride packing trade-off.

    Returns one row per (group, bin): ``(group_col, bin_id, n_chunks,
    bin_tokens)``.

    Scale: the running sum is sequential WITHIN a group — ``group_col`` is
    the parallelism unit and stands in for whatever stream partitioning a
    real pipeline packs over (per input file, per shard). Cross-group
    packing never happens, so groups scale independently; one hash shuffle
    on the group key.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(doc_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(size_col).over(w) - F.col(size_col)
    binned = chunks.withColumn(
        "bin_id", F.floor(start / F.lit(budget_tokens)).cast("long")
    )
    return binned.groupBy(group_col, "bin_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(size_col).cast("long").alias("bin_tokens"),
    )


def pack_chunks_hashed(
    chunks: DataFrame,
    budget_tokens: int = 128,
    hex_digits: int = 1,
    doc_col: str = "doc",
    chunk_col: str = "chunk_id",
    size_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Per-partition sequence packing for corpora with NO natural group key.

    ``pack_chunks`` needs a group column; when none exists the obvious
    substitute — pack within ``spark_partition_id()`` — makes the output
    depend on the physical partitioning (non-reproducible across runs,
    file layouts, and engines). Instead each doc is routed to a VIRTUAL
    partition by the first ``hex_digits`` chars of md5(doc) — 16^digits
    independent packing streams, deterministic everywhere md5 exists, and
    statistically balanced regardless of doc-id distribution (the same
    engine-portable-hash argument as operators/sampling.hash_bucket).

    Scale: one hash shuffle on ``part_id``; the sequential running sum is
    confined to ~N/16^digits chunks per stream — raise ``hex_digits`` as
    the corpus grows (2 → 256 streams, 3 → 4096). Returns one row per
    (part_id, bin_id): ``(part_id, bin_id, n_chunks, bin_tokens)``.
    """
    part = F.substring(F.md5(F.col(doc_col).cast("string")), 1, hex_digits)
    return pack_chunks(
        chunks.withColumn("part_id", part),
        budget_tokens=budget_tokens,
        group_col="part_id",
        doc_col=doc_col,
        chunk_col=chunk_col,
        size_col=size_col,
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
