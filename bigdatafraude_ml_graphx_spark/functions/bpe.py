"""Byte-pair-encoding merge iteration — the LLM-tokenizer-prep primitive
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units").

BPE trains on the DISTINCT-WORD table weighted by frequency, never the raw
corpus: pair counting is |vocab| · avg_word_len rows per round (millions at
100 TB — trivially shuffle-able), while the corpus itself is scanned exactly
once to build the frequency table. Each round is (a) a vocabulary-bounded
pair count, (b) a 1-row argmax collect (the bounded scalar-coordination
read every iterative operator in this engine documents), and (c) a narrow
string rewrite of the vocabulary — no corpus re-scan, no growing lineage
(the word table is localCheckpoint-ed once; 2–3 fixed rounds replay a
1-deep narrow transform, per the fixed-small-round checkpoint rule).

Symbol sequences are encoded as DOUBLE-SPACE-joined strings
(``"  a  b  c  "``): a merge of pair (a, b) is then one literal
``replace(seq, ' a  b ', ' ab ')`` — the single-space margins keep every
non-overlapping occurrence matchable (a single-space encoding loses the
second of two adjacent occurrences because the first match consumes the
shared separator), and left-to-right non-overlapping ``replace`` semantics
are identical in Spark and DuckDB, which is what makes the unrolled SQL
oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` over whitespace tokens matching ``^[a-z]+$`` — the
    one corpus scan BPE training needs. Token arrays are staged in their
    own projection before the generator (the transform-lambda regex trap:
    inlining the split re-evaluates it per element)."""
    toks = docs.select(F.split(F.col(text_col), " ").alias("toks"))
    return (
        toks.select(F.explode("toks").alias("word"))
        .filter(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_merges(words: DataFrame, rounds: int) -> list[tuple]:
    """Run ``rounds`` greedy BPE merges over a ``(word, freq)`` table.

    Returns ``[(round, a, b, merged, merge_count), ...]`` — the merge
    history, which IS a BPE tokenizer (applying the merges in order
    reproduces the segmentation). Ties on count break by (a, b) string
    order so the argmax is deterministic on any engine.
    """
    corpus = words.select(
        F.concat(
            F.lit("  "), F.regexp_replace("word", "(.)", "$1  ")
        ).alias("seq"),
        "freq",
    ).localCheckpoint(eager=True)  # read `rounds` times; vocab-sized

    merges: list[tuple] = []
    for r in range(1, rounds + 1):
        staged = corpus.select(
            F.split(F.trim(F.col("seq")), "  ").alias("l"), "freq"
        ).filter(F.size("l") > 1)
        # NOTE: guard size > 1 BEFORE sequence(): Spark's sequence(1, 0)
        # generates a DESCENDING [1, 0], not an empty array.
        pairs = staged.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(l) - 1),"
                    " i -> struct(l[i-1] AS a, l[i] AS b))"
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged before the round budget
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((r, a, b, a + b, cnt))
        corpus = corpus.withColumn(
            "seq",
            F.replace(
                F.col("seq"), F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
            ),
        )
    return merges
