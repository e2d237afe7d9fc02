"""Benchmark-contamination detection: which corpus documents overlap an
evaluation set's n-grams?

Standard practice before training (GPT-3 appendix C; The Pile §6): any
training document sharing enough n-grams with a benchmark document is
flagged/removed so eval scores stay honest. Structurally this is the
inverted-index join from ``ngram_jaccard_pairs`` with an ASYMMETRIC build
side: the eval set is small (thousands of docs), the corpus is the 100 TB
side — so the eval shingle table BROADCASTS and the corpus is never
shuffled at all; each corpus partition streams past the broadcast hash map
and emits only its hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import _doc_shingles


def contamination_overlap(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 2,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing ≥ ``min_shared`` distinct word ``n``-grams
    with any eval doc. Returns ``(doc, eval_doc, n_shared, overlap_frac)``
    where ``overlap_frac`` = shared / |eval doc's shingles| (the fraction of
    the BENCHMARK text found in the training doc — the direction that
    matters for leakage).

    Set ``broadcast_eval=False`` only if the eval set itself is huge; the
    join then degrades gracefully to a shuffled equi join on the shingle.
    """
    corpus_sh = _doc_shingles(corpus, text_col, id_col, n)
    # The eval shingle frame feeds both the overlap join and the per-doc
    # size aggregate; bare, the second consumer replays the eval-set scan
    # and re-shingles (replay audit: 3 corpus opens for q70 where 2 are
    # legitimate). It is bounded by the eval set — small enough to
    # broadcast below, so certainly small enough to checkpoint once.
    eval_sh = (
        _doc_shingles(eval_set, text_col, id_col, n)
        .withColumnRenamed("doc", "eval_doc")
        .localCheckpoint(eager=True)
    )
    eval_sizes = eval_sh.groupBy("eval_doc").agg(
        F.count("*").alias("_eval_n")
    )
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
        eval_sizes = F.broadcast(eval_sizes)

    shared = (
        corpus_sh.join(eval_sh, "shingle")
        .filter(F.col("doc") != F.col("eval_doc"))
        .groupBy("doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.join(eval_sizes, "eval_doc").select(
        "doc",
        "eval_doc",
        "n_shared",
        (F.col("n_shared") / F.col("_eval_n")).alias("overlap_frac"),
    )
