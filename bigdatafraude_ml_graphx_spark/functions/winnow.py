"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

The standard near-copy detection primitive for code/document plagiarism and
training-data overlap auditing: hash every k-gram of a document, slide a
window of ``w`` consecutive k-gram hashes, and keep the MINIMUM hash of each
window. The distinct set of selected minima is the document's fingerprint
set; any shared substring of length ≥ k + w − 1 between two documents
guarantees at least one shared fingerprint.

Engine shape: everything is built-in expressions — ``transform`` +
``slice`` + ``md5`` build the k-gram hash array per row (one pass, no
shuffle), ``posexplode`` emits (pos, hash) pairs, and the window minimum is
a single partition-by-doc window — so the only shuffle is the per-document
repartition the window needs, and at 100 TB each document's gram list stays
inside one task (documents are KB–MB; a task handles thousands).

Hashes are md5 hex strings compared lexicographically — fixed-width hex
compare ≡ numeric compare, and md5 is bit-identical in Spark and DuckDB, so
the fingerprint sets are engine-exact (unlike xxhash64, whose seeds are
JVM-specific).

The reference has no text surface (its string ops stop at CASE labels,
/root/reference/notebooks/2_sql_analysis.ipynb:764-775); this is a
north-star training-pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def kgram_hashes_from_tokens(toks: Column, k: int) -> Column:
    """Array of md5-hex hashes over all k-grams of an ALREADY-MATERIALIZED
    token array column. Empty array when the document has fewer than ``k``
    tokens.

    Hot paths must stage the token array in its own projection (see
    :func:`winnow_fingerprints`): inlining ``tokens(text)`` here makes
    Catalyst re-evaluate the regex tokenization once per produced gram —
    O(tokens²) regex work, observed 40 s vs ~3 s at sf0.1 (the same trap
    documented at ``dedup/ngram.py::word_ngrams``).
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)  # gram start offsets (0-based)
    gram = lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k)))  # noqa: E731
    return F.when(n >= k, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def kgram_hashes(text: Column | str, k: int) -> Column:
    """One-off convenience over raw text — NOT for hot paths (see above)."""
    return kgram_hashes_from_tokens(tokens(text), k)


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 5
) -> DataFrame:
    """Distinct winnowing fingerprints per document → (id, fingerprint).

    Full windows only (the paper's definition): a document with g k-gram
    hashes has g − w + 1 windows; documents with g < w contribute their
    global minimum (degenerate single window over what exists) — that keeps
    every non-trivial document represented, matching the paper's guarantee
    that any document with at least one k-gram has at least one fingerprint.

    Selection = MIN over each window; the DISTINCT of the per-window minima
    is exactly the winnowing fingerprint set. Ties (identical hash values in
    one window) are irrelevant: MIN is value-based, both engines agree.
    """
    # Stage the token array in its own projection; the generator in the
    # next select stops Catalyst's CollapseProject from re-inlining the
    # tokenize regex into every gram (O(tokens²) — see kgram_hashes_from_tokens).
    grams = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col,
        F.posexplode(kgram_hashes_from_tokens(F.col("_toks"), k)).alias(
            "pos", "gh"
        ),
    )
    part = Window.partitionBy(id_col)
    win = part.orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("n_grams", F.count("*").over(part))
        .withColumn("win_min", F.min("gh").over(win))
        # full windows start at pos ≤ n_grams − w; short docs keep pos 0
        .filter((F.col("pos") <= F.col("n_grams") - w) | (F.col("pos") == 0))
        .select(F.col(id_col), F.col("win_min").alias("fingerprint"))
        .distinct()
    )


def oracle_winnow_sql(k: int, w: int, source: str = "documents") -> str:
    """DuckDB SQL computing the identical fingerprint set."""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(regexp_replace(
                 lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'), ' '),
                 t -> t <> '') AS tk
      FROM {source}
    ), grams AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(tk[i : i + {k} - 1], ' ')) AS gh
      FROM toks, UNNEST(range(1, len(tk) - {k} + 2)) AS u(i)
      WHERE len(tk) >= {k}
    ), winmin AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
             MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS win_min
      FROM grams
    )
    SELECT DISTINCT doc_id, win_min AS fingerprint
    FROM winmin
    WHERE pos <= n_grams - {w} OR pos = 0
    """
