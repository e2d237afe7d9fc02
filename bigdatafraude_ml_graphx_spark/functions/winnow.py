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


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 100_000,
) -> DataFrame:
    """MOSS-style overlap detection: document pairs sharing ≥ ``min_shared``
    winnowing fingerprints, scored by containment
    ``shared / min(|A|, |B|)`` — the end use of :func:`winnow_fingerprints`.

    Inverted-index shape (same discipline as ``dedup.ngram_jaccard_pairs``):
    self-join on the FINGERPRINT (equi, AQE-skew-splittable), never the
    O(N²) document cross product; only pairs sharing a fingerprint ever
    materialize, and winnowing has already thinned fingerprints to ~2/w of
    the gram count, so the index is ~w/2× smaller than raw-shingle joins.

    HOT-FINGERPRINT CAP: fingerprints present in more than ``max_df``
    documents are dropped from the JOIN INPUT (``skew.drop_hot_buckets``,
    the guard every other banded family carries) — a fingerprint shared
    by B docs emits B·(B−1)/2 pairs, and a fingerprint every document
    contains (license boilerplate) has no discriminating power: MOSS
    itself culls high-document-frequency fingerprints for exactly this
    reason. Per-doc fingerprint SIZES (the containment denominator) are
    computed from the UNCAPPED set, so containment keeps its definition;
    pairs whose shared count includes a dropped fingerprint report fewer
    shared prints — below the cap the output is identical to the
    uncapped operator (tests/test_corpus_round4.py).

    EAGER + NON-RECOVERABLE: the small pair result is ``localCheckpoint``-ed
    so the shared fingerprint frame can be unpersisted before returning.
    """
    from ..operators.skew import drop_hot_buckets

    fp = winnow_fingerprints(df, id_col, text_col, k=k, w=w).persist()
    sizes = fp.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    capped = drop_hot_buckets(fp, ["fingerprint"], max_df)
    a = capped.select(F.col(id_col).alias("doc_a"), "fingerprint")
    b = capped.select(F.col(id_col).alias("doc_b"), "fingerprint")
    shared = (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_fp").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_fp").alias("nb"))
    pairs = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment",
            F.col("shared").cast("double") / F.least("na", "nb").cast("double"),
        )
        .select("doc_a", "doc_b", "shared", "containment")
        .localCheckpoint(eager=True)
    )
    fp.unpersist()
    return pairs


def oracle_winnow_overlap_sql(
    k: int, w: int, min_shared: int, max_df: int = 100_000
) -> str:
    """DuckDB mirror of :func:`winnow_overlap_pairs` — INCLUDING the
    hot-fingerprint cap (ADVICE r5 item 2): the join input drops
    fingerprints above ``max_df`` document frequency exactly like the
    engine's ``drop_hot_buckets``, while sizes stay uncapped (the
    containment denominator keeps its definition)."""
    inner = oracle_winnow_sql(k, w)
    return f"""
    WITH fp AS ({inner}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id),
    fpc AS (
      SELECT fp.* FROM fp
      JOIN (SELECT fingerprint FROM fp GROUP BY fingerprint
            HAVING COUNT(*) <= {max_df}) ok USING (fingerprint)),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      FROM fpc a JOIN fpc b
        ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= {min_shared})
    SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
           CAST(shared AS DOUBLE) / CAST(LEAST(sa.n_fp, sb.n_fp) AS DOUBLE)
             AS containment
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    """
