"""Text-analysis primitives for large-scale document pipelines.

These are north-star operators (BASELINE.json): the reference has no text
surface at all (its only string ops are CASE labels,
``/root/reference/notebooks/2_sql_analysis.ipynb:764-775``), but a 100 TB
training-data pipeline needs language-ID, quality scoring, token counting and
fingerprinting as first-class, shuffle-free column expressions.

Everything here is built from JVM-side ``pyspark.sql.functions`` — no Python
UDFs in the hot path — and every transformation has an exact DuckDB-SQL mirror
(see ``queries_text.py``) so results are engine-identical. Tokenization is
pinned to a single normalization: lower → strip non-[a-z0-9 ] → collapse
spaces → split on single space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit language
# heuristic. Deliberately small and frozen: they are part of the engine's
# deterministic contract (the oracle SQL embeds the same lists).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
}


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization: lower, strip punctuation, collapse
    whitespace. The single normalization every downstream op shares."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    return F.regexp_replace(c, " +", " ")


def tokens(col: Column | str) -> Column:
    """Token array over normalized text (empty tokens removed)."""
    return F.filter(F.split(normalize_text(col), " "), lambda x: x != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space — a core
    quality-score signal."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(0.0)


def stopword_hits_from_tokens(toks: Column, lang: str) -> Column:
    """Stopword hit count from an already-materialized token array column.

    Hot paths must pass a STAGED token column: inlining ``tokens(col)`` into
    the filter lambda makes Catalyst re-run the regex tokenization per
    reference (see dedup/ngram.py word_ngrams note)."""
    words = list(STOPWORDS[lang])
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    return stopword_hits_from_tokens(tokens(col), lang)


def lang_guess_from_tokens(toks: Column) -> Column:
    """Argmax language over stopword hit counts; ties break alphabetically
    (de < en < es < fr); zero hits everywhere → 'unknown'."""
    hits = {lang: stopword_hits_from_tokens(toks, lang) for lang in sorted(STOPWORDS)}
    best = None
    for lang in sorted(STOPWORDS):  # alphabetical → first strict max wins
        cond = hits[lang]
        if best is None:
            best = (F.lit(lang), cond)
            continue
        name, score = best
        best = (
            F.when(cond > score, F.lit(lang)).otherwise(name),
            F.when(cond > score, cond).otherwise(score),
        )
    name, score = best
    return F.when(score > 0, name).otherwise(F.lit("unknown"))


def lang_guess(col: Column | str) -> Column:
    return lang_guess_from_tokens(tokens(col))


def quality_score_from_tokens(text: Column, toks: Column) -> Column:
    """Quality score from a staged token column (hot-path variant)."""
    nt = F.size(toks).cast("double")
    pr = punct_ratio(text)
    sw = sum(
        (stopword_hits_from_tokens(toks, lang) for lang in sorted(STOPWORDS)),
        F.lit(0),
    ).cast("double")
    return (
        0.4 * F.least(nt / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(4.0 * pr, F.lit(1.0)))
        + 0.3 * F.least(sw / 5.0, F.lit(1.0))
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality score: length band + low punctuation +
    stopword presence. Frozen formula (mirrored in the oracle SQL):

        0.4·min(n_tokens/50, 1) + 0.3·(1 − min(4·punct_ratio, 1))
        + 0.3·min(stopword_total/5, 1)
    """
    c = F.col(col) if isinstance(col, str) else col
    return quality_score_from_tokens(c, tokens(c))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Identical in any engine with md5 — the exact-dedup / caching key."""
    return F.md5(normalize_text(col))
