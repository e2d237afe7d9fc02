"""PII detection/redaction — the scrubbing pass of a training-data pipeline.

Patterns are deliberately written in the regex subset where Java (Spark) and
RE2 (DuckDB) agree — character classes, bounded repetition, alternation; no
backreferences or lookaround — so the oracle can verify redaction
bit-for-bit. Each redactor is a pure per-row column expression: no UDF, no
shuffle, runs inside whole-stage codegen at any scale.

The pattern set is a pipeline floor (emails, long digit runs, phone-ish
groups), not a compliance product; real deployments extend ``PII_PATTERNS``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> (pattern, replacement). Order matters: emails first so their digit
# fragments aren't partially consumed by the digit-run rule.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
    ("digits", r"[0-9]{6,}", "<NUM>"),
)


def redact_pii(col: Column | str) -> Column:
    """Apply every PII pattern in order; returns the scrubbed text."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_hits(col: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (cascaded like :func:`redact_pii`, so a
    string consumed by an earlier pattern is not double-counted)."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for name, pattern, repl in PII_PATTERNS:
        out[name] = F.regexp_count(c, F.lit(pattern))
        c = F.regexp_replace(c, pattern, repl)
    return out


def oracle_redact_sql(expr: str) -> str:
    """DuckDB expression mirroring :func:`redact_pii` over ``expr``."""
    # DuckDB standard single-quoted literals pass backslashes through
    # verbatim, and no pattern contains a quote — embed directly.
    for _, pattern, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    return expr


def oracle_hits_sql(expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`pii_hits`."""
    out: dict[str, str] = {}
    for name, pattern, repl in PII_PATTERNS:
        out[name] = f"len(regexp_extract_all({expr}, '{pattern}'))"
        expr = f"regexp_replace({expr}, '{pattern}', '{repl}', 'g')"
    return out
