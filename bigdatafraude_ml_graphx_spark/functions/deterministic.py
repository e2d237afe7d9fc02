"""Shuffle-order-independent float aggregates.

Summing DOUBLEs in Spark is non-deterministic in the last ulp: partial
aggregation order depends on partitioning, so ``SUM(double)`` can differ
between runs and between engines. The reference never had to care (it eyeballs
notebook output, SURVEY.md §5); this engine is hash-compared against a DuckDB
oracle, so float aggregates are computed EXACTLY:

    double --(deterministic round)--> DECIMAL(p, s) --exact sum--> DOUBLE

Casting a specific double to a decimal is a deterministic per-row operation,
decimal addition is exact and associative, and the final decimal→double cast is
deterministic. The same construction is used in the oracle SQL, so both engines
produce bit-identical results regardless of partitioning — at 100 TB scale this
also means re-running a query yields identical bytes, which matters for
incremental pipelines that hash outputs.

The testdata monetary/quantity columns carry ≤4 decimal digits, so
DECIMAL(28,6) loses nothing and never overflows below ~10^22 row-sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREC = "decimal(28,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact, order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_PREC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_PREC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dstddev_samp(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sample stddev via exact decimal sums of x and x².

    stddev = sqrt((Σx² − (Σx)²/n) / (n−1)). The x→x² square is per-row double
    math (deterministic); both sums are exact decimals.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(_PREC)).cast("double")
    sxx = F.sum((c * c).cast(_PREC)).cast("double")
    out = F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0)))
    return out.alias(alias) if alias else out


def oracle_dsum(expr: str) -> str:
    """DuckDB SQL mirroring :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"


def oracle_davg(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr})"


def oracle_dstddev_samp(expr: str) -> str:
    return (
        f"SQRT((CAST(SUM(CAST((({expr})*({expr})) AS DECIMAL(28,6))) AS DOUBLE)"
        f" - CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)"
        f" * CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}))"
        f" / (COUNT({expr}) - 1))"
    )
