"""Scalar quantization of embedding vectors (vector compression).

Per-vector min/max scalar quantization to ``2**bits − 1`` integer levels —
the standard 4× (float32→int8) memory/IO reduction for large ANN corpora.
Everything is JVM-side higher-order array functions (``transform`` /
``array_min`` / ``array_max``): no UDF, no shuffle — a pure projection that
composes with the IVF layout in :mod:`.ivf` (quantize the residuals per cell
at scale).

Determinism contract: float→double casts are exact; the quantization formula
``floor((x − mn) / ((mx − mn) / levels))`` uses only exactly-rounded IEEE-754
ops, so any engine reproduces identical codes (see
``functions/deterministic.py`` for why this matters for the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_quantize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    bits: int = 8,
) -> DataFrame:
    """Append ``out_col`` (``array<int>`` codes), ``{out_col}_min`` and
    ``{out_col}_max`` (the per-vector dequantization range) to ``df``.

    A constant vector (mx == mn) quantizes to all-zero codes with the stored
    range degenerate — dequantization yields the constant back.
    """
    levels = (1 << bits) - 1
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.withColumn("__v", v).withColumn(
        "__mn", F.array_min("__v")
    ).withColumn("__mx", F.array_max("__v"))
    scale = (F.col("__mx") - F.col("__mn")) / F.lit(float(levels))
    codes = F.when(
        F.col("__mx") > F.col("__mn"),
        F.transform(
            "__v",
            lambda x: F.least(
                F.lit(levels).cast("bigint"),
                F.floor((x - F.col("__mn")) / scale),
            ).cast("int"),
        ),
    ).otherwise(F.transform("__v", lambda x: F.lit(0)))
    return (
        staged.withColumn(out_col, codes)
        .withColumn(f"{out_col}_min", F.col("__mn"))
        .withColumn(f"{out_col}_max", F.col("__mx"))
        .drop("__v", "__mn", "__mx")
    )


def dequantize(
    df: DataFrame,
    qvec_col: str = "qvec",
    out_col: str = "dqvec",
    bits: int = 8,
) -> DataFrame:
    """Reconstruct approximate doubles from codes + stored range."""
    levels = (1 << bits) - 1
    scale = (F.col(f"{qvec_col}_max") - F.col(f"{qvec_col}_min")) / F.lit(
        float(levels)
    )
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col),
            lambda c: F.col(f"{qvec_col}_min") + c.cast("double") * scale,
        ),
    )
