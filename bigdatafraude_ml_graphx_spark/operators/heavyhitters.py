"""Distributed Misra-Gries heavy hitters (Misra & Gries 1982, the
space-bounded frequent-items sketch; merge rule from Agarwal et al.,
"Mergeable Summaries", PODS 2012).

Why a sketch when groupBy counts are exact: at 100 TB a full token rollup
shuffles |vocab| rows; the MG summary bounds PER-EXECUTOR state to ``k``
counters and the merged summary to ``k`` counters TOTAL, so heavy-hitter
screening costs one narrow pass plus a k·P-row reduce — the standard
pre-filter before an exact count of only the surviving candidates.

Guarantee (the contract q178 pins): after per-partition MG and the
summary merge, every item with true frequency > n/k is present in the
merged candidate set, and each candidate's sketched count undercounts its
true frequency by at most n/k. Both halves are THEOREMS, not tunings —
the verification query checks them against exact counts.

Arrow-batched ``mapInPandas`` for the partition pass (per-batch Python
dict of ≤k counters — the one shape built-in aggregates cannot express),
then a single-group ``applyInPandas`` merge over the k·P surviving
counters (bounded input by construction — NOT a data-sized group).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_update(counters: dict, item, inc: int, k: int) -> None:
    """One Misra-Gries update: insert/increment, else decrement all."""
    if item in counters:
        counters[item] += inc
    elif len(counters) < k - 1:
        counters[item] = inc
    else:
        # decrement-all by the smallest removable amount, repeatedly
        # (weighted variant: Berinde et al. 2010) — loop is bounded by
        # log of the weight, and inc here is small per call
        while inc > 0:
            if item in counters:
                counters[item] += inc
                break
            if len(counters) < k - 1:
                counters[item] = inc
                break
            d = min(min(counters.values()), inc)
            for key in list(counters):
                counters[key] -= d
                if counters[key] == 0:
                    del counters[key]
            inc -= d


def misra_gries_candidates(
    df: DataFrame, item_col: str, k: int = 32
) -> DataFrame:
    """Merged MG summary ``(item, mg_count)`` with ≤ k−1 rows.

    Phase 1: per-Arrow-batch MG with k counters (``mapInPandas`` — state
    never exceeds k entries regardless of batch size). Phase 2: sum the
    per-batch counters by item (map-side combinable groupBy — k·P tiny
    rows), then one final MG pass over the summed counters collapses the
    union back to ≤ k−1 entries (the PODS'12 merge: summing MG summaries
    then re-pruning preserves the n/k error bound)."""

    def partition_mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item in pdf[item_col]:
                _mg_update(counters, item, 1, k)
        yield pd.DataFrame(
            {"item": list(counters), "c": list(counters.values())}
        )

    partial = df.select(item_col).mapInPandas(
        partition_mg, f"item string, c long"
    )
    summed = partial.groupBy("item").agg(F.sum("c").alias("c"))

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        counters: dict = {}
        for item, c in zip(pdf["item"], pdf["c"]):
            _mg_update(counters, item, int(c), k)
        return pd.DataFrame(
            {"item": list(counters), "mg_count": list(counters.values())}
        )

    return (
        summed.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(merge, "item string, mg_count long")
    )
