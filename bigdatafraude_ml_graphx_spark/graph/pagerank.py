"""Weighted PageRank, DataFrame-native with lineage truncation.

Re-expresses the reference's hand-rolled weighted PageRank
(``/root/reference/notebooks/4_graphx.ipynb:833-894, cell ac3e7869``):

    init:  pr(v) = 1/N                                  (:717)
    iter:  contrib(v) = Σ_{(u,v)∈E} pr(u) · weight(u,v) (:861-869)
           pr(v) = (1-α)·contrib(v) + α/N               (:878-882, α=0.15)

Two deliberate fidelity choices:
  * Dangling mass is NOT redistributed — same as the reference, whose scores
    therefore do not sum to 1. Documented divergence from GraphFrames'
    ``g.pageRank`` (reference checkpoint ``spark_streaming-checkpoint.py:87``).
  * Edge weights are caller-supplied (the reference normalizes per-src by
    amount share, cell 06e8d928); ``normalize_weights`` reproduces that.

The reference's loop re-``cache()``s per iteration but never checkpoints, so
lineage deepens and iteration time grows 0.27 s → 1.10 s
(``:753-757``). Here every iteration ends in ``localCheckpoint(eager=True)``:
constant-size plans, constant per-iteration cost — the property that matters
at 1000 executors.

Determinism: per-row products stay in double (deterministic); each product is
then quantized to an int64 at scale 10^14 via ``floor(x*1e14 + 0.5)`` — the
multiply, add, and floor are each single IEEE-754 ops that yield bit-identical
results in any engine — and the per-vertex contribution is an EXACT int64 sum,
finally divided back by 1e14 in double. Results are therefore identical across
partitionings, runs, and engines (the unrolled DuckDB oracle hash-matches
bit-for-bit). Note decimal casts are NOT used for this: DuckDB's
double→DECIMAL cast goes through a ``x*10^s`` double rounding that can differ
from Spark's exact BigDecimal conversion by one unit — observed cascading over
PageRank iterations at sf0.01.

The 1e-14 absolute quantization keeps ~9+ significant digits for graphs up to
~10^5 vertices. For billion-vertex graphs where pr ~ 1e-9, pass a larger
``scale`` (the sum stays exact while total mass × scale < 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACC = "decimal(38,18)"  # used only for weight normalization totals
_SCALE = 1e14


def _maybe_broadcast(df: DataFrame, n_rows: int, threshold: int) -> DataFrame:
    """Broadcast-hint a frame whose row count is known to be small.

    ``localCheckpoint`` erases size statistics, so AQE cannot see that the
    per-iteration state frame (ranks/labels — one narrow row per vertex) is
    tiny; without the hint every iteration sort-merges the FULL edge list.
    The hint is applied only when the measured row count is under
    ``threshold`` — at billion-vertex scale the state is no longer
    broadcastable and the shuffle join is the right plan, so pass
    ``broadcast_rows=0`` there (or leave the default: the count check keeps
    it safe either way)."""
    return F.broadcast(df) if 0 < n_rows <= threshold else df


def normalize_weights(
    edges: DataFrame, src: str = "src", weight: str = "weight"
) -> DataFrame:
    """Per-source weight normalization: weight / Σ weight over the src's
    outgoing edges (the reference's amount-share normalization,
    ``notebooks/4_graphx.ipynb:681-703``)."""
    totals = edges.groupBy(src).agg(
        F.sum(F.col(weight).cast(_ACC)).alias("_total")
    )
    return (
        edges.join(totals, src)
        .withColumn(weight, (F.col(weight) / F.col("_total")).cast("double"))
        .drop("_total")
    )


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
    alpha: float = 0.15,
    max_iter: int = 5,
    scale: float = _SCALE,
    broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Run ``max_iter`` iterations of weighted PageRank. Returns
    ``(id, pagerank)`` over all vertices (edge endpoints ∪ ``vertices``)."""
    # Materialize the edge lineage once — it is joined in EVERY iteration —
    # pre-partitioned on ``dst``, the contribution-aggregation key. persist()
    # (unlike localCheckpoint) PRESERVES output partitioning, so every
    # iteration's groupBy(dst) fuses partial+final aggregation in one stage:
    # in the broadcast-rank regime an iteration shuffles NOTHING — the |E|
    # re-shuffle per iteration (5x at max_iter=5) becomes one setup shuffle.
    # The no-count repartition lets AQE right-size the partition count.
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            (F.col(weight).cast("double") if weight else F.lit(1.0)).alias("w"),
        )
        .repartition(F.col("dst"))
        .persist()
    )

    ids = e.select(F.col("src").alias("id")).unionByName(
        e.select(F.col("dst").alias("id"))
    )
    if vertices is not None:
        ids = ids.unionByName(vertices.select("id"))
    verts = ids.distinct().localCheckpoint(eager=True)
    n = verts.count()

    ranks = verts.withColumn("pagerank", F.lit(1.0 / n))
    ranks = ranks.localCheckpoint(eager=True)

    for _ in range(max_iter):
        rk = _maybe_broadcast(ranks, n, broadcast_rows)
        contribs = (
            e.join(rk, e.src == rk.id)
            .select(
                F.col("dst").alias("id"),
                # Quantize each product to int64 at `scale`: every op here is
                # a single correctly-rounded IEEE op → engine-independent.
                F.floor(F.col("pagerank") * F.col("w") * F.lit(scale) + F.lit(0.5))
                .cast("long")
                .alias("contrib_q"),
            )
            .groupBy("id")
            .agg(
                (F.sum("contrib_q").cast("double") / F.lit(scale)).alias("contrib")
            )
        )
        # contribs is now map-side-only (no shuffle stage), so AQE has no
        # size statistic to auto-broadcast from — hint it explicitly in the
        # same ≤broadcast_rows regime as the ranks (contribs ≤ |V| rows).
        # Past the threshold both joins degrade to shuffles, which is the
        # right plan at billion-vertex scale.
        ranks = (
            verts.join(
                _maybe_broadcast(contribs, n, broadcast_rows), "id", "left_outer"
            )
            .select(
                "id",
                (
                    (1.0 - alpha) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + alpha / n
                ).alias("pagerank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks
