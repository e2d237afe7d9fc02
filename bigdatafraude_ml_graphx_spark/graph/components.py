"""Connected components, DataFrame-native.

The reference calls GraphFrames' ``g.connectedComponents()``
(``/root/reference/notebooks/4_graphx.ipynb:504-586, cell 44735382``), which
requires a Scala package and an RDD checkpoint dir. The engine implements the
same semantics in pure DataFrames: iterative min-label propagation

    label(v) ← min(label(v), min over neighbors u of label(u))

to fixpoint. Each iteration is one equi join + one aggregation (both
AQE-planned); lineage is truncated with ``localCheckpoint`` every iteration —
the lesson the reference's own PageRank loop teaches (its per-iteration time
grows 0.27 s → 1.10 s without checkpointing,
``notebooks/4_graphx.ipynb:753-757``).

Scale: O(graph diameter) rounds. Social/fraud graphs have tiny diameters
(≤ ~20). The edge list is partitioned ONCE on the propagation key and cached;
while the label frame fits a broadcast, a round shuffles nothing at all, and
past that threshold each round degrades to one |E|+|V| shuffle on the id key.
(GraphFrames' large-star/small-star does O(log d) rounds — worth adopting
only if diameters are large.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .builders import symmetrize


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    checkpoint_every: int = 1,
    broadcast_rows: int = 2_000_000,
    dedup_edges: bool = True,
) -> DataFrame:
    """Label every vertex with its component id (the min vertex id in the
    component). Returns ``(id, component)``.

    ``vertices`` (a DF with an ``id`` column) may add isolated vertices that
    appear in no edge; they become singleton components, matching GraphFrames
    (the reference graph is 99.8% singletons — 275,191 of 275,236 components,
    cell 44735382 output).
    """
    # Materialize the (possibly expensive) edge lineage ONCE — every
    # iteration joins against `sym`. Hash-partition on ``v`` (the key the
    # neighbor-min aggregation groups by) with a count-derived partition
    # number and persist(): persist PRESERVES output partitioning
    # (localCheckpoint erases it), so each iteration's groupBy fuses
    # partial+final aggregation with no shuffle — in the broadcast-label
    # regime a whole round shuffles NOTHING — while the sized partition
    # count keeps small graphs off the task-overhead floor and large ones
    # fully parallel.
    from .pagerank import _coalesced, _maybe_broadcast, _sized_keyed_persist

    sym = symmetrize(edges.select(src, dst), src, dst).select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    )
    # Duplicate edges don't change the min-label fixpoint, only the work per
    # round; pass dedup_edges=False when the input is already one row per
    # pair (e.g. cooccurrence_edges — a groupBy output with src<dst), which
    # saves a full |E| shuffle here.
    if dedup_edges:
        sym = sym.distinct()
    sym = _sized_keyed_persist(sym, key="v")

    ids = sym.select(F.col("u").alias("id"))
    if vertices is not None:
        ids = ids.unionByName(vertices.select("id"))
    labels = ids.distinct().withColumn("component", F.col("id"))
    labels = labels.localCheckpoint(eager=True)
    n_verts = labels.count()
    labels = _coalesced(labels, n_verts)

    prev_fp: int | None = None
    for i in range(max_iter):
        # Candidate labels flowing across edges: min neighbor label per
        # vertex. The label frame is one narrow row per vertex — broadcast
        # it while it fits so the (much larger) edge list never re-shuffles
        # (localCheckpoint hides its size from AQE; see _maybe_broadcast).
        lb = _maybe_broadcast(labels, n_verts, broadcast_rows)
        neighbor_min = (
            sym.join(lb, sym.u == lb.id)
            .select(F.col("v").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_component"))
        )
        # least() ignores NULLs, so isolated vertices (no neighbor row after
        # the left join) keep their own label. No broadcast hint on
        # neighbor_min: labels ⋈ neighbor_min is |V|-vs-|V| — a broadcast
        # build job per iteration costs more than the equal-sized exchange
        # it avoids, and at billion-vertex scale the shuffle join is the
        # only correct plan. Only the label state joined against the
        # |E|-scale edge list needs the hint.
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least("component", "nbr_component").alias("component"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        # Convergence test without a join: labels only ever DECREASE
        # (numerically for numeric ids, lexicographically for string ids), so
        # the fixpoint is reached exactly when the label multiset stops
        # changing. Detect change via a type-agnostic hash fingerprint — one
        # cheap aggregate over the (checkpointed) labels. A plain
        # F.sum("component") would be NULL for string ids (the reference's own
        # graph casts ids to string,
        # /root/reference/notebooks/4_graphx.ipynb:334-336) and NULL == NULL
        # would end the loop after one round with wrong labels. bit_xor is
        # order-insensitive and cannot overflow under ANSI mode (sum can).
        # (An xor collision between consecutive DIFFERENT label sets would
        # exit one round early — probability ~2^-64 per round, negligible.)
        fingerprint = F.bit_xor(F.xxhash64("id", "component"))
        new_fp = new_labels.agg(fingerprint).collect()[0][0]
        if prev_fp is None:
            prev_fp = labels.agg(fingerprint).collect()[0][0]
        labels = new_labels
        if new_fp == prev_fp:
            break
        prev_fp = new_fp
    sym.unpersist()
    return labels
