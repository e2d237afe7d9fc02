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
    # Lazy checkpoint: the count() is the materializing action (one job,
    # not two — same fusion as the iteration body below).
    labels = labels.localCheckpoint(eager=False)
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
            # LAZY checkpoint (optimization r13): the fingerprint aggregate
            # below is the job that materializes it — one job per iteration
            # instead of two (the eager checkpoint job + the collect job),
            # halving the per-iteration scheduling overhead that dominates
            # small-diameter rounds. Lineage truncation is unchanged: the
            # blocks are saved by that first action, and every later
            # consumer (the next iteration, the caller) reads them.
            new_labels = new_labels.localCheckpoint(eager=False)
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


def connected_components_star(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star contraction
    (Kiveris et al. 2014, "Connected Components in MapReduce and Beyond") —
    O(log² n) rounds instead of :func:`connected_components`' O(diameter).

    Same contract: ``(id, component)`` with component = min vertex id.

    When to use which: label propagation does less work per round (one join +
    one aggregate) and wins on short-diameter graphs — social/fraud graphs,
    LSH candidate graphs (diameter ≤ ~20). Star contraction pays two
    window-aggregate shuffles + a distinct per round but collapses a
    1000-hop chain in ~10 rounds where propagation needs 1000; at 100 TB it
    is the safe default when the diameter is unknown (road networks, linked
    event chains, long reply threads).

    Round shape: large-star hangs every strictly-larger neighbor of ``u``
    onto ``m = min(Γ(u) ∪ u)``; small-star re-hangs the smaller-or-equal
    neighbors (max-keyed representation) onto the same min. Both are window
    minimums over the edge key — per-round cost is |E| through two hash
    shuffles, monotonically shrinking as stars flatten. Convergence = edge
    fingerprint unchanged (same bit_xor/xxhash64 aggregate as label
    propagation); at the fixpoint every edge is (vertex, root).
    """
    from pyspark.sql import Window

    # LAZY checkpoints (r14 job fusion, same pattern as
    # connected_components above): the per-round fingerprint aggregate is
    # the action that materializes each checkpoint — one job per round
    # instead of two; truncation unchanged.
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    fingerprint = F.bit_xor(F.xxhash64("u", "v"))
    prev_fp = None
    for _ in range(max_iter):
        # --- large-star over e: key = each endpoint (symmetric view);
        # hang every strictly-larger neighbor onto min(Γ(a) ∪ a) ----------
        sym = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                    F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
                )
            ).alias("s")
        ).select(F.col("s.a").alias("a"), F.col("s.b").alias("b"))
        m = F.least(F.min("b").over(Window.partitionBy("a")), F.col("a"))
        e_ls = (
            sym.withColumn("m", m)
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star over the LARGE-STAR OUTPUT (the phases alternate —
        # they are not parallel views of the same edge set): max-keyed
        # edges re-hang key + smaller neighbors onto the minimum ----------
        keyed = e_ls.select(
            F.greatest(F.col("u"), F.col("v")).alias("a"),
            F.least(F.col("u"), F.col("v")).alias("b"),
        )
        m2 = F.min("b").over(Window.partitionBy("a"))  # b < a always
        new_e = (
            keyed.withColumn("m", m2)
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("b").alias("x"), F.col("m").alias("y")),
                        F.struct(F.col("a").alias("x"), F.col("m").alias("y")),
                    )
                ).alias("s")
            )
            .select(F.col("s.x").alias("u"), F.col("s.y").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        new_fp = new_e.agg(fingerprint).collect()[0][0]
        if prev_fp is None:
            prev_fp = e.agg(fingerprint).collect()[0][0]
        e = new_e
        if new_fp == prev_fp:
            break
        prev_fp = new_fp

    # Fixpoint edges are (vertex, root): root < vertex everywhere. Labels =
    # edge map ∪ roots ∪ isolated vertices (their own singletons).
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    labels = members.unionByName(roots)
    if vertices is not None:
        isolated = vertices.select("id").join(
            labels.select("id"), "id", "left_anti"
        )
        labels = labels.unionByName(
            isolated.withColumn("component", F.col("id"))
        )
    return labels
