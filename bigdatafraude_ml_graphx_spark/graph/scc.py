"""Strongly connected components (directed) — the GraphX
``graphx.lib.StronglyConnectedComponents`` contract as iterative
DataFrame phases.

Algorithm: the distributed coloring scheme (Orzan's coloring / FW-BW
without pivot sampling, made deterministic with MIN labels):

  repeat until every vertex is assigned:
    1. trim: vertices with no in- or out-edge in the REMAINING graph are
       their own singleton SCCs (removes the long tail in O(1) rounds);
    2. color: propagate ``color(v) = min id that can reach v`` forward to
       fixpoint (rounds = remaining diameter);
    3. mark: the root r of each color class (color(r) = r) definitely
       belongs to its SCC; propagate membership BACKWARD from the roots
       along edges that stay inside the same color class — every reached
       vertex v has r → v (same color ⇒ r reaches v) and v → r (the
       backward walk), so SCC(v) = r exactly;
    4. remove assigned vertices and iterate on the remainder.

  Every phase is joins + aggregates with per-round ``localCheckpoint``
  lineage truncation (the components/pagerank/bfs discipline); per-phase
  state is one (id, color) row per remaining vertex. Worst case is
  O(#SCC-levels) phases (a path of SCCs), the known bound for
  pivot/coloring SCC — the same worst case GraphX's implementation has.

Determinism: colors and SCC ids are MIN vertex ids, ties impossible; the
result is the canonical "scc = min member id" labeling, which is what the
recursive-CTE oracle (mutual reachability closure) computes directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_label_fixpoint(
    edges: DataFrame, labels: DataFrame, max_rounds: int, n_labels: int = 0
) -> DataFrame:
    """Propagate MIN ``label`` along directed ``edges`` (src → dst) to
    fixpoint: returns (id, label) with label = min over {label(u): u
    reaches id} ∪ {label(id)}. ``n_labels``, when the caller knows it,
    is the label-table row count (it is invariant across rounds — the
    groupBy keys on the same vertex set) and enables the state broadcast
    from round 1."""
    from .pagerank import _maybe_broadcast

    # ``max_rounds`` budgets EFFECTIVE rounds (rounds that change the
    # labeling); the no-change round confirming the fixpoint is free, so
    # a budget equal to the exact propagation depth succeeds.
    prev = None
    changes = 0
    n_rows = n_labels
    while True:
        # Broadcast the (checkpoint-hidden) label state into the edge list
        # while it is measurably small — the per-round |E|-side Exchange
        # disappears (q23/_maybe_broadcast discipline; the fingerprint
        # aggregate supplies the row count from round 1 onward).
        lb = _maybe_broadcast(labels, n_rows, 2_000_000)
        cand = (
            lb.join(edges, lb.id == edges.src)
            .select(F.col("dst").alias("id"), "label")
        )
        labels = (
            labels.unionByName(cand)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            # LAZY: the fingerprint aggregate below is the materializing
            # action — one job per round instead of two (r14 fusion, the
            # components.py r13 pattern; lineage truncation unchanged).
            .localCheckpoint(eager=False)
        )
        row = labels.agg(
            F.count("*").alias("n"), F.sum("label").alias("s")
        ).collect()[0]
        fp = (row["n"], row["s"])
        n_rows = row["n"]
        if fp == prev:
            return labels
        changes += 1
        if changes > max_rounds:
            raise RuntimeError(
                f"scc: min-label propagation did not reach fixpoint within "
                f"max_rounds={max_rounds} — the remaining diameter exceeds "
                f"the budget; raise max_rounds."
            )
        prev = fp


def strongly_connected_components(
    edges: DataFrame,
    max_phases: int = 10,
    max_rounds: int = 30,
) -> DataFrame:
    """SCC labels ``(id, scc)`` (scc = min member id) for every vertex of
    the directed graph ``edges`` (src, dst). Raises if ``max_phases``
    outer phases don't assign every vertex (the bfs non-convergence
    contract — a truncated answer would silently diverge from the
    mutual-reachability oracle)."""
    # Job-fusion discipline throughout the phase loop (r14, the
    # components.py r13 pattern): every per-phase localCheckpoint is LAZY
    # and the next scalar action (a count(), or the fixpoint's first
    # fingerprint aggregate) is what materializes it — the eager-checkpoint
    # job + isEmpty job pairs collapse into single count jobs. Lineage
    # truncation is unchanged: blocks are saved by the materializing
    # action, and every later consumer reads them.
    remaining_edges = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    remaining = (
        remaining_edges.select(F.col("src").alias("id"))
        .unionByName(remaining_edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_remaining = remaining.count()
    # Per-phase increments are collected and unioned ONCE at return —
    # re-checkpointing the accumulated frame every phase would
    # re-materialize all previously assigned vertices O(phases) times.
    increments = []
    for _ in range(max_phases):
        if n_remaining == 0:
            break
        # 1. trim singletons: no in-edge or no out-edge ⇒ own SCC.
        srcs = remaining_edges.select(F.col("src").alias("id")).distinct()
        dsts = remaining_edges.select(F.col("dst").alias("id")).distinct()
        core = remaining.join(srcs, "id", "left_semi").join(dsts, "id", "left_semi")
        # Lazy: consumed only by the final increments union — the return
        # action materializes it off the already-saved parent blocks.
        trimmed = remaining.join(core, "id", "left_anti").select(
            "id", F.col("id").alias("scc")
        ).localCheckpoint(eager=False)
        increments.append(trimmed)
        remaining = core.localCheckpoint(eager=False)
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        remaining_edges = (
            remaining_edges.join(remaining, remaining_edges.src == remaining.id, "left_semi")
            .join(remaining, remaining_edges.dst == remaining.id, "left_semi")
            .localCheckpoint(eager=False)
        )
        # 2. forward MIN coloring to fixpoint (one label row per remaining
        # vertex — n_remaining arms the state broadcast from round 1).
        init = remaining.select("id", F.col("id").alias("label"))
        colors = _min_label_fixpoint(
            remaining_edges, init, max_rounds, n_labels=n_remaining
        )
        # 3. backward walk from roots inside same-color edges.
        ec = (
            remaining_edges.join(
                colors.select(F.col("id").alias("src"), F.col("label").alias("c_src")),
                "src",
            )
            .join(
                colors.select(F.col("id").alias("dst"), F.col("label").alias("c_dst")),
                "dst",
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))  # reversed
        ).localCheckpoint(eager=False)
        roots = colors.filter(F.col("id") == F.col("label")).select("id")
        member = roots.select("id", F.col("id").alias("label"))
        # backward min-label propagation restricted to same-color edges:
        # a vertex reached from root r gets label r (labels are colors —
        # within one color class only its root propagates).
        reached = _min_label_fixpoint(ec, member, max_rounds)
        scc_now = reached.select("id", F.col("label").alias("scc")).localCheckpoint(
            eager=False
        )
        increments.append(scc_now)
        # 4. remove assigned, iterate.
        remaining = remaining.join(scc_now, "id", "left_anti").localCheckpoint(
            eager=False
        )
        n_remaining = remaining.count()
        remaining_edges = (
            remaining_edges.join(remaining, remaining_edges.src == remaining.id, "left_semi")
            .join(remaining, remaining_edges.dst == remaining.id, "left_semi")
            .localCheckpoint(eager=False)
        )
    if n_remaining != 0:
        raise RuntimeError(
            f"strongly_connected_components: {n_remaining} vertices "
            f"unassigned after max_phases={max_phases} — raise the budget."
        )
    if not increments:
        # empty edge list → empty labeling, typed from the INPUT's vertex
        # id type (ADVICE r5 item 4: a hardcoded long would give the empty
        # and non-empty cases different output schemas for int/string ids)
        id_t = edges.schema["src"].dataType.simpleString()
        return edges.sparkSession.createDataFrame([], f"id {id_t}, scc {id_t}")
    out = increments[0]
    for inc in increments[1:]:
        out = out.unionByName(inc)
    return out
