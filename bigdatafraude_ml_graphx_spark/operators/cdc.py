"""Change-data-capture style compaction: latest-row-wins per key.

The reference has no incremental surface at all (every notebook recomputes
from the raw CSV, e.g. ``/root/reference/notebooks/2_sql_analysis.ipynb``
re-reads ``creditcard.csv`` per run); a 100 TB pipeline ingests append-only
change logs and must compact them to current state. The canonical operator is
"keep the newest version of each key", which Spark expresses as one
``row_number`` window — a single hash shuffle on the key, no self-join, no
global sort.

Scale notes:
* One shuffle on ``keys``; per-key state is a sort of that key's rows only.
* At petabyte scale the same operator runs incrementally: compact new
  partitions, then ``latest_by_key`` over (compacted ∪ delta) — the window
  formulation is identical, which is why it's exposed as an operator instead
  of an inline query.
* ``max_by(struct(...))`` would compute the same thing in one aggregate;
  the window form is used because it (a) returns the whole winning row
  without re-joining and (b) extends to "keep newest N versions" for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__cdc_rn"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level reconciliation of two snapshots of the same table: one
    full-outer equi join on the key, null-safe comparison of the payload
    columns. Returns ``(*key_cols, status)`` for every non-identical row,
    with ``status`` ∈ {'added', 'removed', 'changed'} (identical rows are
    dropped — at 100 TB the diff is ≪ the table and the join is the only
    shuffle, one per side on the key).
    """
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    cond = [
        o[f"__ok_{k}"].eqNullSafe(n[f"__nk_{k}"]) for k in key_cols
    ]
    joined = o.join(n, cond, "full_outer")
    # Source keys are non-null (table identity), so side presence is just
    # the first key column's nullity after the outer join.
    in_old = joined[f"__ok_{key_cols[0]}"].isNotNull()
    in_new = joined[f"__nk_{key_cols[0]}"].isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~joined[f"__o_{c}"].eqNullSafe(joined[f"__n_{c}"])
    status = (
        F.when(~in_new, F.lit("removed"))
        .when(~in_old, F.lit("added"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keys = [
        F.coalesce(joined[f"__ok_{k}"], joined[f"__nk_{k}"]).alias(k)
        for k in key_cols
    ]
    return (
        joined.select(*keys, status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    keep: int = 1,
) -> DataFrame:
    """Keep the ``keep`` newest rows per ``keys``, newest = descending on
    ``order_by`` (pass a unique final column, e.g. an event id, for a
    deterministic winner on timestamp ties)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= keep)
        .drop(_RN)
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    delete_col: str | None = None,
    assert_unique_source: bool = True,
) -> DataFrame:
    """Delta-style MERGE (upsert + optional delete) as one full-outer join.

    Semantics (the standard CDC-apply contract):

    * key matched, source not deleted → source row wins (UPDATE),
    * key matched, source ``delete_col`` true → row dropped (DELETE),
    * key only in source → source row appended (INSERT),
    * key only in target → target row kept unchanged.

    ``target`` and ``source`` must share the payload schema (``delete_col``,
    if any, exists only on the source). Merge keys are assumed NON-NULL on
    both sides (the CDC primary-key contract): a NULL key never equi-matches,
    so a null-keyed source row would insert and a null-keyed target row
    would lose its payload to the insert-branch selection.

    Source keys must also be UNIQUE (the SQL MERGE contract — multiple
    source matches for one target key is an error, not a fan-out):
    duplicate source rows would multiply the full-outer join's output
    cardinality silently. With ``assert_unique_source`` (default) a
    duplicate key fails the job executor-side (``raise_error`` inside the
    always-consumed delete flag — lazy, no driver round-trip) at the cost
    of one count-window shuffle over the SOURCE only (the <1% side).
    Pre-compact a raw change log with :func:`latest_by_key`, then pass
    ``assert_unique_source=False`` to skip the re-check.

    Completes the CDC trio with
    :func:`latest_by_key` (log → current source) and :func:`snapshot_diff`
    (audit of the result): compact the change log, merge it into the
    snapshot, diff to verify.

    Scale shape: ONE full-outer shuffle join on the key — no window, no
    union-then-dedup (which would shuffle the payload twice). At 100 TB the
    source is typically <1% of the target, so AQE plans a skew-tolerant
    shuffle join and the output preserves the target's key partitioning for
    the next incremental merge. Deletes ride the same join instead of a
    separate anti-join pass.
    """
    payload = [c for c in target.columns if c not in key_cols]
    src_payload = [
        c for c in source.columns if c not in key_cols and c != delete_col
    ]
    assert sorted(payload) == sorted(src_payload), (
        f"schema mismatch: target {sorted(payload)} vs source {sorted(src_payload)}"
    )
    s = source.select(
        *[F.col(k).alias(f"__s_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}") for c in src_payload],
        (
            F.col(delete_col) if delete_col is not None else F.lit(False)
        ).alias("__s_del"),
    )
    if assert_unique_source:
        # The guard lives inside __s_del, which the DELETE filter always
        # consumes — Catalyst cannot prune it away (the trick
        # sampling.weighted_sample_topk uses for its weight bound).
        w = Window.partitionBy(*[F.col(f"__s_{k}") for k in key_cols])
        s = s.withColumn(
            "__s_del",
            F.when(
                F.count("*").over(w) > 1,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "merge_upsert: duplicate source rows for key ("
                        ),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"__s_{k}").cast("string")
                                for k in key_cols
                            ],
                        ),
                        F.lit(
                            ") — SQL MERGE raises on multiple matches; "
                            "pre-compact the source with latest_by_key"
                        ),
                    )
                ).cast("boolean"),
            ).otherwise(F.col("__s_del")),
        )
    cond = None
    for k in key_cols:
        c = target[k] == s[f"__s_{k}"]
        cond = c if cond is None else (cond & c)
    joined = target.join(s, cond, "full_outer")
    matched_src = s[f"__s_{key_cols[0]}"].isNotNull()
    # DELETE: matched AND flagged — drop the row entirely
    joined = joined.filter(~(matched_src & F.coalesce(F.col("__s_del"), F.lit(False))))
    out = [
        F.coalesce(F.col(f"__s_{k}"), target[k]).alias(k) for k in key_cols
    ] + [
        F.when(matched_src | target[key_cols[0]].isNull(), F.col(f"__s_{c}"))
        .otherwise(target[c])
        .alias(c)
        for c in payload
    ]
    return joined.select(*out)


def scd2_intervals(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """SCD2 validity intervals from a change history (the q105 transform,
    generalized): ``(key, row_id, attr_value, valid_from, valid_to,
    is_current)`` — one LEAD window per key ordered by ``(ts, id)`` so
    same-timestamp changes have a total order; the open interval's NULL
    ``valid_to`` marks the current row. ``row_id`` carries the originating
    change id as a surrogate key, which is what makes the dimension
    REBUILDABLE: every interval retains enough of its source event to
    re-derive intervals for a key without the raw history (the property
    :func:`scd2_apply_batch` relies on).

    One shuffle on the key; per-key state is a sort of that key's rows."""
    w = Window.partitionBy("key").orderBy("valid_from", "row_id")
    nxt = F.lead("valid_from").over(w)
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.col(id_col).alias("row_id"),
            F.col(attr_col).alias("attr_value"),
            F.col(ts_col).alias("valid_from"),
        )
        .withColumn("valid_to", nxt)
        .withColumn(
            "is_current",
            F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)),
        )
    )


def scd2_apply_batch(
    dim: DataFrame,
    batch_events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Incremental SCD2 MERGE: apply a batch of change events to a
    standing dimension WITHOUT replaying the full history. Keys touched by
    the batch get their intervals rebuilt from (the dimension's own rows
    for that key, reconstructed as events via ``row_id``/``valid_from``) ∪
    (the batch's events); untouched keys carry over through one anti join.

    Correct for ANY batch — including LATE-ARRIVING changes that land in
    the middle of a key's existing timeline: the rebuild re-sorts the
    affected key's full (old ∪ new) change set, closing/splitting whatever
    intervals the insertion shifts, which a close-the-open-interval-only
    merge gets wrong. Result is row-identical to rebuilding from the full
    history (``scd2_intervals`` over all events) — the associativity that
    makes the daily loop lossless, pinned in tests/test_round13.py.

    Scale shape: work ∝ |touched keys' timelines| + |batch|; the untouched
    majority of a 100 TB dimension moves through one slim anti join, and
    the rebuild's window shuffles only the affected keys' rows."""
    affected = batch_events.select(F.col(key_col).alias("key")).distinct()
    untouched = dim.join(affected, ["key"], "left_anti")
    replay = dim.join(affected, ["key"], "left_semi").select(
        F.col("key").alias(key_col),
        F.col("row_id").alias(id_col),
        F.col("attr_value").alias(attr_col),
        F.col("valid_from").alias(ts_col),
    )
    batch = batch_events.select(key_col, id_col, attr_col, ts_col)
    rebuilt = scd2_intervals(
        replay.unionByName(batch), key_col, attr_col, ts_col, id_col
    )
    return untouched.unionByName(rebuilt)
