"""Temporal join operators: as-of joins and range/interval joins.

SURVEY.md §2.3 flags these as the capability gap behind the reference's only
non-trivial join — the hour-bucket co-occurrence self-join at
``notebooks/4_graphx.ipynb:193-208 (cell db571b76)`` is "semantically an
interval/band join collapsed to bucket equality". This module supplies the two
general formulations the reference never wrote:

* :func:`asof_join` — for each probe row, the single most recent build row
  at-or-before the probe timestamp (per key). Implemented as **union-tag +
  one window pass**, NOT as an inequality join: an inequality join produces
  O(probe × build-per-key) intermediate rows before picking the max, while the
  union approach is a single hash shuffle on the key followed by one sorted
  scan — per-key cost O((p+b) log(p+b)) and no row-explosion window state.
  At 100 TB this is the difference between a plan that finishes and one that
  doesn't: the shuffle moves each input row exactly once.

* :func:`range_join` — probe rows joined to all build rows whose timestamp
  falls inside a probe-anchored interval, with an equi key. Expressed as an
  equi-join plus residual range predicates so Catalyst plans a shuffled
  hash/sort-merge join on the key (never a BroadcastNestedLoopJoin).

* :func:`bucketed_interval_join` — the keyless fallback: when there is no
  equi key at all, a pure interval predicate degenerates to a nested-loop
  cross product. We manufacture an equi key by exploding each build row into
  the fixed-width time buckets its interval covers and bucketing the probe
  timestamp, then equi-join on the bucket and apply the exact residual. Same
  trick as ``graph/builders.py::cooccurrence_edges`` (SURVEY §4's rewrite),
  generalized to intervals wider than one bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PROBE_TAG = "__asof_is_probe"
_ASOF_PREFIX = "__asof_b_"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    attach: dict[str, str],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: attach one build row per probe row by temporal proximity.

    ``direction='backward'`` (default) attaches the LATEST build row with
    ``build_ts <= probe_ts``; ``direction='forward'`` the EARLIEST build row
    with ``build_ts >= probe_ts`` (the "next quote/reading after the event"
    lookup). Both directions share one plan shape — only the window ordering
    flips; forward ties on ``build_ts`` resolve to the SMALLEST
    ``tie_break`` (the mirror of backward's largest).

    ``attach`` maps output alias -> build column. Probe rows with no prior
    build row get nulls. Ties on ``build_ts`` are broken by the largest
    ``tie_break`` value (pass a unique column for determinism).

    All attached columns come from the SAME build row: the build payload is
    packed into one struct and a single ``last(struct, ignorenulls=True)``
    picks it atomically. (Per-column ``last(..., ignorenulls)`` would fill a
    legitimately-NULL column of the as-of row from an OLDER build row, mixing
    values across rows.)

    NULL-key semantics match a SQL equi join: NULL never matches NULL.
    NULL-key build rows are dropped up front; NULL-key probe rows then share
    a window partition containing no build payload and get NULL attachments.

    Single-shuffle plan: union(probe, build) → window partitioned by ``key``
    ordered by (ts, build-before-probe, tie) → ``last(struct, ignorenulls)``
    over the unbounded-preceding frame → keep probe rows.
    """
    from pyspark.sql import types as T

    build_cols = sorted(set(attach.values()) | {build_ts} | ({tie_break} if tie_break else set()))
    probe_payload = [c for c in probe.columns if c not in (key, probe_ts)]

    payload_type = T.StructType(
        [T.StructField(c, build.schema[c].dataType) for c in build_cols]
    )
    b = build.filter(F.col(key).isNotNull()).select(
        F.col(key).alias(key),
        F.col(build_ts).alias("__asof_ts"),
        F.lit(0).alias(_PROBE_TAG),
        F.struct(*[F.col(c).alias(c) for c in build_cols]).alias("__asof_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_payload],
    )
    p = probe.select(
        F.col(key).alias(key),
        F.col(probe_ts).alias("__asof_ts"),
        F.lit(1).alias(_PROBE_TAG),
        F.lit(None).cast(payload_type).alias("__asof_payload"),
        *probe_payload,
    )

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ts_ord = (
        F.col("__asof_ts").asc()
        if direction == "backward"
        else F.col("__asof_ts").desc()
    )
    # build rows (tag 0) sort before the probe row at equal ts in BOTH
    # directions, so an equal-timestamp build row is always visible
    order = [ts_ord, F.col(_PROBE_TAG).asc()]
    if tie_break:
        tb = F.col("__asof_payload").getField(tie_break)
        # backward keeps the LARGEST tie (last seen ascending); forward the
        # SMALLEST (last seen in the descending scan)
        order.append(
            tb.asc_nulls_first() if direction == "backward" else tb.desc_nulls_first()
        )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = b.unionByName(p)
    attached = unioned.withColumn(
        "__asof_hit", F.last("__asof_payload", ignorenulls=True).over(w)
    )
    return attached.filter(F.col(_PROBE_TAG) == 1).select(
        F.col(key),
        F.col("__asof_ts").alias(probe_ts),
        *probe_payload,
        *[
            F.col("__asof_hit").getField(src).alias(alias)
            for alias, src in attach.items()
        ],
    )


def range_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    lower: Column,
    upper: Column,
    how: str = "left",
) -> DataFrame:
    """Keyed range join: build rows with ``lower < build.ts <= upper``.

    ``lower``/``upper`` are Column predicates built by the caller against the
    two aliased sides (``probe`` as ``p``, ``build`` as ``b``). The equi key
    keeps the plan a shuffled sort-merge/hash join with residual range
    filters — Catalyst never falls back to a nested loop.
    """
    p = probe.alias("p")
    b = build.alias("b")
    cond = (F.col(f"p.{key}") == F.col(f"b.{key}")) & lower & upper
    return p.join(b, cond, how)


def bucketed_interval_join(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    build_lo: str,
    build_hi: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Keyless interval-containment join via bucket manufacture.

    Matches probe rows to build rows with ``build_lo <= probe_ts < build_hi``
    when no shared equi key exists. Each build interval is exploded to the
    ``bucket_seconds``-wide epoch buckets it covers (``sequence`` + explode —
    JVM-side, no UDF); the probe timestamp maps to exactly one bucket; the
    equi-join on the bucket bounds candidates, and the exact interval
    predicate rides INSIDE the join condition (bucket-equi + residual), so
    outer join NULL-extension survives it. Bucket width should be chosen
    ≈ the typical interval length so each build row lands in O(1) buckets.

    ``how`` may be ``inner`` or ``left``. Left is sound because only the
    build side is exploded — each probe row carries exactly one bucket, so an
    unmatched probe row NULL-extends exactly once. Right/full outer over the
    exploded build side would emit one NULL row per *bucket* of an unmatched
    build interval (wrong multiplicity) and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"bucketed_interval_join supports how='inner'|'left', got {how!r}; "
            "right/full outer is ill-defined over the bucket-exploded build side"
        )

    def epoch_bucket(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))

    b = build.withColumn(
        "__bucket",
        F.explode(
            F.sequence(epoch_bucket(F.col(build_lo)), epoch_bucket(F.col(build_hi)))
        ),
    )
    p = probe.withColumn("__bucket", epoch_bucket(F.col(probe_ts)))
    cond = (
        (F.col("p.__bucket") == F.col("b.__bucket"))
        & (F.col(f"b.{build_lo}") <= F.col(f"p.{probe_ts}"))
        & (F.col(f"p.{probe_ts}") < F.col(f"b.{build_hi}"))
    )
    out = p.alias("p").join(b.alias("b"), cond, how)
    return out.drop(F.col("p.__bucket")).drop(F.col("b.__bucket"))


def interval_union_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge overlapping ``[start, end)`` intervals per key (gaps-and-
    islands) and return ``(key…, n_islands, covered)`` where ``covered``
    is the total length of the UNION (not the sum — overlaps count once).

    Island detection is the running-max rule: an interval opens a new
    island iff its start exceeds the max end over ALL earlier intervals
    of the key (adjacent-only comparison breaks on nested intervals).
    ``start_col``/``end_col`` should be numeric (integer epochs keep the
    arithmetic exact); ``tie_cols`` complete the total order for equal
    starts. One shuffle on the key; two windows + two aggregates, all
    key-partitioned.

    PRECONDITION: every interval must satisfy ``end >= start`` — a
    malformed interval would silently corrupt the ``covered`` sum with a
    negative per-island length, so it fails the JOB loudly instead
    (``raise_error`` guard on the scan; one branch-free comparison per
    row, negligible next to the window shuffle). Callers that construct
    ``end = start + TTL`` (q219) satisfy it by construction.
    """
    keys = list(key_cols)
    order = [start_col, *tie_cols]
    # The guard rides end_col itself (not a throwaway column Catalyst
    # would prune, taking the raise_error with it).
    df = df.withColumn(
        end_col,
        F.when(F.col(end_col) >= F.col(start_col), F.col(end_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_union_coverage: end < start for interval ["
                    ),
                    F.col(start_col).cast("string"),
                    F.lit(", "),
                    F.col(end_col).cast("string"),
                    F.lit(")"),
                )
            )
        ),
    )
    wprev = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = df.withColumn("_pmax", F.max(end_col).over(wprev))
    isl = m.withColumn(
        "_island",
        F.sum(
            F.when(
                F.col("_pmax").isNull() | (F.col(start_col) > F.col("_pmax")), 1
            ).otherwise(0)
        ).over(wrun),
    )
    agg = isl.groupBy(*keys, "_island").agg(
        F.min(start_col).alias("_st"), F.max(end_col).alias("_en")
    )
    return agg.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.col("_en") - F.col("_st")).cast("long").alias("covered"),
    )
