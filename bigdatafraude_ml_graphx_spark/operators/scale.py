"""Distributed replacements for the two documented serial windows
(VERDICT r4 item 7): global NTILE and global sweep-line concurrency.

Both q104 (equi-depth deciles) and q114 (max interval concurrency) are
exact-semantics queries whose straightforward formulation uses ONE
unpartitioned window — correct, oracle-checkable, and a serial point at
100 TB. These operators compute the IDENTICAL answers with the global
window replaced by (a) per-key parallel windows over a small partition
map, plus (b) a second tiny window over per-key summaries — the classic
two-phase distributed prefix computation. Equivalence to the windowed
formulation is property-tested (tests/test_scale_ops.py) and both ship as
oracle-checked queries (q126/q128) whose oracles are the SAME SQL as the
serial originals — same answer, scalable plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_ntile(
    df: DataFrame,
    key_col: str,
    tie_cols: Sequence[str],
    n_buckets: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Exact global ``NTILE(n) OVER (ORDER BY key, *ties)`` without a
    global window.

    Phase 1: per-value counts of ``key_col`` (map-side combined — the
    shuffle carries |distinct keys| rows). Phase 2: a window over THOSE
    counts (|distinct| rows, trivially small for bucketing columns like
    lengths/scores) yields each value's global starting rank. Phase 3:
    rows get a row_number window PARTITIONED by key value (parallel across
    values) ordered by the tie columns; global rank = start + local rank,
    and the bucket comes from NTILE's exact fill rule: with n rows and b
    buckets the first ``n mod b`` buckets take ``n div b + 1`` rows.

    Requirements: ``key_col`` should have bounded distinct cardinality
    (the phase-2 window is |distinct| rows); ``(key_col, *tie_cols)``
    must totally order the rows for a deterministic result — the same
    requirement the serial NTILE formulation has.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("_cnt"))
    wk = Window.orderBy(key_col)
    ranked_keys = counts.select(
        key_col,
        (F.sum("_cnt").over(wk) - F.col("_cnt")).alias("_start"),
        F.sum("_cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    per_key = Window.partitionBy(key_col).orderBy(*tie_cols)
    # ranked_keys is |distinct key_col| rows — usually tiny, but a
    # high-cardinality key would turn a forced broadcast into the
    # documented memory bomb (plans/hints.py), so gate on the plan-size
    # estimate and let AQE decide otherwise (ADVICE r5 item 3).
    from ..plans.hints import broadcast_if_small

    ranked = df.withColumn("_rn", F.row_number().over(per_key)).join(
        broadcast_if_small(ranked_keys), key_col
    )
    rank = F.col("_start") + F.col("_rn")  # 1-based global rank
    q = F.floor(F.col("_n") / n_buckets)
    r = F.col("_n") % n_buckets
    big = q + 1  # size of the first r buckets
    bucket = F.when(
        rank <= r * big, F.floor((rank - 1) / big)
    ).otherwise(
        r + F.floor((rank - 1 - r * big) / F.greatest(q, F.lit(1)))
    ) + 1
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "_rn", "_start", "_n"
    )


def grouped_lower_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Exact per-group LOWER median (min value where 2·cum ≥ n — the q115
    weighted-median crossing with unit weights) WITHOUT a per-group
    row-level window.

    The naive formulation windows over every row partitioned by the group
    key; with a low-cardinality key (q144: 3 return flags) each window is
    ONE task sorting a third of the table — the serial-window class
    :func:`distributed_ntile` exists to eliminate, and the rank-limit
    pushdown that rescues top-k windows does not apply (the filter is a
    cumulative crossing, not ``rn <= k``).

    Two-phase instead: per-(group, value) counts (map-side combined — the
    shuffle carries |distinct (group, value)| rows), then the cumulative
    window runs over THOSE counts. Exactness: the row-level crossing
    selects the min value v such that the LAST row of v satisfies
    2·cum ≥ n, and the last row's cum is exactly the value-level
    cumulative count — so filtering on the value-level cum yields the
    identical median (property-tested against the windowed formulation in
    tests/test_scale_ops.py)."""
    groups = list(group_cols)
    counts = df.groupBy(*groups, value_col).agg(F.count("*").alias("_c"))
    # The unordered totals window shares the cumulative window's
    # partitioning — it reuses the same exchange+sort and is partition-
    # local, so it costs ~nothing (A/B'd against a totals-rollup +
    # broadcast join: 3.14 s vs 3.30 s for q144 at sf0.1).
    wc = Window.partitionBy(*groups).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*groups)
    return (
        counts.withColumn("_cum", F.sum("_c").over(wc))
        .withColumn("_n", F.sum("_c").over(wn))
        .filter(2 * F.col("_cum") >= F.col("_n"))
        .groupBy(*groups)
        .agg(F.min(value_col).alias(out_col))
    )


def distributed_max_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Peak number of simultaneously-live ``[start, end)`` intervals —
    the q114 sweep-line — with the global running-sum window replaced by
    a two-phase distributed prefix sum.

    Phase 1: ±1 boundary deltas bucketed by a monotone function of the
    boundary time (default: calendar day). Each bucket computes its own
    running sum (window PARTITIONED by bucket — parallel) and reduces to
    (bucket, total delta, max prefix) — three numbers. Phase 2: a window
    over the per-bucket summaries (|buckets| rows) accumulates offsets;
    the global peak is ``max(offset_before_bucket + bucket_max_prefix)``
    — exactly the serial sweep's answer, because prefix maxima decompose
    over any ordered partition of the sequence.

    Ordering inside and across buckets is (t, delta) — intervals close
    before they open at the same instant (half-open semantics), identical
    to the serial formulation; equal timestamps always land in the same
    bucket because the bucket is a function of t.

    Returns a 1-row frame ``(max_concurrent, n_intervals)``.
    """
    starts = df.select(F.col(start_col).alias("t"), F.lit(1).alias("delta"))
    ends = df.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
    deltas = starts.unionByName(ends)
    b = bucket if bucket is not None else F.date_trunc("day", F.col("t"))
    deltas = deltas.withColumn("_b", b)
    run = Window.partitionBy("_b").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_bucket = (
        deltas.withColumn("_live", F.sum("delta").over(run))
        .groupBy("_b")
        .agg(
            F.sum("delta").alias("_dsum"),
            F.max("_live").alias("_mprefix"),
            F.count("*").alias("_nb"),
        )
    )
    wb = Window.orderBy("_b")
    summarized = per_bucket.select(
        (F.sum("_dsum").over(wb) - F.col("_dsum")).alias("_offset"),
        "_mprefix",
        "_nb",
    )
    return summarized.agg(
        F.max(F.col("_offset") + F.col("_mprefix")).alias("max_concurrent"),
        # empty input: COUNT-based serial formulations report 0 intervals
        # (and a NULL max), so coalesce the SUM-based count to match
        F.coalesce(
            (F.sum("_nb") / 2).cast("long"), F.lit(0).cast("long")
        ).alias("n_intervals"),
    )


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """2-D Pareto frontier (skyline): points not dominated by any other —
    dominator has ``minimize_col`` ≤ AND ``maximize_col`` ≥ with one
    strict. Returns the distinct frontier points
    ``(minimize_col, maximize_col)``.

    Partition-merge shape (the standard distributed skyline):

    1. reduce to one candidate per minimize-value (its max of
       ``maximize_col`` — anything less at the same cost is dominated) —
       a parallel map-side-combined aggregate;
    2. LOCAL skylines inside equal-width value-range buckets of the
       minimize axis (running max over each bucket's window — parallel
       across buckets); a point dominated within its bucket is dominated
       globally, so this only discards true losers;
    3. one GLOBAL pass over the surviving candidates (frontier size is
       typically ≪ n — the serial window touches survivors only, the
       two-phase discipline of :func:`distributed_ntile`).

    Bucket boundaries come from a two-scalar min/max read (the
    documented driver-scalar contract `similarity/ivf.py` uses) — ANY
    monotone bucketing yields the identical skyline, so boundary choice
    affects balance, never the result.
    """
    pts = df.groupBy(minimize_col).agg(
        F.max(maximize_col).alias(maximize_col)
    ).localCheckpoint(eager=True)  # read twice: min/max scalars + main pass
    stats = pts.agg(
        F.min(minimize_col).alias("lo"), F.max(minimize_col).alias("hi")
    ).collect()[0]
    if stats["lo"] is None:
        return pts.select(minimize_col, maximize_col)  # empty input
    lo, hi = float(stats["lo"]), float(stats["hi"])
    width = (hi - lo) / n_buckets or 1.0
    bucketed = pts.withColumn(
        "_bk",
        F.least(
            F.floor((F.col(minimize_col).cast("double") - lo) / width),
            F.lit(n_buckets - 1),
        ),
    )
    run_local = (
        Window.partitionBy("_bk")
        .orderBy(minimize_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_pm", F.max(maximize_col).over(run_local)
    ).filter(
        F.col("_pm").isNull() | (F.col(maximize_col) > F.col("_pm"))
    )
    run_global = (
        Window.orderBy(minimize_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        local.withColumn("_gm", F.max(maximize_col).over(run_global))
        .filter(F.col("_gm").isNull() | (F.col(maximize_col) > F.col("_gm")))
        .select(minimize_col, maximize_col)
    )


def grouped_percentile_disc(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[int],
    pct_col: str = "pct",
    out_col: str = "pval",
) -> DataFrame:
    """Exact per-group DISCRETE percentiles (inverse distribution: the
    smallest data value whose cumulative count reaches p% of the group)
    for integer ``percentiles`` — :func:`grouped_lower_median`
    generalized from the 2·cum ≥ n crossing to 100·cum ≥ p·n, same
    two-phase shape: per-(group, value) counts first, cumulative window
    over THOSE (|distinct| rows, map-side combined), never a row-level
    window per group. The crossing compares pure integers, so there is
    no float boundary, and the returned value is an actual data value
    (percentile_disc semantics — no interpolation, hence no cross-engine
    ulp concerns). Returns one ``(group…, pct, value)`` row per group ×
    percentile.
    """
    groups = list(group_cols)
    counts = df.groupBy(*groups, value_col).agg(F.count("*").alias("_c"))
    wc = Window.partitionBy(*groups).orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy(*groups)
    ranked = counts.withColumn("_cum", F.sum("_c").over(wc)).withColumn(
        "_n", F.sum("_c").over(wn)
    )
    spark = df.sparkSession
    pcts = spark.createDataFrame([(int(p),) for p in percentiles], f"{pct_col} int")
    return (
        ranked.crossJoin(F.broadcast(pcts))
        .filter(100 * F.col("_cum") >= F.col(pct_col) * F.col("_n"))
        .groupBy(*groups, pct_col)
        .agg(F.min(value_col).alias(out_col))
    )


def pareto_prefix(
    df: DataFrame,
    value_col: str,
    pct: int,
) -> DataFrame:
    """Smallest prefix of rows (ordered by ``value_col`` DESC) whose values
    sum to at least ``pct`` percent of the total — the Pareto/concentration
    primitive, computed with the two-phase counting discipline: the ordered
    cumulative runs over the per-VALUE rollup (|distinct values| rows,
    map-side combined), the crossing test is pure integer
    (``100·cum ≥ pct·total``), and the cut inside the crossing tie-group is
    a ceiling division (rows with equal value are interchangeable, so the
    minimal prefix is exact). ``value_col`` must be integer-typed (quantize
    monetary values to cents first) and non-negative.

    Returns one row: ``(n_rows, top_n, top_share)`` where ``top_share`` is
    the exact share the minimal prefix holds (≥ pct/100), as a double of
    two exact integer operands.

    Exactness at scale: the value sums, the crossing cross-multiply, and
    the tie-group ceiling all run in ``decimal(38,0)`` — int64 arithmetic
    silently wraps once the total value sum exceeds ~9.2e18/100, and a
    double-based ceiling drifts by one past 2^53 (ADVICE r7). The
    integral division uses SQL ``div`` (exact on decimals), so the only
    IEEE operation left is the final ``top_share`` divide. Decimal
    overflow past 38 digits (in the value sums or the ×100/×pct
    cross-multiplies) raises loudly in BOTH ANSI and legacy modes: ANSI
    raises natively, and in legacy mode — where overflow yields NULL,
    which would make the crossing filter drop every row and silently
    return an empty frame — coalesce-wrapped raise_error branches on the
    filter predicate and the tie-group ceiling turn the NULL into an
    error (ADVICE r8).
    """
    _DEC = "decimal(38,0)"
    vals = df.groupBy(F.col(value_col).alias("_v")).agg(
        F.count("*").alias("_c"),
        (F.col(value_col).cast(_DEC) * F.count("*")).alias("_r"),
    )
    wd = Window.orderBy(F.col("_v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vals.select(
        "_v",
        "_c",
        "_r",
        F.sum("_c").over(wd).alias("_cum_c"),
        F.sum("_r").over(wd).alias("_cum_r"),
        F.sum("_r").over(wall).alias("_t"),
        F.sum("_c").over(wall).alias("_n"),
    )
    # Minimal rows needed from a crossing tie-group: ceil(a/b) over
    # positive integers as (a + b - 1) div b, all decimal — `a` is the
    # remaining mass to cover, strictly positive at the FIRST crossing
    # row. Computed BEFORE the top-1 cut so the sort+limit+project still
    # compiles to TakeOrderedAndProject (the rows are the bounded
    # per-value rollup, so the per-row div is free).
    vd = F.col("_v").cast(_DEC)
    num = (
        pct * F.col("_t")
        - 100 * (F.col("_cum_r") - F.col("_r"))
        + 100 * vd
        - 1
    )
    # Overflow anywhere in the crossing arithmetic (the decimal(38,0)
    # value sums OR the ×100 / ×pct cross-multiplies — legacy mode turns
    # both into NULL) must be LOUD, never a silently empty result: a NULL
    # comparison would drop every row, and a plain side-guard is skippable
    # (the comparison short-circuits to NULL on its left operand without
    # evaluating the guarded right side — measured in r9). coalesce cannot
    # skip: a NULL predicate forces the raising branch. assert_true(false)
    # always raises when reached.
    _cmp = 100 * F.col("_cum_r") >= pct * F.col("_t")
    _loud_cmp = F.coalesce(
        _cmp,
        F.assert_true(
            F.lit(False),
            F.lit(
                "pareto_prefix: decimal(38,0) overflow in the value sums "
                "or crossing cross-multiply — total value mass too large; "
                "pre-scale value_col"
            ),
        ).cast("boolean"),
    )
    # Same discipline for the tie-group ceiling: `num` adds pct·total and
    # 100·value terms, so it can overflow even when the filter's operands
    # did not; a NULL _k would surface as NULL top_n on an otherwise valid
    # row.
    _k_raw = F.expr("_num div _den")
    _k_loud = F.coalesce(
        _k_raw,
        F.assert_true(
            F.lit(False),
            F.lit(
                "pareto_prefix: decimal(38,0) overflow in the tie-group "
                "ceiling; pre-scale value_col"
            ),
        ).cast(_DEC),
    )
    crossing = (
        cum.filter(_loud_cmp)
        .withColumn("_num", num)
        .withColumn("_den", 100 * vd)
        .withColumn("_k", _k_loud)
        .orderBy(F.col("_v").desc())
        .limit(1)
    )
    return crossing.select(
        F.col("_n").cast("long").alias("n_rows"),
        (F.col("_cum_c") - F.col("_c") + F.col("_k"))
        .cast("long")
        .alias("top_n"),
        (
            (F.col("_cum_r") - F.col("_r") + F.col("_k") * vd)
            .cast("double")
            / F.col("_t").cast("double")
        ).alias("top_share"),
    )
