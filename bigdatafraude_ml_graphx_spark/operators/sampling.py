"""Deterministic, engine-portable sampling.

``df.sample(fraction, seed)`` is reproducible only within one Spark version
and partitioning — useless for cross-engine verification and for incremental
pipelines that must re-derive the same sample after a backfill. The standard
scalable alternative is **hash sampling**: a row is in the sample iff a stable
hash of its key falls under a threshold. Properties that matter at 100 TB:

* embarrassingly parallel — a pure per-row filter, no shuffle, pushes down
  past column pruning;
* consistent — the same key is always in (or out), across engines, runs,
  partitionings, and data arrivals, so samples of two tables on the same key
  are automatically correlated (join-compatible sampling);
* tunable — the fraction is ``threshold / 16^k`` for a k-hex-digit prefix.

MD5 is used as the stable hash because every SQL engine exposes it with
identical semantics (Spark ``F.md5`` ≡ DuckDB ``md5``), unlike engine-native
``hash()``/``xxhash64`` which differ by implementation and seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_NULL_SENTINEL = "Z"  # outside the hex alphabet 0-9A-F — cannot collide


def hash_bucket(cols: list[Column], digits: int = 4) -> Column:
    """First ``digits`` hex chars of md5 over the unambiguous key encoding.

    Each column is hex-encoded (removing '-' from the value alphabet) and
    NULL becomes the sentinel 'Z' (not a hex digit), then parts are joined
    with '-'. This makes the composite key injective: a naive
    ``concat_ws('-', ...)`` (a) silently skips NULLs, hashing ('a', NULL)
    identically to ('a',), and (b) collides ('a-b','c') with ('a','b-c') —
    either one perfectly correlates sample membership of distinct keys.
    Spark ``hex(string)`` and DuckDB ``hex(varchar)`` agree byte-for-byte
    (uppercase hex of the UTF-8 bytes), verified in test_rollup_sampling.
    """
    parts = [
        F.coalesce(F.hex(c.cast("string")), F.lit(_NULL_SENTINEL)) for c in cols
    ]
    key = F.concat_ws("-", *parts)
    return F.substring(F.md5(key), 1, digits)


def hash_sample(df: DataFrame, key_cols: list[str], max_hex: str) -> DataFrame:
    """Keep rows whose 4-hex-digit md5 bucket is < ``max_hex``.

    ``max_hex='1000'`` keeps 0x1000/0x10000 = 1/16 of keys. The predicate is
    a deterministic per-row filter (lexicographic compare on the hex prefix —
    identical to numeric compare for fixed-width hex).
    """
    bucket = hash_bucket([F.col(c) for c in key_cols], digits=len(max_hex))
    return df.filter(bucket < F.lit(max_hex.lower()))


def _oracle_key(key_exprs: list[str]) -> str:
    joined = ", ".join(
        f"coalesce(hex(CAST({e} AS VARCHAR)), '{_NULL_SENTINEL}')"
        for e in key_exprs
    )
    return f"concat_ws('-', {joined})"


def oracle_hash_sample_predicate(key_exprs: list[str], max_hex: str) -> str:
    """DuckDB predicate mirroring :func:`hash_sample`."""
    return (
        f"substr(md5({_oracle_key(key_exprs)}), 1, {len(max_hex)})"
        f" < '{max_hex.lower()}'"
    )


def stratified_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    rates: dict[str, str],
    default_hex: str = "zzzz",
) -> DataFrame:
    """Per-stratum hash sampling: each stratum value gets its own ``max_hex``
    threshold (same width as ``default_hex``); unlisted strata use
    ``default_hex``, whose default 'zzzz' sorts above every hex digit, i.e.
    keep-all. The canonical corpus-rebalancing op (e.g. downsample the
    dominant language) — still a pure per-row filter: the CASE threshold
    costs nothing at scale and the sample stays consistent per key across
    runs, engines, and backfills.
    """
    default_hex = _validate_threshold(default_hex)
    digits = len(default_hex)
    bucket = hash_bucket([F.col(c) for c in key_cols], digits=digits)
    case = None
    for value, hexv in rates.items():
        if len(hexv) != digits:
            raise ValueError(f"threshold {hexv!r} width != {digits}")
        cond = F.col(strata_col) == value
        branch = F.lit(_validate_threshold(hexv))
        case = F.when(cond, branch) if case is None else case.when(cond, branch)
    threshold = F.lit(default_hex) if case is None else case.otherwise(default_hex)
    return df.filter(bucket < threshold)


def _validate_threshold(hexv: str) -> str:
    """Lowercase + validate a threshold: hex digits, or the all-'z' keep-all
    sentinel. Uppercase input would silently drop buckets a000-ffff (ASCII
    'A' < 'a'), and since the oracle builder shares the string, the parity
    gate could never catch it — so reject/normalize here."""
    low = hexv.lower()
    if not (all(ch in "0123456789abcdef" for ch in low) or set(low) == {"z"}):
        raise ValueError(f"threshold {hexv!r} is neither hex nor the 'z'*n sentinel")
    return low


def oracle_stratified_sample_predicate(
    key_exprs: list[str],
    strata_expr: str,
    rates: dict[str, str],
    default_hex: str = "zzzz",
) -> str:
    """DuckDB predicate mirroring :func:`stratified_hash_sample` (same CASE
    order — drive both sides from one rates dict)."""
    default_hex = _validate_threshold(default_hex)
    whens = " ".join(
        f"WHEN {strata_expr} = '{v}' THEN '{_validate_threshold(h)}'"
        for v, h in rates.items()
    )
    return (
        f"substr(md5({_oracle_key(key_exprs)}), 1, {len(default_hex)})"
        f" < (CASE {whens} ELSE '{default_hex}' END)"
    )


def weighted_sample_topk(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    salt: str = "ws",
    max_weight: int = 10_000,
) -> DataFrame:
    """EXACT weighted sampling without replacement, deterministically.

    Each row enters a race with ``weight`` replicated md5 draws; its priority
    is the MINIMUM draw. P(a's min beats b's min) = w_a / (w_a + w_b) — the
    exponential-race property — so taking the top-``k`` rows by ascending
    priority IS weighted sampling without replacement (Efraimidis-Spirakis
    A-Res semantics) with INTEGER weights and no floating ``pow``: every
    step is md5 + MIN + rank, bit-identical in any engine.

    The cost of exactness is the replication explode (Σ weights rows), so the
    operator ENFORCES a bound: any weight above ``max_weight`` fails the job
    (executor-side ``raise_error`` — no driver round-trip, stays lazy).
    Quantize large weights to a small integer scale before calling, or use
    :func:`weighted_sample_ares` — the float-keyed variant with no explode —
    when bit-portable cross-engine determinism isn't required.

    Rows with weight <= 0 are excluded up front (zero draws can't win a race).
    Without the filter, Spark's ``sequence(1, w)`` would count DOWNWARD for
    w <= 0 (step defaults to -1 when start > stop), silently granting draws
    to zero/negative weights and diverging from SQL ``range(1, w+1)``.
    """
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    # group cols join the draw key so each group runs an independent race
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in [*(group_cols or []), *key_cols]]
    )
    wcol = F.col(weight_col)
    bounded = F.when(
        wcol > max_weight,
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample_topk: weight exceeds max_weight="
                    f"{max_weight} (replication explode would be unbounded); "
                    f"quantize weights or raise max_weight. offending weight="
                ),
                wcol.cast("string"),
            )
        ).cast("long"),
    ).otherwise(wcol.cast("long"))
    drawn = (
        df.filter(wcol >= 1)
        .withColumn("__rep", F.explode(F.sequence(F.lit(1).cast("long"), bounded)))
        .withColumn(
            "__draw",
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"), key, F.lit(":"), F.col("__rep").cast("string")
                )
            ),
        )
    )
    groups = [F.col(c) for c in (group_cols or [])]
    agg_keys = [*(group_cols or []), *key_cols]
    pri = drawn.groupBy(*agg_keys).agg(
        # weight is functionally dependent on the key; MIN (not first) keeps
        # the aggregate order-independent by construction
        F.min("__draw").alias("priority"), F.min(weight_col).alias("__w")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*groups).orderBy("priority")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("priority")
    )
    return (
        pri.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(*agg_keys, F.col("__w").alias(weight_col), "sample_rank")
    )


def weighted_sample_ares(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    salt: str = "ws",
) -> DataFrame:
    """Efraimidis-Spirakis A-Res weighted sampling — the scale path.

    Each row gets key ``-ln(u) / w`` where ``u`` is a deterministic uniform
    derived from md5 of the row key (15 hex chars → 60 mantissa bits); the
    ``k`` smallest keys per group are the sample. Same inclusion
    probabilities as :func:`weighted_sample_topk` but ZERO row replication:
    one projection + one top-k per group, so it holds for arbitrary float
    weights at any scale (100 TB = one scan, one shuffle of k rows/group).

    Deterministic across runs and partitionings (the uniform comes from the
    key hash, not ``rand()``), but NOT bit-portable across engines — float
    ``ln``/division differ in ULPs from DuckDB, so ties near the k boundary
    could flip. Use the exact replicated variant when a cross-engine oracle
    must match; use this one in production.
    """
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in [*(group_cols or []), *key_cols]]
    )
    # u in (0, 1]: 60-bit integer from the md5 prefix, +1 to exclude 0
    u = (F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key)), 1, 15), 16, 10)
         .cast("double") + F.lit(1.0)) / F.lit(float(16 ** 15))
    wcol = F.col(weight_col).cast("double")
    keyed = df.filter(wcol > 0).withColumn("__ares", -F.log(u) / wcol)
    from pyspark.sql import Window

    groups = [F.col(c) for c in (group_cols or [])]
    w = (
        Window.partitionBy(*groups).orderBy("__ares")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("__ares")
    )
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__ares")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Uniform-mixture downsampling: deterministically sample each group so
    every group contributes ~equally — the corpus-mixture op of an LLM data
    pipeline (balance sources/languages before training). The general
    target-weights case is the same construction with per-group shares in
    the threshold numerator.

    Per-group keep rate = min_group_count / n_group, realized as a pure
    per-row hash filter: keep iff the row's 60-bit md5 < rate·2⁶⁰. The
    threshold is one double expression computed identically in any engine
    (same IEEE op order), so membership is reproducible per key across
    runs, engines, partitionings, and backfills — the property random
    sampling can't give an incremental pipeline. Plan: one tiny counts
    aggregate broadcast back onto the scan; the corpus itself never
    shuffles.
    """
    # counts feeds both the min-aggregate and the threshold join; bare, the
    # min side re-runs the counts rollup — a second full corpus scan
    # (replay audit: 3 opens where 2 are legitimate). The frame is one row
    # per group, so checkpoint it.
    counts = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("__n"))
        .localCheckpoint(eager=True)
    )
    min_c = counts.agg(F.min("__n").alias("__m"))
    thr = counts.join(F.broadcast(min_c)).select(
        group_col,
        F.floor(
            F.col("__m").cast("double")
            * F.lit(float(1 << 60))
            / F.col("__n").cast("double")
        )
        .cast("long")
        .alias("__thr"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(h < F.col("__thr"))
        .drop("__thr")
    )
