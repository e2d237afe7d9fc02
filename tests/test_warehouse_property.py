"""Property tests for the round-4 warehouse operators: sweep-line
concurrency vs a brute-force reference, exact weighted median vs a
pure-Python reference, and mixture-sample balance/determinism."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _sweepline_reference(intervals):
    """Max concurrent intervals, brute force over boundary points."""
    best = 0
    for t, _ in intervals:
        live = sum(1 for s, e in intervals if s <= t < e)
        best = max(best, live)
    return best


def test_sweepline_concurrency_matches_bruteforce(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    starts = [0, 1, 2, 2, 3, 10, 10, 10, 40, 41]  # minutes
    gap = 5
    rows = [(i, base + dt.timedelta(minutes=m)) for i, m in enumerate(starts)]
    df = spark.createDataFrame(rows, "id long, t timestamp")
    deltas = df.select("t", F.lit(1).alias("d")).unionByName(
        df.select(
            (F.col("t") + F.expr(f"interval {gap} minutes")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("t", "d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = deltas.select(F.sum("d").over(w).alias("live")).agg(
        F.max("live")
    ).collect()[0][0]
    intervals = [
        (base + dt.timedelta(minutes=m), base + dt.timedelta(minutes=m + gap))
        for m in starts
    ]
    # at t=3 the intervals opened at minutes 0,1,2,2,3 are all live
    assert got == _sweepline_reference(intervals) == 5


def test_weighted_median_matches_python_reference(spark):
    rows = [
        ("a", 10.0, 1.0), ("a", 20.0, 5.0), ("a", 30.0, 1.0),
        ("b", 1.0, 10.0), ("b", 100.0, 1.0),
        ("c", 7.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, price double, w double")
    from pyspark.sql import Window

    wq = F.col("w").cast("decimal(28,6)")
    ordw = (
        Window.partitionBy("g")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    allw = Window.partitionBy("g")
    med = (
        df.select(
            "g", "price",
            F.sum(wq).over(ordw).alias("cumw"),
            F.sum(wq).over(allw).alias("totw"),
        )
        .filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("g")
        .agg(F.min("price").alias("m"))
    )
    got = {r.g: r.m for r in med.collect()}

    def ref(pairs):
        pairs = sorted(pairs)
        tot = sum(w for _, w in pairs)
        acc = 0.0
        for v, w in pairs:
            acc += w
            if 2 * acc >= tot:
                return v

    expect = {
        g: ref([(p, w) for gg, p, w in rows if gg == g]) for g in ("a", "b", "c")
    }
    assert got == expect == {"a": 20.0, "b": 1.0, "c": 7.0}


def test_mixture_sample_balances_and_is_deterministic(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark.operators.sampling import mixture_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = mixture_sample(d, key_col="doc_id", group_col="source")
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    group_sizes = {r.source: r.n for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    m = min(group_sizes.values())
    # every group's kept count is within binomial noise of the min-count
    # target (rate = m/n_g; with these sizes a 4-sigma band is generous)
    import math

    for src, n_g in group_sizes.items():
        rate = m / n_g
        mu = n_g * rate
        sigma = math.sqrt(n_g * rate * (1 - rate)) if rate < 1 else 0.0
        assert abs(counts.get(src, 0) - mu) <= 4 * sigma + 1e-9, (src, counts.get(src), mu)
    # the smallest group keeps (almost) everything: its threshold is 2^60
    # exactly, so every key passes
    smallest = min(group_sizes, key=group_sizes.get)
    assert counts[smallest] == group_sizes[smallest]
    # deterministic: second evaluation keeps the identical doc_ids
    ids1 = {r.doc_id for r in kept.select("doc_id").collect()}
    ids2 = {
        r.doc_id
        for r in mixture_sample(d, key_col="doc_id", group_col="source")
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2
