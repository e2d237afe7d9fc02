"""Equivalence tests for the distributed serial-window replacements
(operators/scale.py): the two-phase formulations must match the
single-window formulations EXACTLY on arbitrary data, including ties and
bucket boundaries."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.operators.scale import (
    distributed_max_concurrency,
    distributed_ntile,
)


def test_distributed_ntile_matches_window_ntile(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 19)) for i in range(457)  # heavy key ties
    ]
    df = spark.createDataFrame(rows, ["rid", "key"])
    for b in (1, 3, 10, 500):  # incl. b > n rows
        w = Window.orderBy("key", "rid")
        serial = df.select("rid", F.ntile(b).over(w).alias("bucket"))
        dist = distributed_ntile(df, "key", ["rid"], b)
        s = {(r.rid, r.bucket) for r in serial.collect()}
        d = {(r.rid, r.bucket) for r in dist.select("rid", "bucket").collect()}
        assert s == d, f"b={b}"


def test_distributed_sweep_matches_serial_sweep(spark):
    rng = random.Random(13)
    # intervals spanning several 'days', with exact-tie boundaries
    rows = []
    for _ in range(400):
        start = rng.randint(0, 5_000_00)
        rows.append((start, start + rng.choice([1, 60, 86_400, 172_800])))
    iv = spark.createDataFrame(rows, ["s", "e"]).select(
        F.timestamp_seconds(F.col("s")).alias("start_ts"),
        F.timestamp_seconds(F.col("e")).alias("end_ts"),
    )
    starts = iv.select(F.col("start_ts").alias("t"), F.lit(1).alias("delta"))
    ends = iv.select(F.col("end_ts").alias("t"), F.lit(-1).alias("delta"))
    w = Window.orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    serial = (
        starts.unionByName(ends)
        .select(F.sum("delta").over(w).alias("live"))
        .agg(F.max("live").alias("mx"))
        .collect()[0]["mx"]
    )
    got = distributed_max_concurrency(iv, "start_ts", "end_ts").collect()[0]
    assert got["max_concurrent"] == serial
    assert got["n_intervals"] == 400
    # degenerate bucketing (everything in one bucket) must also agree
    one = distributed_max_concurrency(
        iv, "start_ts", "end_ts", bucket=F.lit(0)
    ).collect()[0]
    assert one["max_concurrent"] == serial


def test_distributed_sweep_empty_input(spark):
    """Empty interval frame: n_intervals must be 0 (matching the serial
    COUNT-based oracle), max is NULL on both sides."""
    iv = spark.createDataFrame([], "start_ts timestamp, end_ts timestamp")
    got = distributed_max_concurrency(iv, "start_ts", "end_ts").collect()[0]
    assert got["n_intervals"] == 0
    assert got["max_concurrent"] is None


def test_skyline_matches_bruteforce(spark):
    import random

    from bigdatafraude_ml_graphx_spark.operators.scale import skyline_2d

    rng = random.Random(21)
    rows = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(300)]
    # brute force over per-price-max reduced points
    best = {}
    for p_, s_ in rows:
        best[p_] = max(best.get(p_, -1), s_)
    pts = sorted(best.items())
    expect = set()
    for p_, s_ in pts:
        dominated = any(
            (q <= p_ and t >= s_ and (q < p_ or t > s_)) for q, t in pts
        )
        if not dominated:
            expect.add((p_, s_))
    df = spark.createDataFrame(rows, ["price", "size"])
    for b in (1, 4, 64):
        got = {
            (r.price, r.size)
            for r in skyline_2d(df, "price", "size", n_buckets=b).collect()
        }
        assert got == expect, f"buckets={b}"


def test_skyline_empty_input(spark):
    from bigdatafraude_ml_graphx_spark.operators.scale import skyline_2d

    df = spark.createDataFrame([], "price double, size int")
    assert skyline_2d(df, "price", "size").count() == 0


def test_grouped_lower_median_matches_window_formulation(spark):
    """grouped_lower_median (per-value counts + crossing over the distinct
    values) must equal the row-level cumulative-window formulation exactly,
    including heavy value ties and 1-row groups."""
    from bigdatafraude_ml_graphx_spark.operators.scale import (
        grouped_lower_median,
    )

    rng = random.Random(29)
    rows = [("g%d" % rng.randint(0, 4), float(rng.randint(0, 30)) / 4)
            for _ in range(611)] + [("solo", 42.0)]
    df = spark.createDataFrame(rows, ["grp", "x"])
    wc = Window.partitionBy("grp").orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.partitionBy("grp")
    serial = (
        df.withColumn("_cum", F.count("*").over(wc))
        .withColumn("_n", F.count("*").over(wn))
        .filter(2 * F.col("_cum") >= F.col("_n"))
        .groupBy("grp")
        .agg(F.min("x").alias("med"))
    )
    dist = grouped_lower_median(df, ["grp"], "x", "med")
    assert {tuple(r) for r in serial.collect()} == {
        tuple(r) for r in dist.collect()
    }


def test_grouped_percentile_disc_matches_window_formulation(spark):
    """grouped_percentile_disc must equal the serial PERCENTILE_DISC
    window formulation (min value whose cume_dist reaches p) on arbitrary
    data including heavy ties, for every requested percentile."""
    from bigdatafraude_ml_graphx_spark.operators.scale import (
        grouped_percentile_disc,
    )

    rng = random.Random(11)
    rows = [
        (rng.choice("abc"), float(rng.randint(0, 30)))  # heavy value ties
        for _ in range(613)
    ]
    df = spark.createDataFrame(rows, ["grp", "x"])
    pcts = (10, 25, 50, 75, 90, 100)
    dist = {
        (r.grp, r.pct): r.pval
        for r in grouped_percentile_disc(df, ["grp"], "x", pcts).collect()
    }
    w = Window.partitionBy("grp").orderBy("x")
    ranked = df.withColumn("cd", F.cume_dist().over(w))
    for p in pcts:
        serial = {
            r.grp: r.pv
            for r in ranked.filter(F.col("cd") >= p / 100.0)
            .groupBy("grp")
            .agg(F.min("x").alias("pv"))
            .collect()
        }
        for g, v in serial.items():
            assert dist[(g, p)] == v, (g, p)


def test_bpe_merges_greedy_semantics(spark):
    """bpe_merges must replay the textbook greedy algorithm: adjacent
    non-overlapping occurrences all merge in one round (the double-space
    encoding property), counts weight by word frequency, and ties break
    on (count DESC, a, b)."""
    from bigdatafraude_ml_graphx_spark.functions.bpe import bpe_merges

    words = spark.createDataFrame(
        [("aaab", 3), ("ab", 2), ("ba", 1)], ["word", "freq"]
    )
    merges = bpe_merges(words, 2)
    # Round 1 pairs: aaab -> (a,a)x2, (a,b); ab -> (a,b); ba -> (b,a)
    # counts: (a,a)=6, (a,b)=5, (b,a)=1 -> merge (a,a) with count 6.
    assert merges[0] == (1, "a", "a", "aa", 6)
    # Round 2: aaab -> [aa, a, b] pairs (aa,a)=3,(a,b)=3; ab (a,b)=2;
    # ba (b,a)=1 -> (a,b)=5 beats (aa,a)=3.
    assert merges[1] == (2, "a", "b", "ab", 5)


def test_bpe_merges_single_char_vocab(spark):
    """A vocabulary of single-character words has no pairs: the loop must
    stop early and return an empty history, not raise."""
    from bigdatafraude_ml_graphx_spark.functions.bpe import bpe_merges

    words = spark.createDataFrame([("a", 5), ("b", 2)], ["word", "freq"])
    assert bpe_merges(words, 3) == []
