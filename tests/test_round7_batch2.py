"""Property tests for the round-7 batch-2+ operators: interval-union
coverage vs a brute-force second-marking reference, the Pareto prefix vs a
naive sort-and-scan, the Morton fold vs a bit-twiddling reference, and
invariant checks for BPE encoding and the Lloyd rounds."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.operators.scale import pareto_prefix
from bigdatafraude_ml_graphx_spark.operators.temporal import (
    interval_union_coverage,
)


def test_interval_union_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = []
    for rid in range(400):
        key = rng.randint(0, 9)
        s = rng.randint(0, 200)
        rows.append((rid, key, s, s + rng.randint(1, 40)))
    df = spark.createDataFrame(rows, ["rid", "key", "s", "f"])
    got = {
        (r.key, r.n_islands, r.covered)
        for r in interval_union_coverage(
            df, ["key"], "s", "f", tie_cols=["rid"]
        ).collect()
    }
    # brute force: mark covered integer points per key, count runs
    by_key: dict[int, set[int]] = {}
    for _, key, s, f in rows:
        by_key.setdefault(key, set()).update(range(s, f))
    want = set()
    for key, pts in by_key.items():
        covered = len(pts)
        islands = sum(1 for p in pts if p - 1 not in pts)
        want.add((key, islands, covered))
    assert got == want


def test_interval_union_nested_intervals(spark):
    # A long interval fully containing later short ones: adjacent-only
    # (lag-based) island detection splits these; the running max must not.
    rows = [(0, 1, 0, 100), (1, 1, 10, 20), (2, 1, 30, 40), (3, 1, 150, 160)]
    df = spark.createDataFrame(rows, ["rid", "key", "s", "f"])
    out = interval_union_coverage(df, ["key"], "s", "f", ["rid"]).collect()
    assert [(r.n_islands, r.covered) for r in out] == [(2, 110)]


def test_pareto_prefix_matches_naive(spark):
    rng = random.Random(5)
    for trial in range(5):
        vals = [rng.randint(1, 50) for _ in range(rng.randint(1, 300))]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        for pct in (50, 80, 95):
            row = pareto_prefix(df, "v", pct).collect()[0]
            total = sum(vals)
            acc, top_n = 0, 0
            for v in sorted(vals, reverse=True):
                if 100 * acc >= pct * total:
                    break
                acc += v
                top_n += 1
            assert row.n_rows == len(vals)
            assert row.top_n == top_n, (trial, pct)
            assert row.top_share == acc / total


def test_morton_fold_matches_reference(spark):
    from bigdatafraude_ml_graphx_spark import registry as q

    rng = random.Random(3)
    pts = [(rng.randint(0, 255), rng.randint(0, 255)) for _ in range(200)]
    df = spark.createDataFrame(pts, ["zx", "zy"]).selectExpr(
        "CAST(zx AS BIGINT) AS zx", "CAST(zy AS BIGINT) AS zy"
    )
    z = df.withColumn(
        "zval",
        F.expr(
            "aggregate(sequence(0, 7), CAST(0 AS BIGINT),"
            " (acc, i) -> acc"
            " + shiftleft(shiftright(zx, i) & CAST(1 AS BIGINT), 2*i)"
            " + shiftleft(shiftright(zy, i) & CAST(1 AS BIGINT), 2*i+1))"
        ),
    )

    def morton(x: int, y: int) -> int:
        out = 0
        for i in range(8):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    for r in z.collect():
        assert r.zval == morton(r.zx, r.zy)


def test_bpe_encode_conserves_words_and_compresses(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q
    from bigdatafraude_ml_graphx_spark.catalog import load_table

    out = q.QUERIES["q216_bpe_encode"](spark, sf_dir).collect()
    assert out  # at least one language
    docs = load_table(spark, sf_dir, "documents")
    raw = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .count()
    )
    assert sum(r.n_words for r in out) == raw
    for r in out:
        # merges only ever shrink; chars is the no-merge upper bound
        assert r.n_words <= r.symbols_after <= r.chars_before


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q
    from bigdatafraude_ml_graphx_spark.catalog import load_table

    out = q.QUERIES["q225_kmeans_lloyd"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in out) == n  # every vector assigned once
    assert len(out) <= 8
    assert all(r.inertia >= 0.0 for r in out)


def test_pareto_prefix_exact_beyond_double_precision(spark):
    """ADVICE r7: the crossing cross-multiply and the tie-group ceiling
    must stay exact past 2^53 — int64 cross-multiplies wrapped and the
    double ceiling drifted by one. Values near 2^60 make any double
    round-trip visible and any int64 multiply by 100 wrap."""
    big = 1 << 60
    # 3 rows of `big`, 5 rows of big-1 (a tie group the ceiling must cut
    # mid-group), 2 rows of 1.
    vals = [big] * 3 + [big - 1] * 5 + [1] * 2
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    total = sum(vals)
    for pct in (50, 80, 95):
        row = pareto_prefix(df, "v", pct).collect()[0]
        acc, top_n = 0, 0
        for v in sorted(vals, reverse=True):
            if 100 * acc >= pct * total:
                break
            acc += v
            top_n += 1
        assert row.n_rows == len(vals)
        assert row.top_n == top_n, pct
        assert row.top_share == acc / total, pct


def test_interval_union_rejects_malformed_intervals(spark):
    """ADVICE r7: end < start must fail LOUDLY — a negative per-island
    length silently corrupts the covered sum otherwise."""
    import pytest

    rows = [(0, 1, 10, 20), (1, 1, 30, 25)]
    df = spark.createDataFrame(rows, ["rid", "key", "s", "f"])
    with pytest.raises(Exception, match="end < start"):
        interval_union_coverage(df, ["key"], "s", "f", ["rid"]).collect()
