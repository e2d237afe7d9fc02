"""Round-12 regression tests — the three VERDICT r11 / ADVICE closures.

1. q253's budget threshold is exact int64 floor division (the split
   identity), agreeing with Python bignum ``//`` at totals where double
   division provably flips the floor (VERDICT r11 #2 / ADVICE #2).
2. q249's eval-side broadcast is SIZE-GUARDED: with broadcasting disabled
   the plan contains no BroadcastExchange (no forced hint escapes), and
   the answer is value-identical — "plans differ, answers don't"
   (VERDICT r11 #1 / ADVICE #3).
3. IVF centroid cell ids are explicit row_number-1 over the (md5, id)
   sample order — contiguous 0..n-1 by construction, independent of how
   Spark plans the orderBy().limit() (ADVICE #1).
"""

from __future__ import annotations

import hashlib
import math

import pytest

from bigdatafraude_ml_graphx_spark import registry as q


def test_q253_budget_threshold_exact_where_double_division_flips(spark):
    """The split-identity threshold must equal Python bignum ``t*50//100``
    on totals ~1e14..~9e18, INCLUDING values where IEEE double division
    provably floors to a different integer."""
    from bigdatafraude_ml_graphx_spark.queries_r11 import _pct_floor_int64

    # Collect adversarial totals: around 1e14 (the verdict's scale), near
    # the 2^53 double-precision cliff for t*50, and near int64 max.
    candidates = []
    for base in (10**14, (1 << 53) // 50, 10**17, (2**63 - 1) // 50 * 50):
        candidates.extend(base + k for k in range(-3, 100))
    candidates.extend([0, 1, 99, 100, 101, 2**63 - 1])
    candidates = [t for t in candidates if 0 <= t <= 2**63 - 1]
    # at least a few must be double-division flips, or the test is vacuous
    flips = [t for t in candidates if math.floor(t * 50 / 100) != t * 50 // 100]
    assert len(flips) >= 3, "no adversarial totals found"
    df = spark.createDataFrame([(t,) for t in candidates], "_t long")
    got = {
        r["_t"]: r["b"]
        for r in df.select("_t", _pct_floor_int64("_t", 50).alias("b")).collect()
    }
    for t in candidates:
        assert got[t] == t * 50 // 100, (t, got[t], t * 50 // 100)


def test_q249_eval_broadcast_is_size_guarded(spark, sf_dir):
    """With broadcasting disabled session-wide, q249 must plan shuffle
    joins (the guard withholds the hint instead of forcing a broadcast of
    the corpus-proportional eval slice) and produce value-identical
    results."""
    baseline = sorted(
        map(tuple, q.QUERIES["q249_contamination_df_capped"](spark, sf_dir).collect())
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q.QUERIES["q249_contamination_df_capped"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "BroadcastExchange" not in plan, plan
        assert sorted(map(tuple, df.collect())) == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


@pytest.mark.parametrize("n_cells", [4, 16])
def test_ivf_cell_ids_contiguous_and_hash_ordered(spark, n_cells):
    """Centroid cell ids must be exactly 0..n_cells-1 in md5(seed||id)
    order with id tie-break — by construction (row_number), not by the
    accident of a single-partition limit plan (ADVICE r11 #1)."""
    from bigdatafraude_ml_graphx_spark.similarity.ivf import build_ivf_index

    seed = 42
    rows = [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(200)]
    # many partitions so a contiguity-by-plan-accident assumption would break
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(16)
    centroids, assigned = build_ivf_index(emb, n_cells=n_cells, seed=seed)
    got = {r["cell"]: [round(float(x), 5) for x in r["cvec"]] for r in centroids.collect()}
    assert sorted(got) == list(range(n_cells)), sorted(got)
    # independent reference: python md5 over the same rendering
    order = sorted(
        range(200),
        key=lambda i: (hashlib.md5(f"{seed}{i}".encode()).hexdigest(), i),
    )[:n_cells]
    want = {
        c: [round(float(x), 5) for x in rows[i][1]] for c, i in enumerate(order)
    }
    assert got == want
    # every corpus vector lands in a valid cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(n_cells))
