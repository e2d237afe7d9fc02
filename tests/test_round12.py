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


def test_cluster_labels_bucketed_roundtrip_aggregates_without_exchange(
    spark, sf_dir
):
    """The standing-artifact path: cluster_labels(table=...) writes a
    bucketed managed table keyed on cluster and reads it back; per-cluster
    aggregation over the read-back frame needs NO Exchange (the bucketed
    scan already satisfies the hash distribution), and the labeling is
    identical to the in-memory path."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.dedup.clusters import cluster_labels
    from bigdatafraude_ml_graphx_spark.plans import formatted_plan
    from bigdatafraude_ml_graphx_spark.queries_r10 import _DF_FRAC
    from bigdatafraude_ml_graphx_spark.queries_r11 import _JACC_TAU

    docs = load_table(spark, sf_dir, "documents")
    cap = _DF_FRAC * docs.count()
    mem = cluster_labels(docs, threshold=_JACC_TAU, max_shingle_freq=cap)
    try:
        tbl = cluster_labels(
            docs, threshold=_JACC_TAU, max_shingle_freq=cap,
            table="t_cluster_labels", num_buckets=4,
        )
        assert sorted(map(tuple, tbl.collect())) == sorted(
            map(tuple, mem.collect())
        )
        agg = tbl.groupBy("cluster").count()
        assert "Exchange" not in formatted_plan(agg), formatted_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cluster_labels")


def test_q255_marginals_reproduce_q250_and_q254(spark, sf_dir):
    """q255 is the joint (cluster_size × split) table; its marginals must
    equal q250's histogram and q254's split balance exactly — the
    shared-materialization contract."""
    from collections import defaultdict

    rows = q.QUERIES["q255_dedup_release_report"](spark, sf_dir).collect()
    # marginal over split == q250's histogram
    hist = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        h = hist[r["cluster_size"]]
        h[0] += r["n_clusters"]
        h[1] += r["docs_total"]
        h[2] += r["docs_removable"]
    want = {
        r["cluster_size"]: [r["n_clusters"], r["docs_total"], r["docs_removable"]]
        for r in q.QUERIES["q250_dup_cluster_stats"](spark, sf_dir).collect()
    }
    assert {k: v for k, v in hist.items()} == want
    # marginal over cluster_size == q254's per-side doc counts
    docs_by_side = defaultdict(int)
    for r in rows:
        docs_by_side[r["split"]] += r["docs_total"]
    q254 = q.QUERIES["q254_clusterwise_split"](spark, sf_dir).collect()
    want_side = defaultdict(int)
    for r in q254:
        want_side[r["split"]] += 1
    assert dict(docs_by_side) == dict(want_side)


def test_q257_cluster_split_has_zero_cross_pairs(spark, sf_dir):
    """Cluster-wise splitting guarantees no near-dup pair crosses the
    train/holdout boundary; the audit must measure exactly zero, and the
    within-side counts must account for every pair."""
    [r] = q.QUERIES["q257_split_leakage_audit"](spark, sf_dir).collect()
    assert r["n_cross_split"] == 0
    assert r["n_within_holdout"] + r["n_within_train"] == r["n_pairs"]
    assert r["n_pairs"] > 0, "fixture must produce near-dup pairs"


def test_q258_manifest_covers_every_doc_and_is_consistent(spark, sf_dir):
    """One manifest row per document; actions partition the corpus;
    keep-rows are exactly q256's per-source kept docs; split agrees with
    q254 on every doc."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table

    rows = q.QUERIES["q258_curation_manifest"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc"] for r in rows}) == n_docs
    assert {r["action"] for r in rows} <= {
        "keep", "drop_exact_dup", "drop_near_dup"
    }
    # the cluster canonical is never dropped as a near-dup, and every
    # cluster retains exactly one kept doc unless its canonical was an
    # exact dup of an earlier doc (impossible: canonical IS the min id)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, members in by_cluster.items():
        kept = [r for r in members if r["action"] == "keep"]
        assert len(kept) == 1, (cl, members)
        assert kept[0]["doc"] == cl
    # split agrees with q254 per doc
    want_split = {
        r["doc"]: r["split"]
        for r in q.QUERIES["q254_clusterwise_split"](spark, sf_dir).collect()
    }
    assert {r["doc"]: r["split"] for r in rows} == want_split


def test_q259_novelty_curve_accounts_for_all_shingles(spark, sf_dir):
    """Deciles are in [0, 9]; the cumulative column is a prefix sum; the
    final cumulative equals the corpus's distinct-shingle count."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.dedup.ngram import _doc_shingles

    rows = sorted(
        q.QUERIES["q259_shingle_novelty_curve"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert all(0 <= r["decile"] <= 9 for r in rows)
    run = 0
    for r in rows:
        run += r["new_shingles"]
        assert r["cum_new_shingles"] == run
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        _doc_shingles(docs, "text", "doc_id", 3, distinct=False)
        .select("shingle")
        .distinct()
        .count()
    )
    assert run == n_distinct


def test_q260_dispersion_consistent_with_q252(spark, sf_dir):
    """Same cells and populations as q252; similarity bounds hold
    (min ≤ mean ≤ 1 + quantization slack)."""
    rows = {r["cell"]: r for r in
            q.QUERIES["q260_ivf_cell_dispersion"](spark, sf_dir).collect()}
    counts = {r["cell"]: r["n_vectors"] for r in
              q.QUERIES["q252_ivf_cell_stats"](spark, sf_dir).collect()}
    assert {c: r["n_vectors"] for c, r in rows.items()} == counts
    for r in rows.values():
        assert r["min_sim_to_centroid"] <= r["mean_sim_to_centroid"] + 1e-9
        assert r["mean_sim_to_centroid"] <= 1.0 + 1e-6
        assert -1.0 - 1e-6 <= r["min_sim_to_centroid"]


def test_q261_semantic_leakage_counts_are_consistent(spark, sf_dir):
    """Pair totals match q235's certified sweep; cross fraction in [0,1];
    the worst cross cosine (when any) is within the certified threshold's
    range."""
    [r] = q.QUERIES["q261_semantic_split_leakage"](spark, sf_dir).collect()
    n235 = q.QUERIES["q235_srp_pairs_bucket_capped"](spark, sf_dir).count()
    assert r["n_pairs"] == n235
    assert 0 <= r["n_cross_split"] <= r["n_pairs"]
    if r["n_pairs"]:
        assert abs(r["cross_frac"] - r["n_cross_split"] / r["n_pairs"]) < 1e-12
    if r["n_cross_split"]:
        assert 0.0 < r["max_cross_cosine"] <= 1.0 + 1e-6
    else:
        assert r["max_cross_cosine"] is None


def test_q262_source_overlap_symmetric_bounded(spark, sf_dir):
    """Unordered pairs only (a < b); shared-cluster counts bounded by the
    total multi-source cluster count."""
    rows = q.QUERIES["q262_cluster_source_overlap"](spark, sf_dir).collect()
    assert rows
    n_clusters = len(
        {
            r["cluster"]
            for r in q.QUERIES["q254_clusterwise_split"](spark, sf_dir).collect()
        }
    )
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 1 <= r["n_shared_clusters"] <= n_clusters


def test_cluster_labels_recovers_known_partition(spark):
    """End-to-end labeling check on a corpus with KNOWN duplicate families:
    three families of near-identical texts with disjoint vocabularies plus
    two unique singletons. The labeling must be exactly the family
    partition with the min doc id as each cluster's label."""
    from bigdatafraude_ml_graphx_spark.dedup.clusters import cluster_labels

    fam_a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    fam_b = "kilo lima mike november oscar papa quebec romeo sierra tango"
    fam_c = "uniform victor whiskey xray yankee zulu one two three four"
    rows = [
        # family A: docs 0-2 (doc 1/2 append one token — high jaccard)
        (0, fam_a), (1, fam_a + " extra1"), (2, fam_a + " extra2"),
        # family B: docs 3-4
        (3, fam_b), (4, fam_b + " extra3"),
        # singletons: disjoint vocab entirely
        (5, "solo5 only5 tokens5 here5 nothing5 shared5 at5 all5 ever5 once5"),
        (6, "solo6 only6 tokens6 here6 nothing6 shared6 at6 all6 ever6 once6"),
        # family C: docs 7-8
        (7, fam_c), (8, fam_c + " extra4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = {
        r["doc"]: r["cluster"]
        for r in cluster_labels(docs, threshold=0.3).collect()
    }
    assert labels == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 6, 7: 7, 8: 7}


def test_cluster_labels_cap_disconnects_boilerplate(spark):
    """With a df cap, a boilerplate block shared by EVERY doc must not glue
    unrelated docs into one cluster; uncapped, it does — the exact
    hot-content failure mode the capped config exists for."""
    from bigdatafraude_ml_graphx_spark.dedup.clusters import cluster_labels

    bp = " ".join(f"bp{i}" for i in range(12))  # shared boilerplate
    rows = [
        (i, f"unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e "
            f"unique{i}f unique{i}g unique{i}h " + bp)
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: boilerplate trigrams connect everything
    uncapped = {
        r["cluster"]
        for r in cluster_labels(docs, threshold=0.2).collect()
    }
    assert len(uncapped) == 1
    # capped at < 10 docs/shingle: boilerplate shingles drop, all singletons
    capped = {
        r["doc"]: r["cluster"]
        for r in cluster_labels(docs, threshold=0.2, max_shingle_freq=5).collect()
    }
    assert capped == {i: i for i in range(10)}


def test_q263_incremental_decisions_cover_batch_and_agree_with_pairs(
    spark, sf_dir
):
    """One decision per batch doc; exact matches really share fingerprints;
    near matches really are certified capped pairs; keeps have neither."""
    from bigdatafraude_ml_graphx_spark.queries_r12 import _BATCH_MOD

    rows = {
        r["doc"]: r
        for r in q.QUERIES["q263_incremental_dedup_decisions"](
            spark, sf_dir
        ).collect()
    }
    assert rows and all(d % _BATCH_MOD == 0 for d in rows)
    pairs = q.QUERIES["q233_jaccard_df_capped"](spark, sf_dir).collect()
    cross = {}
    for p in pairs:
        a, b = p["doc_a"], p["doc_b"]
        if (a % _BATCH_MOD == 0) != (b % _BATCH_MOD == 0):
            bd, base = (a, b) if a % _BATCH_MOD == 0 else (b, a)
            best = cross.get(bd)
            if best is None or (-p["jaccard"], base) < (-best[1], best[0]):
                cross[bd] = (base, p["jaccard"])
    for d, r in rows.items():
        if r["action"] == "drop_near_dup":
            assert cross[d][0] == r["match_doc"]
            assert abs(cross[d][1] - r["best_jaccard"]) < 1e-12
        elif r["action"] == "keep":
            assert d not in cross
            assert r["match_doc"] is None and r["best_jaccard"] is None
        else:
            assert r["action"] == "drop_exact_dup"
            assert r["match_doc"] is not None and r["best_jaccard"] is None
