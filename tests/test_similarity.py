"""Similarity-search invariants: brute-force correctness properties and IVF
recall against the exact answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.similarity import cosine_topk
from bigdatafraude_ml_graphx_spark.similarity.ivf import build_ivf_index, ivf_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_bruteforce_self_similarity_excluded_and_bounded(emb):
    res = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)
    rows = res.collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q_rows in per_q.values():
        ordered = sorted(q_rows, key=lambda r: r["rank"])
        sims = [r["cosine"] for r in ordered]
        assert sims == sorted(sims, reverse=True)
        assert len(q_rows) == 3


def test_ivf_recall_vs_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    centroids, assigned = build_ivf_index(emb, n_cells=8)
    approx = ivf_topk(assigned, centroids, queries, k=5, n_probe=4)

    exact_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    approx_pairs = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # Probing half the cells must recover well over half the true neighbors
    # on random data (empirically ~0.8+); the floor is deliberately loose so
    # the test pins the mechanism, not the dataset.
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_ivf_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    def run():
        centroids, assigned = build_ivf_index(emb, n_cells=8, seed=42)
        return {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ivf_topk(assigned, centroids, queries, k=3, n_probe=2).collect()
        }
    assert run() == run()


def test_broadcast_assignment_matches_literal_path(emb):
    """The two assignment strategies (inlined-literal argmin vs broadcast
    join + struct-min) must produce identical cell assignments — both use
    the same quantized similarity arithmetic and the same (-sim, cell)
    tie-break."""
    from bigdatafraude_ml_graphx_spark.similarity.ivf import (
        _assign_cells_broadcast,
        _nearest_cell_expr,
    )

    centroids, assigned_lit = build_ivf_index(emb, n_cells=8)
    corpus = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    assigned_bc = _assign_cells_broadcast(corpus, centroids)
    lit_map = {r["id"]: r["cell"] for r in assigned_lit.collect()}
    bc_map = {r["id"]: r["cell"] for r in assigned_bc.collect()}
    assert lit_map == bc_map and len(lit_map) == emb.count()


def test_large_index_uses_broadcast_plan(emb):
    """Above _INLINE_MAX_CELLS the assignment plan must contain a broadcast
    join (bounded codegen), not an O(n_cells) literal case expression."""
    from bigdatafraude_ml_graphx_spark.similarity.ivf import (
        _INLINE_MAX_CELLS,
        build_ivf_index,
    )

    n_cells = min(_INLINE_MAX_CELLS + 4, emb.count())
    assert n_cells > _INLINE_MAX_CELLS, "fixture too small for the large path"
    centroids, assigned = build_ivf_index(emb, n_cells=n_cells)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    # the corpus side must aggregate map-side: partial then final HashAggregate
    assert plan.count("Aggregate") >= 2
    # every corpus vector still lands in exactly one cell
    assert assigned.count() == emb.count()


def test_ivf_kmeans_quantizer_recall_and_coverage(emb):
    """The k-means coarse quantizer (the standard IVF construction) must
    assign every vector to exactly one of n_cells cells and reach at least
    the recall floor of the sampled quantizer."""
    import pytest as _pytest

    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=5)
    centroids, assigned = build_ivf_index(emb, n_cells=8, method="kmeans")
    assert centroids.count() == 8
    assert assigned.count() == emb.count()  # every vector lands in a cell
    assert assigned.select("cell").distinct().count() <= 8

    approx = ivf_topk(assigned, centroids, queries, k=5, n_probe=4)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"kmeans-IVF recall {recall:.2f} too low"

    with _pytest.raises(ValueError, match="sample"):
        build_ivf_index(emb, method="nonsense")


def test_pq_encode_picks_nearest_anchor_and_recall_on_clusters(spark):
    """On well-separated clusters the PQ pipeline must be near-perfect:
    every vector's codes equal its own cluster anchor's codes, and the
    ADC shortlist -> exact rerank recovers the exact top-k."""
    import random

    from bigdatafraude_ml_graphx_spark.similarity.pq import (
        exact_l2_topk,
        pq_adc_topk,
        pq_codebook,
        pq_encode,
        rerank_shortlist,
    )

    rng = random.Random(3)
    rows = []
    # 4 tight clusters far apart in R^16
    for cid in range(4):
        center = [float(cid * 100)] * 16
        for i in range(10):
            rows.append(
                (
                    cid * 10 + i,
                    [c + rng.uniform(-0.5, 0.5) for c in center],
                    cid,
                )
            )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cb = pq_codebook(df, m=4, k=8)
    enc = pq_encode(df, cb, "vec_id", "embedding")
    codes = {r["id"]: tuple(r["codes"]) for r in enc.collect()}
    # codes are deterministic (re-encode = identical) and clusters never
    # collide (several anchors per cluster may SPLIT it — that's fine)
    codes2 = {r["id"]: tuple(r["codes"]) for r in pq_encode(df, cb, "vec_id", "embedding").collect()}
    assert codes == codes2
    cluster_codes = [
        {codes[cid * 10 + i] for i in range(10)} for cid in range(4)
    ]
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (cluster_codes[a] & cluster_codes[b])

    qs = df.filter("vec_id % 10 = 0")
    short = pq_adc_topk(enc, qs, cb, k=15).select("query_id", "neighbor_id")
    rer = rerank_shortlist(short, df, qs, k=3).select("query_id", "neighbor_id")
    exact = exact_l2_topk(df, qs, k=3).select("query_id", "neighbor_id")
    a = {tuple(r) for r in rer.collect()}
    b = {tuple(r) for r in exact.collect()}
    assert a == b  # clustered data: compressed pipeline == exact


def test_nearest_cell_sql_equals_column(emb):
    """The one-shot SQL construction of the inline nearest-centroid
    expression (optimization r13) is bit-for-bit the Column-API loop it
    replaced: same quantized dot, same repr-roundtripped double literals,
    same struct-min tie-break."""
    from bigdatafraude_ml_graphx_spark.similarity.ivf import (
        _nearest_cell_expr,
        build_ivf_index,
    )

    cents, _ = build_ivf_index(emb, n_cells=16)
    corpus = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    rows = corpus.select(
        "id",
        _nearest_cell_expr(F.col("vec"), cents).alias("o"),  # Column path
        _nearest_cell_expr("vec", cents).alias("n"),  # SQL fast path
    ).collect()
    assert rows and all(r["o"] == r["n"] for r in rows)


def test_srp_signature_sql_equals_column(emb):
    """The one-shot SQL construction of srp_signature (optimization r13)
    produces the identical integer signature as the Column-API loop for
    every corpus vector (both 16- and 32-bit matrices)."""
    from bigdatafraude_ml_graphx_spark.similarity.srp import (
        srp_signature,
        srp_signs,
    )

    for bits in (16, 32):
        signs = srp_signs(bits, 64)
        rows = emb.select(
            srp_signature("embedding", signs).alias("n"),  # SQL fast path
            srp_signature(F.col("embedding"), signs).alias("o"),  # Column
        ).collect()
        assert rows and all(r["o"] == r["n"] for r in rows)
