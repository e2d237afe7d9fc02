"""Round-10 batch-3 pins: chunk dedup (q244), source dup rate (q245),
kNN graph shape (q246), curation pipeline accounting (q247)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark import registry as q


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    (
        spark.createDataFrame(rows, "doc_id long, text string, source string")
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    return d


def _block(prefix, n=20):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_chunk_dedup_cross_and_within_doc(spark, tmp_path):
    """A 20-token block shared at different chunk offsets of two docs is
    one group (n_docs=2); the same block twice WITHIN one doc is a group
    with n_docs=1; unique tails never group."""
    A, B, C, D = (_block(p) for p in "abcd")
    rows = [
        (1, f"{A} {B}", "s"),   # A at chunk 0
        (2, f"{C} {A}", "s"),   # A at chunk 1
        (3, _block("u", 25), "s"),  # unique, partial tail chunk
        (4, f"{D} {D}", "s"),   # within-doc duplicate chunk
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r["first_doc"]: (r["n_copies"], r["n_docs"])
        for r in q.QUERIES["q244_chunk_dedup"](spark, d).collect()
    }
    assert out == {1: (2, 2), 4: (2, 1)}


def test_source_dup_rate_charges_later_id(spark, tmp_path):
    """Cross-source copies are charged to the later-id source; canonical
    (first) occurrences are never counted as dups."""
    rows = [
        (1, "same text here", "s1"),
        (2, "same text here", "s1"),   # dup of 1
        (3, "different text", "s1"),
        (4, "same text here", "s2"),   # cross-source dup of 1
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: (r["n_docs"], r["n_dups"], round(r["dup_rate"], 6))
        for r in q.QUERIES["q245_source_dup_rate"](spark, d).collect()
    }
    assert out == {"s1": (3, 1, round(1 / 3, 6)), "s2": (1, 1, 1.0)}


def test_knn_graph_topk_shape(spark, sf_dir):
    """Every node's ranks are 1..m (m <= k), edges are drawn only from the
    symmetrized capped pair set, and (src, dst) never repeats."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.queries_corpus import (
        _SRP32_BANDS,
        _SRP32_SIGNS,
        _SRP_TAU,
    )
    from bigdatafraude_ml_graphx_spark.queries_r10 import _DF_FRAC
    from bigdatafraude_ml_graphx_spark.similarity.srp import srp_banded_pairs

    edges = q.QUERIES["q246_knn_graph"](spark, sf_dir).collect()
    assert edges, "sf0.001 corpus has near-dup vectors; graph must be non-empty"
    by_src = {}
    seen = set()
    for r in edges:
        key = (r["src"], r["dst"])
        assert key not in seen
        seen.add(key)
        by_src.setdefault(r["src"], []).append((r["rk"], r["cosine_q"], r["dst"]))
    for src, lst in by_src.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= 5
        # cosine non-increasing with rank; ties broken by dst ascending
        for (r1, c1, d1), (r2, c2, d2) in zip(lst, lst[1:]):
            assert c1 > c2 or (c1 == c2 and d1 < d2)
    e = load_table(spark, sf_dir, "embeddings")
    pairs = srp_banded_pairs(
        e, "vec_id", "embedding", _SRP32_SIGNS,
        n_bands=_SRP32_BANDS, min_cosine=_SRP_TAU,
        bucket_cap=_DF_FRAC * e.count(),
    ).collect()
    sym = {(r["a_id"], r["b_id"]) for r in pairs}
    sym |= {(b, a) for a, b in sym}
    assert seen <= sym


def test_curation_pipeline_accounting(spark, tmp_path):
    """13 docs, 3 copies of one text -> 11 after dedup -> 10 after quota;
    token accounting over the final set only."""
    rows = [(i, f"tok a b{i}", "s1") for i in range(1, 11)]  # 10 unique
    rows += [(11, "copy of this", "s1"), (12, "copy of this", "s1"),
             (13, "copy of this", "s1")]
    d = _write_docs(spark, tmp_path, rows)
    out = q.QUERIES["q247_curation_pipeline"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["docs_in"], r["docs_dedup"], r["docs_final"]) == (13, 11, 10)
    # Final 10 by n_chars desc: "copy of this" (12 chars, 3 tokens) beats
    # the 9-or-10-char "tok a bN" docs; each doc has 3 tokens.
    assert r["tokens_final"] == 30


def test_source_token_tvd_exact_values(spark, tmp_path):
    """Hand-computed distributions: corpus = x:5/8 y:1/8 z:2/8; a pure-x
    source and the x/y source both sit at TVD 0.375, the disjoint-vocab
    source at 0.75 (missing-mass closed form)."""
    rows = [
        (1, "x x x x", "sa"),
        (2, "x y", "sb"),
        (3, "z z", "sc"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: (r["n_terms"], r["n_src_tokens"], r["tvd"])
        for r in q.QUERIES["q248_source_token_tvd"](spark, d).collect()
    }
    assert out == {
        "sa": (1, 4, 0.375),
        "sb": (2, 2, 0.375),
        "sc": (1, 2, 0.75),
    }
