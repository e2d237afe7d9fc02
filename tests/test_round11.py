"""Round-11 regression tests.

1. q248 overflow guard: the TVD integer products are computed in
   DECIMAL(38,0) with factors cast BEFORE the multiply, so synthetic
   ~1e10 counts (products > 2^63) produce the exact answer instead of
   silently wrapping (the q222 overflow-guard model — VERDICT r10 #1).
"""

from __future__ import annotations

from fractions import Fraction

from bigdatafraude_ml_graphx_spark.queries_r10c import source_token_tvd_from_tf


def _tvd_reference(rows):
    """Exact TVD per source via Python bignum arithmetic."""
    from collections import defaultdict

    g = defaultdict(int)
    per_src = defaultdict(dict)
    for src, term, a in rows:
        g[term] += a
        per_src[src][term] = a
    t = sum(g.values())
    out = {}
    for src, terms in per_src.items():
        tsum = sum(terms.values())
        num = sum(abs(a * t - g[term] * tsum) for term, a in terms.items())
        # missing mass: terms not in this source contribute g*tsum each
        num += tsum * (t - sum(g[term] for term in terms))
        out[src] = (len(terms), tsum, Fraction(num, 2 * tsum * t))
    return out


def test_q248_tvd_no_wraparound_at_1e10_counts(spark):
    # counts ~1e10; T ~ 6e10; a*t ~ 6e20 >> 2^63 ~ 9.2e18. A BIGINT
    # multiply would wrap; the decimal-first plan must stay exact.
    rows = [
        ("web", "alpha", 10_000_000_000),
        ("web", "beta", 20_000_000_003),
        ("books", "alpha", 9_999_999_999),
        ("books", "gamma", 15_000_000_007),
        ("code", "beta", 1),
        ("code", "delta", 4_999_999_991),
    ]
    tf = spark.createDataFrame(rows, "source string, term string, a long")
    got = {
        r["source"]: (r["n_terms"], r["n_src_tokens"], r["tvd"])
        for r in source_token_tvd_from_tf(tf).collect()
    }
    want = _tvd_reference(rows)
    assert set(got) == set(want)
    for src, (n_terms, tsum, tvd_exact) in want.items():
        gn, gs, gtvd = got[src]
        assert gn == n_terms and gs == tsum
        # the engine rounds the exact integer numerator and denominator to
        # double once each, then divides: within 1 ulp-ish of exact.
        assert abs(gtvd - float(tvd_exact)) < 1e-12, (src, gtvd, tvd_exact)
        assert 0.0 <= gtvd <= 1.0


def test_q248_tvd_identical_sources_zero(spark):
    rows = [
        ("a", "x", 7_000_000_000),
        ("a", "y", 3_000_000_000),
        ("b", "x", 14_000_000_000),
        ("b", "y", 6_000_000_000),
    ]
    tf = spark.createDataFrame(rows, "source string, term string, a long")
    for r in source_token_tvd_from_tf(tf).collect():
        assert abs(r["tvd"]) < 1e-15


def test_q250_cluster_histogram_accounts_for_every_doc(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q
    from bigdatafraude_ml_graphx_spark.catalog import load_table

    rows = q.QUERIES["q250_dup_cluster_stats"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["docs_total"] for r in rows) == n_docs
    for r in rows:
        assert r["docs_total"] == r["cluster_size"] * r["n_clusters"]
        assert r["docs_removable"] == (r["cluster_size"] - 1) * r["n_clusters"]
        assert r["cluster_size"] >= 1


def test_q251_savings_bounded_and_consistent_with_q242(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q

    rows = q.QUERIES["q251_span_savings_by_source"](spark, sf_dir).collect()
    assert rows, "every source must appear"
    for r in rows:
        assert 0 <= r["tokens_cut"] <= r["tokens_total"]
        assert 0.0 <= r["frac_cut"] <= 1.0
        assert r["docs_with_spans"] <= r["n_docs"]
    # cross-check: total tokens cut == q242's total n_removed (the span
    # cut transform removes exactly the span-covered tokens; both are
    # exact only because spans are token-disjoint since r11)
    cut_total = sum(r["tokens_cut"] for r in rows)
    removed_total = sum(
        r["n_removed"]
        for r in q.QUERIES["q242_cut_duplicate_spans"](spark, sf_dir).collect()
    )
    assert cut_total == removed_total


def test_q252_cell_loads_partition_the_corpus(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q
    from bigdatafraude_ml_graphx_spark.catalog import load_table

    rows = q.QUERIES["q252_ivf_cell_stats"](spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n
    assert abs(sum(r["load_share"] for r in rows) - 1.0) < 1e-9
    assert len(rows) <= 16


def test_q253_budget_fill_invariants(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q

    rows = q.QUERIES["q253_token_budget_fill"](spark, sf_dir).collect()
    t_in = sum(r["tokens_in"] for r in rows)
    t_kept = sum(r["tokens_kept"] for r in rows)
    # kept mass within budget, and the NEXT doc would exceed it (greedy
    # maximality is per the global order, so only the budget bound is a
    # per-source-agg invariant)
    assert t_kept <= t_in * 50 // 100
    for r in rows:
        assert 0 <= r["docs_kept"] <= r["docs_in"]
        assert 0 <= r["tokens_kept"] <= r["tokens_in"]


def test_q254_split_is_cluster_consistent(spark, sf_dir):
    from bigdatafraude_ml_graphx_spark import registry as q

    rows = q.QUERIES["q254_clusterwise_split"](spark, sf_dir).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    # every member of a cluster lands on the same side — the leakage-safety
    # contract a doc-hash split cannot give
    assert all(len(v) == 1 for v in by_cluster.values())
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "holdout"}


def test_q253_two_phase_cumsum_matches_serial_reference(spark, tmp_path):
    """The distributed budget fill (per-n_chars offsets + within-value
    running sums) must equal the serial global-window semantics for
    arbitrary corpora, including ties on n_chars."""
    import os

    from pyspark.sql import functions as F

    from bigdatafraude_ml_graphx_spark import registry as q

    rows = []
    # adversarial shape: heavy ties on n_chars (the two-phase partition
    # key), zero-token docs, single-doc sources
    texts = ["aa bb cc", "aa", "", "dd ee", "ff", "gg hh ii jj", "kk", "ll mm"]
    for i, t in enumerate(texts):
        rows.append((i, t, "s" + str(i % 3)))
    df = (
        spark.createDataFrame(rows, "doc_id long, text string, source string")
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", (F.col("doc_id") % 2).cast("long"))  # ties!
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        r["source"]: (r["docs_kept"], r["tokens_kept"], r["tokens_in"])
        for r in q.QUERIES["q253_token_budget_fill"](spark, d).collect()
    }
    # serial reference
    toks = {i: len([w for w in t.split() if w]) for i, (t,) in
            ((i, (t,)) for i, t in enumerate(texts))}
    order = sorted(range(len(texts)), key=lambda i: (-(i % 2), i))
    total = sum(toks.values())
    budget = total * 50 // 100
    cum, kept = 0, set()
    for i in order:
        cum += toks[i]
        if cum <= budget:
            kept.add(i)
    want = {}
    for i in range(len(texts)):
        s = "s" + str(i % 3)
        dk, tk, ti = want.get(s, (0, 0, 0))
        want[s] = (
            dk + (1 if i in kept else 0),
            tk + (toks[i] if i in kept else 0),
            ti + toks[i],
        )
    assert got == want
