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
