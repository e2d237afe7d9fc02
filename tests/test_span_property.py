"""Property-based check for the duplicate-span family (q240/q242): for
ARBITRARY small corpora over a tiny vocabulary (maximizing shared
trigrams), the Spark plans must agree with a direct pure-Python reference
implementation of the semantics — duplicated-position islands, the
≥8-token minimum, the span cut, and the reassembled clean text. One Spark
job per example, so examples are few but adversarially shrunk."""

from __future__ import annotations

import os
import re
import tempfile
from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark import registry as q

_WORDS = ["aa", "bb", "cc", "dd"]
_corpora = st.lists(
    st.lists(st.sampled_from(_WORDS), max_size=24).map(" ".join),
    min_size=2,
    max_size=5,
)


def _ref_tokens(text: str) -> list[str]:
    t = re.sub(r"[^a-z0-9 ]", "", text.lower().strip())
    t = re.sub(r" +", " ", t)
    return [w for w in t.split(" ") if w]


def _ref(texts: list[str]):
    toks = {i: _ref_tokens(t) for i, t in enumerate(texts)}
    grams = {
        i: [" ".join(tk[j : j + 3]) for j in range(len(tk) - 2)]
        if len(tk) >= 3
        else []
        for i, tk in toks.items()
    }
    docs_per_gram = defaultdict(set)
    for i, gs in grams.items():
        for g in set(gs):
            docs_per_gram[g].add(i)
    dup = {g for g, s in docs_per_gram.items() if len(s) >= 2}
    spans = defaultdict(list)
    for i, gs in grams.items():
        pos = [p for p, g in enumerate(gs) if g in dup]
        run: list[int] = []
        # Islands merge when position gap <= 2 (3-token windows overlap in
        # token space), so emitted spans are token-disjoint; span_tokens is
        # the covered count e - s + 1 (ADVICE r10 #3 semantics).
        for p in pos + [None]:
            if run and (p is None or p - run[-1] > 2):
                s, e = run[0], run[-1] + 2
                if e - s + 1 >= 8:
                    spans[i].append((s, e, e - s + 1))
                run = []
            if p is not None:
                run.append(p)
    clean = {}
    for i, tk in toks.items():
        covered = set()
        for s, e, _ in spans[i]:
            covered.update(range(s, e + 1))
        kept = [w for p, w in enumerate(tk) if p not in covered]
        clean[i] = (" ".join(kept), len(kept), len(tk) - len(kept))
    return dict(spans), clean


@settings(max_examples=10, deadline=None)
@given(texts=_corpora)
def test_span_family_matches_reference(spark, texts):
    d = tempfile.mkdtemp(prefix="spanprop_")
    (
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("t"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    want_spans, want_clean = _ref(texts)

    got_spans = defaultdict(list)
    for r in q.QUERIES["q240_duplicate_spans"](spark, d).collect():
        got_spans[r["doc"]].append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    assert {k: sorted(v) for k, v in got_spans.items()} == {
        k: sorted(v) for k, v in want_spans.items() if v
    }

    got_clean = {
        r["doc"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in q.QUERIES["q242_cut_duplicate_spans"](spark, d).collect()
    }
    assert got_clean == want_clean
