"""Round-10 batch-2 pins: constructed-corpus semantics for the source
quota (q239), duplicate spans (q240), and source overlap (q241)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark import registry as q


def _write_docs(spark, tmp_path, rows, n_chars=None):
    """rows: (doc_id, text, source). Writes a documents.parquet the catalog
    can load from tmp_path."""
    d = str(tmp_path)
    df = spark.createDataFrame(
        [(i, t, s) for (i, t, s) in rows], "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en"))
    if n_chars is None:
        df = df.withColumn("n_chars", F.length("text").cast("long"))
    else:
        m = spark.createDataFrame(
            list(n_chars.items()), "doc_id long, n_chars long"
        )
        df = df.join(m, "doc_id")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    return d


def test_source_quota_caps_and_tiebreak(spark, tmp_path):
    """Quota keeps exactly min(k, docs) per source; equal n_chars break by
    doc_id ascending (deterministic rank)."""
    rows = [(i, f"doc {i}", "s1") for i in range(1, 13)]  # 12 docs
    rows += [(100 + i, f"tie {i}", "s2") for i in range(3)]  # 3 docs, tied
    n_chars = {i: 1000 - i for i in range(1, 13)}  # s1: doc1 longest
    n_chars.update({100: 7, 101: 7, 102: 7})  # s2: all tied
    d = _write_docs(spark, tmp_path, rows, n_chars)
    out = q.QUERIES["q239_source_quota"](spark, d).collect()
    s1 = sorted((r["rk"], r["doc_id"]) for r in out if r["source"] == "s1")
    s2 = sorted((r["rk"], r["doc_id"]) for r in out if r["source"] == "s2")
    assert s1 == [(k, k) for k in range(1, 11)]  # top-10 of 12, by n_chars
    assert s2 == [(1, 100), (2, 101), (3, 102)]  # ties broken by doc_id


def test_duplicate_spans_merge_and_min_length(spark, tmp_path):
    """Consecutive duplicated trigrams merge into one maximal span; runs
    shorter than 8 tokens are dropped; islands split on gaps."""
    shared = "a b c d e f g h i j"  # 10 tokens -> 8 shared trigrams
    rows = [
        (1, f"z1 z2 {shared} y1 y2", "s"),  # dup positions 2..9
        (2, shared, "s"),                    # dup positions 0..7
        (3, "p q r s t u", "s"),             # 3 dup grams -> 5 tokens < 8
        (4, "p q r s x y z w q r s t", "s"),  # two 2-gram islands < 8
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in q.QUERIES["q240_duplicate_spans"](spark, d).collect()
    }
    assert out == {1: (2, 11, 10), 2: (0, 9, 10)}


def test_cut_duplicate_spans_emits_every_doc(spark, tmp_path):
    """The cut transform keeps non-duplicated tokens in order, emits a
    fully-duplicated doc as an empty string, and leaves span-free docs
    untouched."""
    shared = "a b c d e f g h i j"
    rows = [
        (1, f"z1 z2 {shared} y1 y2", "s"),
        (2, shared, "s"),
        (3, "p q r s t u", "s"),
        (4, "p q r s x y z w q r s t", "s"),
    ]
    d = _write_docs(spark, tmp_path, rows)
    out = {
        r["doc"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in q.QUERIES["q242_cut_duplicate_spans"](spark, d).collect()
    }
    assert out == {
        1: ("z1 z2 y1 y2", 4, 10),
        2: ("", 0, 10),
        3: ("p q r s t u", 6, 0),
        4: ("p q r s x y z w q r s t", 12, 0),
    }


def test_tfdf_cosine_identical_docs_only(spark, tmp_path):
    """Identical docs score ~1.0; docs sharing only a COMMON (low-weight)
    shingle stay under the 0.5 threshold; the relative df cap is computed
    against the full corpus size."""
    rows = [(i, f"f{i}a f{i}b f{i}c", "s") for i in range(100)]  # unique filler
    rows += [(200, "dup one two three four", "s"),
             (201, "dup one two three four", "s")]
    # Shares only "dup one two", whose df=3 exceeds the cap 0.02*103=2.06
    # -> that shingle is dropped entirely, so this doc pairs with nothing.
    rows += [(202, "dup one two other tail", "s")]
    d = _write_docs(spark, tmp_path, rows)
    out = q.QUERIES["q243_tfdf_cosine_pairs"](spark, d).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(200, 201)]
    assert out[0]["cosine_q"] > 0.99


def test_source_overlap_jaccard_and_threshold(spark, tmp_path):
    """Two sources sharing 2 of 6 distinct shingles -> jaccard 1/3; a
    disjoint source produces no pair rows at all."""
    mk = lambda g: f"{g} {g} {g}"  # one 3-token doc == one shingle
    rows = []
    for i, g in enumerate(["g1", "g2", "g3", "g4"]):
        rows.append((10 + i, mk(g), "sa"))
    for i, g in enumerate(["g3", "g4", "g5", "g6"]):
        rows.append((20 + i, mk(g), "sb"))
    rows.append((30, mk("g9"), "sc"))
    d = _write_docs(spark, tmp_path, rows)
    out = q.QUERIES["q241_source_overlap"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"], r["shared"]) == ("sa", "sb", 2)
    assert abs(r["jaccard"] - 2.0 / 6.0) < 1e-12
