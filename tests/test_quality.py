"""Unit tests for the corpus-preparation operators (repetition quality,
chunking, PII redaction, contamination) — crafted fixtures with
hand-computed answers; full oracle parity for q67-q70 is in
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.dedup.contamination import contamination_overlap
from bigdatafraude_ml_graphx_spark.functions.redaction import pii_hits, redact_pii
from bigdatafraude_ml_graphx_spark.functions.repetition import repetition_metrics
from bigdatafraude_ml_graphx_spark.operators.chunking import chunk_documents


def test_repetition_metrics_flags_repetitive_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),  # one token only
            (2, "the quick brown fox jumps over a lazy dog tonight"),  # diverse
            (3, ""),  # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in repetition_metrics(docs).collect()}
    assert len(out) == 3
    # doc 1: 8 tokens, 1 distinct, top frac 1.0, all 7 bigrams identical
    assert out[1]["n_tokens"] == 8
    assert out[1]["distinct_ratio"] == 1 / 8
    assert out[1]["top_token_frac"] == 1.0
    assert abs(out[1]["dup_bigram_frac"] - 6 / 7) < 1e-12
    assert out[1]["keep"] is False
    # doc 2: all distinct
    assert out[2]["distinct_ratio"] == 1.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["keep"] is True
    # empty doc: present, zero tokens, dropped
    assert out[3]["n_tokens"] == 0 and out[3]["keep"] is False


def test_chunk_documents_exact_slices(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=3).collect()
    )
    assert rows == [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "d e f"),
        (1, 2, 1, "g"),  # final short chunk
        (2, 0, 2, "x y"),
        # doc 3: zero tokens → zero chunks
    ]


def test_chunk_reassembly_roundtrip(spark, sf_dir):
    """Concatenating a doc's chunks in chunk_id order reproduces its full
    normalized token stream — nothing lost, nothing duplicated."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=16)
    rebuilt = (
        chunks.groupBy("doc")
        .agg(
            F.concat_ws(
                " ", F.flatten(F.array_sort(F.collect_list(F.struct("chunk_id", F.split("chunk_text", " ")))).getField("col2"))
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        F.col("doc_id").alias("doc"),
        F.concat_ws(" ", tokens("text")).alias("orig"),
    )
    mismatches = (
        rebuilt.join(orig, "doc")
        .filter(F.col("rebuilt") != F.col("orig"))
        .count()
    )
    assert mismatches == 0


def test_redaction_patterns_and_cascade(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.com now"),
            (2, "call +1-555-867-5309 today"),
            (3, "card 123456789012 and pin 42"),  # long run hits, short doesn't
            (4, "clean text with no pii at all"),
        ],
        "id long, t string",
    )
    hits = pii_hits("t")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            hits["email"].alias("e"),
            hits["phone"].alias("p"),
            hits["digits"].alias("d"),
            redact_pii("t").alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"], out[1]["d"]) == (1, 0, 0)
    assert out[1]["red"] == "mail <EMAIL> now"
    assert out[2]["p"] == 1 and "<PHONE>" in out[2]["red"]
    assert (out[3]["d"], out[3]["red"]) == (1, "card <NUM> and pin 42")
    assert (out[4]["e"], out[4]["p"], out[4]["d"]) == (0, 0, 0)
    assert out[4]["red"] == "clean text with no pii at all"


def test_contamination_finds_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains eval text
            (2, "one two three four five six seven"),  # unrelated
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = contamination_overlap(corpus, eval_set, n=3, min_shared=2).collect()
    assert len(out) == 1
    r = out[0]
    # eval doc has 2 trigrams, both inside doc 1
    assert (r["doc"], r["eval_doc"], r["n_shared"]) == (1, 100, 2)
    assert r["overlap_frac"] == 1.0


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """The corpus (100 TB side) must NOT shuffle: the eval shingles ride a
    broadcast join."""
    from bigdatafraude_ml_graphx_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    out = contamination_overlap(docs, eval_set, n=3, min_shared=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
