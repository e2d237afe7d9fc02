"""ONE composed end-to-end corpus-preparation flow over the real
``documents`` table — the round-2/3 training-data operators chained the way
a 100 TB pipeline runs them:

    repetition filter → PII redaction → chunking → contamination sweep
    → exact dedup → near-dup grouping (MinHash-LSH → CC)

Each operator is covered piecewise by the oracle-parity gate; this test
guards the SEAMS (column contracts + conservation invariants between
stages):

* kept + dropped = total (filtering conserves rows);
* chunks reassemble exactly to each kept document's token stream;
* redacted text contains zero residual PII-pattern hits;
* contamination hits reference only corpus/eval doc ids and never self-pair;
* dedup group sizes sum to the number of surviving documents, and every
  near-dup group id is a member of its own group (canonical labeling).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.dedup.contamination import contamination_overlap
from bigdatafraude_ml_graphx_spark.dedup.exact import duplicate_groups
from bigdatafraude_ml_graphx_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from bigdatafraude_ml_graphx_spark.functions.redaction import pii_hits, redact_pii
from bigdatafraude_ml_graphx_spark.functions.repetition import repetition_metrics
from bigdatafraude_ml_graphx_spark.functions.text import token_count
from bigdatafraude_ml_graphx_spark.graph.components import connected_components
from bigdatafraude_ml_graphx_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)


def test_corpus_pipeline_replay(spark, docs):
    total = docs.count()

    # ---- 1. repetition quality filter: kept + dropped == total ------------
    metrics = repetition_metrics(docs)
    assert metrics.count() == total  # one verdict per document, none lost
    kept_ids = metrics.filter(F.col("keep")).select("doc")
    n_kept = kept_ids.count()
    n_dropped = metrics.filter(~F.col("keep")).count()
    assert n_kept + n_dropped == total
    assert n_kept > 0  # the real table is not all boilerplate

    kept = docs.join(
        kept_ids.withColumnRenamed("doc", "doc_id"), "doc_id", "inner"
    )

    # ---- 2. PII redaction: scrubbed text has zero residual hits -----------
    redacted = kept.withColumn("text", redact_pii("text"))
    residual = redacted.select(
        sum(pii_hits("text").values()).alias("hits")
    ).agg(F.sum("hits"))
    assert residual.collect()[0][0] == 0

    # ---- 3. chunking: chunks reassemble to each doc's token stream --------
    chunked = chunk_documents(redacted, chunk_tokens=32)
    reassembled = chunked.groupBy("doc").agg(
        F.sum("n_chunk_tokens").alias("n_from_chunks"),
        F.count("*").alias("n_chunks"),
        (F.max("chunk_id") + 1).alias("max_plus_one"),
    )
    doc_tokens = redacted.select(
        F.col("doc_id").alias("doc"), token_count("text").alias("n_tokens")
    )
    joined = reassembled.join(doc_tokens, "doc")
    assert joined.filter(F.col("n_from_chunks") != F.col("n_tokens")).count() == 0
    # chunk ids are contiguous 0..n_chunks-1 per doc
    assert joined.filter(F.col("n_chunks") != F.col("max_plus_one")).count() == 0
    # every kept doc with tokens produced at least one chunk
    n_tokenful = doc_tokens.filter(F.col("n_tokens") > 0).count()
    assert reassembled.count() == n_tokenful

    # ---- 4. contamination sweep vs a held-out eval slice ------------------
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    hits = contamination_overlap(kept, eval_set, min_shared=2)
    assert hits.filter(F.col("doc") == F.col("eval_doc")).count() == 0
    assert hits.filter(F.col("n_shared") < 2).count() == 0
    assert hits.filter(
        (F.col("overlap_frac") <= 0) | (F.col("overlap_frac") > 1)
    ).count() == 0
    contaminated = hits.select("doc").distinct()
    survivors = kept.join(
        contaminated.withColumnRenamed("doc", "doc_id"), "doc_id", "left_anti"
    )
    n_surv = survivors.count()
    assert n_surv == n_kept - contaminated.count()

    # ---- 5. exact dedup: group sizes sum to the surviving corpus ----------
    groups = duplicate_groups(survivors)
    agg = groups.agg(
        F.sum("n_copies").alias("n"), F.count("*").alias("n_groups")
    ).collect()[0]
    assert agg["n"] == n_surv
    assert agg["n_groups"] <= n_surv

    # ---- 6. near-dup grouping: LSH pairs → CC canonical labels ------------
    sigs = minhash_signatures(survivors, num_hashes=8)
    pairs = lsh_candidate_pairs(sigs, num_hashes=8, bands=4)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        vertices=survivors.select(F.col("doc_id").alias("id")),
        dedup_edges=False,
    )
    assert cc.count() == n_surv  # every survivor gets a dup-group label
    # each group's id is itself a member of the group (min-id canonical)
    members = set(r["id"] for r in cc.collect())
    group_ids = set(r["component"] for r in cc.select("component").distinct().collect())
    assert group_ids <= members
