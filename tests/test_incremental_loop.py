"""The multi-batch incremental-ingest loop is LOSSLESS end-to-end.

q231/q236 certify one probe step (new batch vs standing index). This test
runs the whole production loop — a real file stream drained one file per
micro-batch through ``foreachBatch``, where every batch (1) self-pairs
internally, (2) probes the standing index, and (3) is merged into the
index — and asserts the union of pairs found across all batches equals the
one-shot batch self-join over the full corpus, n_shared_bands included.
That is the property a daily 100 TB crawl relies on: processing the corpus
incrementally finds exactly the pairs a full reprocess would, because every
pair (a, b) is discovered when the later of the two arrives.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

_NH, _NB = 8, 4


def test_incremental_loop_equals_batch_self_join(spark, sf_dir, tmp_path):
    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.dedup.minhash import (
        lsh_candidate_pairs,
        lsh_probe_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    # Stage 3 single-file batches (doc_id % 3) into a stream source dir.
    staging = str(tmp_path / "staging")
    os.makedirs(staging)
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            os.path.join(staging, f"batch_{i}")
        )
    # File-stream over the nested dirs: one FILE per micro-batch.
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(staging)
        for f in fs
        if f.endswith(".parquet")
    )
    assert len(files) == 3
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, f in enumerate(files):
        os.symlink(f, os.path.join(src, f"b{i}.parquet"))

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    marks_dir = str(tmp_path / "marks")
    os.makedirs(marks_dir)

    def step(batch_df, batch_id):
        open(os.path.join(marks_dir, f"batch_{batch_id}"), "w").close()
        sigs = minhash_signatures(batch_df, num_hashes=_NH).localCheckpoint(
            eager=True
        )
        # (1) within-batch self-pairs
        within = lsh_candidate_pairs(sigs, num_hashes=_NH, bands=_NB).select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
            "n_shared_bands",
        )
        within.write.mode("append").parquet(pairs_dir)
        # (2) probe the standing index (absent on the first batch)
        if os.path.isdir(index_dir) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(index_dir)
            for f in fs
        ):
            idx = batch_df.sparkSession.read.parquet(index_dir)
            cross = lsh_probe_pairs(
                idx, sigs, num_hashes=_NH, bands=_NB
            ).select(
                F.least("doc_probe", "doc_index").alias("a"),
                F.greatest("doc_probe", "doc_index").alias("b"),
                "n_shared_bands",
            )
            cross.write.mode("append").parquet(pairs_dir)
        # (3) merge the batch into the index
        sigs.write.mode("append").parquet(index_dir)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(step)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # The equivalence is only meaningful if the corpus really arrived
    # incrementally: one micro-batch per file, three files.
    assert len(os.listdir(marks_dir)) == 3

    got = {
        (r["a"], r["b"]): r["n_shared_bands"]
        for r in spark.read.parquet(pairs_dir).collect()
    }
    full = minhash_signatures(docs, num_hashes=_NH)
    want = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])): r[
            "n_shared_bands"
        ]
        for r in lsh_candidate_pairs(full, num_hashes=_NH, bands=_NB).collect()
    }
    assert want, "sf0.001 corpus contains near-duplicates; pair set non-empty"
    assert got == want
