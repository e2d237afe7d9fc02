"""Measure the q46/q27 "answer-size-bound" claim (VERDICT r8 item 3).

q46 (hyperplane-LSH cosine pairs) and q27 (inverted-index n-gram Jaccard
pairs) carried the worst sf1.0 scale ratios (15.5x / 13.1x wall-clock at
10x data). The builder's claim is that both are answer-size-bound: the
sf1.0 generator tiles 10 exact copies of every vector/document, so the
TRUE near-dup pair count grows ~x more than the data does (each group of
k copies contributes k(k-1)/2 pairs), and the join work tracks the answer,
not the corpus squared.

This tool turns that claim into a measurement. For each sf dir it counts:

- q46: n_vectors, candidate pairs (sum over LSH buckets of c(c-1)/2 — the
  exact number of pair projections the bucket join performs) and output
  pairs (cosine >= 0.25).
- q27: n_docs, join rows (sum over shingle posting lists of c(c-1)/2 —
  the exact number of rows the inverted-index join produces before the
  per-pair group), distinct candidate pairs, and output pairs
  (jaccard >= 0.04).

The contract: work-per-output-pair (candidates/outputs) stays ~constant
across scales — wall-clock grows super-linearly ONLY because the answer
does. If candidates grew quadratically while outputs stayed flat, the
claim would be false and the plan wrong.

Usage: python tools/pair_growth.py [sf_dir ...]  (default sf0.1 and
/tmp/sf1.0) — prints one JSON line per sf_dir plus a ratio summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark import registry as q
from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.dedup.ngram import _doc_shingles
from bigdatafraude_ml_graphx_spark.similarity.cosine import _hyperplane_bit

def measure(spark: SparkSession, sf_dir: str) -> dict:
    # c(c-1)/2 per bucket/posting list (needs an active session: F.col
    # cannot build expressions before the JVM is up)
    _PAIRS = (F.col("c") * (F.col("c") - 1) / 2).cast("long")
    out: dict = {"sf_dir": sf_dir}

    emb = load_table(spark, sf_dir, "embeddings")
    sig = F.concat_ws(
        "", *[_hyperplane_bit(F.col("embedding"), p, 64).cast("string") for p in range(8)]
    )
    t0 = time.time()
    bucket_counts = (
        emb.select(sig.alias("bucket")).groupBy("bucket").agg(F.count("*").alias("c"))
    )
    row = bucket_counts.agg(
        F.sum("c").alias("n"), F.sum(_PAIRS).alias("cand")
    ).collect()[0]
    out["q46_n_vectors"] = row["n"]
    out["q46_candidate_pairs"] = row["cand"]
    out["q46_output_pairs"] = q.QUERIES["q46_embedding_near_dups"](spark, sf_dir).count()
    out["q46_sec"] = round(time.time() - t0, 2)

    docs = load_table(spark, sf_dir, "documents")
    t0 = time.time()
    sh = _doc_shingles(docs, "text", "doc_id", 3).localCheckpoint(eager=True)
    posting = sh.groupBy("shingle").agg(F.count("*").alias("c"))
    row = posting.agg(F.sum("c").alias("n_sh"), F.sum(_PAIRS).alias("join_rows")).collect()[0]
    out["q27_n_docs"] = docs.count()
    out["q27_doc_shingles"] = row["n_sh"]
    out["q27_join_rows"] = row["join_rows"]
    # per-doc shingle-set sizes bound the join rows PER candidate pair:
    # |A∩B| <= min(|A|,|B|) <= max_doc_shingles, a data constant that does
    # not grow with corpus size
    drow = sh.groupBy("doc").agg(F.count("*").alias("c")).agg(
        F.max("c").alias("mx"), F.avg("c").alias("av")
    ).collect()[0]
    out["q27_max_doc_shingles"] = drow["mx"]
    out["q27_avg_doc_shingles"] = round(drow["av"], 1)
    # distinct candidate pairs (sharing >= 1 shingle) — the answer-shaped
    # quantity the join work must be compared against
    a, b = sh.alias("a"), sh.alias("b")
    out["q27_distinct_candidates"] = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc"), F.col("b.doc"))
        .distinct()
        .count()
    )
    out["q27_output_pairs"] = q.QUERIES["q27_ngram_jaccard_pairs"](spark, sf_dir).count()
    out["q27_sec"] = round(time.time() - t0, 2)
    # q232 containment shares q27's inverted-index EXACTLY (same shingle
    # stream, same self-join — only the final ratio/filter differs), so its
    # work metric IS q27_join_rows / q27_distinct_candidates; measure only
    # its output size here (VERDICT r9 item 4: measured, not argued).
    t0 = time.time()
    out["q232_output_pairs"] = q.QUERIES["q232_containment_pairs"](
        spark, sf_dir
    ).count()
    out["q232_sec"] = round(time.time() - t0, 2)

    # q243 (tf/df-weighted shingle cosine): its inverted index runs over
    # the DF-CAPPED (doc, term) universe, so its join-work bound is the
    # capped posting lists' Σ c(c-1)/2 — measure that against its outputs.
    from bigdatafraude_ml_graphx_spark.queries_r10 import _DF_FRAC

    t0 = time.time()
    n_docs = docs.count()
    tfc = (
        _doc_shingles(docs, "text", "doc_id", 3, distinct=False)
        .groupBy("doc", "shingle")
        .agg(F.count("*").alias("tf"))
    )
    capped_posting = (
        tfc.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") <= F.lit(_DF_FRAC) * n_docs)
    )
    row = capped_posting.agg(F.sum(_PAIRS).alias("join_rows")).collect()[0]
    out["q243_join_rows"] = row["join_rows"]
    out["q243_output_pairs"] = q.QUERIES["q243_tfdf_cosine_pairs"](
        spark, sf_dir
    ).count()
    out["q243_sec"] = round(time.time() - t0, 2)
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1.0"]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("pair-growth")
        .getOrCreate()
    )
    rows = []
    for d in dirs:
        if not os.path.isdir(d):
            print(f"skip {d}: missing", file=sys.stderr)
            continue
        r = measure(spark, d)
        rows.append(r)
        print(json.dumps(r))
    if len(rows) == 2:
        a, b = rows
        summary = {"metric": "pair_growth_ratios", "base": a["sf_dir"], "scaled": b["sf_dir"]}
        for qn, cand_key in (("q46", "q46_candidate_pairs"), ("q27", "q27_join_rows")):
            data = b[f"{qn}_n_vectors" if qn == "q46" else f"{qn}_n_docs"] / max(
                a[f"{qn}_n_vectors" if qn == "q46" else f"{qn}_n_docs"], 1
            )
            cand = b[cand_key] / max(a[cand_key], 1)
            outp = b[f"{qn}_output_pairs"] / max(a[f"{qn}_output_pairs"], 1)
            summary[f"{qn}_data_ratio"] = round(data, 2)
            summary[f"{qn}_candidate_ratio"] = round(cand, 2)
            summary[f"{qn}_output_ratio"] = round(outp, 2)
            # work per output pair: ~1.0 means candidates track the answer
            summary[f"{qn}_work_per_output_drift"] = round(cand / outp, 3)
        summary["q27_distinct_candidate_ratio"] = round(
            b["q27_distinct_candidates"] / max(a["q27_distinct_candidates"], 1), 2
        )
        # q232: same join work as q27, its own answer
        q232_out = b["q232_output_pairs"] / max(a["q232_output_pairs"], 1)
        summary["q232_output_ratio"] = round(q232_out, 2)
        summary["q232_work_per_output_drift"] = round(
            (b["q27_join_rows"] / max(a["q27_join_rows"], 1)) / q232_out, 3
        )
        # q243: df-capped inverted index, its own join-work measurement
        q243_cand = b["q243_join_rows"] / max(a["q243_join_rows"], 1)
        q243_out = b["q243_output_pairs"] / max(a["q243_output_pairs"], 1)
        summary["q243_candidate_ratio"] = round(q243_cand, 2)
        summary["q243_output_ratio"] = round(q243_out, 2)
        summary["q243_work_per_output_drift"] = round(q243_cand / q243_out, 3)
        # rows-per-candidate = avg |A∩B| over candidates; bounded above by
        # max_doc_shingles at EVERY scale
        for r in rows:
            r["q27_rows_per_candidate"] = round(
                r["q27_join_rows"] / max(r["q27_distinct_candidates"], 1), 2
            )
        summary["q27_rows_per_candidate"] = [
            r["q27_rows_per_candidate"] for r in rows
        ]
        summary["q27_max_doc_shingles"] = [
            r["q27_max_doc_shingles"] for r in rows
        ]
        print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
