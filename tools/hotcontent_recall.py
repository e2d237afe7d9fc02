"""Prove hot-content caps do not cost non-hot recall (VERDICT r9 item 6).

The hot-content fixture (tools/make_sf1_hotcontent.py) modifies only docs/
vectors with id % 3 != 0 (boilerplate append / hot-cluster collapse); ids
with id % 3 == 0 are byte-identical to the base corpus. For each capped
pair query this tool runs the query on BOTH corpora, restricts both
answers to pairs where BOTH ids are untouched, and diffs them: the caps
must drop only degenerate mass — pairs among untouched content must be
IDENTICAL (the boilerplate tokens are disjoint from the generator
vocabulary, so untouched docs' shingles/signatures are unchanged, and a
relative cap computed over the same corpus size keeps the same threshold).

One caveat is expected and REPORTED rather than hidden: an untouched item
that happens to share a (band, bucket) with the hot mass can lose that
band's collisions when the bucket is dropped; if the pair collides on no
other band it disappears. The per-query `lost`/`gained` counts make that
visible — 0/0 is the clean result.

q246 (kNN graph) additionally GAINS pairs under the hot fixture, and that
is semantically expected for a TOP-K operator, not a recall defect
(adjudicated VERDICT r12 "not wrong, watch" (a)): a node's k slots are a
budget. On the natural corpus some slots go to neighbors that the hot
fixture's cap then displaces (their buckets go over the cap and their
candidate pairs vanish); the freed slots REFILL with the next-best
candidates — real neighbors that passed the banded join and the cosine
threshold but previously ranked below k. The gained edges are therefore
promotions of valid kNN candidates, not fabrications. This tool VERIFIES
that, beyond counting: every gained q246 edge must (1) be between
untouched docs (guaranteed by the restriction filter) and (2) carry
cosine_q >= the q246 threshold — i.e. be a valid kNN edge on its own
terms. A gained edge failing (2) would be a real bug and fails the run.

Usage: python tools/hotcontent_recall.py [base_dir hot_dir] > out.json
       (defaults /tmp/sf1.0 /tmp/sf1.0-hotcontent)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
HOT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0-hotcontent"

# query -> (id_col_a, id_col_b)
CHECKS = {
    "q233_jaccard_df_capped": ("doc_a", "doc_b"),
    "q234_containment_df_capped": ("doc_a", "doc_b"),
    "q235_srp_pairs_bucket_capped": ("a_id", "b_id"),
    "q29_lsh_candidates": ("doc_a", "doc_b"),
    # r10 batch 2/3: the tf/df cosine pairs are df-capped like q233, and
    # untouched docs' duplicate SPANS must be identical (boilerplate tokens
    # are vocabulary-disjoint, so natural gram document frequencies — and
    # hence the dup list restricted to natural grams — are unchanged).
    "q243_tfdf_cosine_pairs": ("doc_a", "doc_b"),
    "q240_duplicate_spans": ("doc", "doc"),
    # r11: the composed artifacts (VERDICT r10 items 5/7).
    # q246 composes q235's capped pairs into per-node top-k: for untouched
    # nodes the EDGE SET restricted to untouched neighbors is the recall
    # number (compare (src, dst, cosine_q) only — `rk` may legitimately
    # shift when touched neighbors enter/leave a node's top-k, and that is
    # not a recall loss among untouched content).
    "q246_knn_graph": ("src", "dst", ("src", "dst", "cosine_q")),
    "q249_contamination_df_capped": ("doc", "eval_doc"),
}


def untouched_pairs(spark, name, sf_dir, a_col, b_col, cols=None):
    from bigdatafraude_ml_graphx_spark import registry as q
    from pyspark.sql import functions as F

    df = q.QUERIES[name](spark, sf_dir)
    rows = df.filter(
        (F.col(a_col) % 3 == 0) & (F.col(b_col) % 3 == 0)
    ).collect()
    cols = list(cols) if cols else df.columns
    return {tuple(str(r[c]) for c in cols) for r in rows}


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("hotcontent-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"metric": "hotcontent_nonhot_recall", "base": BASE, "hot": HOT,
           "queries": {}}
    clean = True
    for name, spec in CHECKS.items():
        a_col, b_col = spec[0], spec[1]
        cols = spec[2] if len(spec) > 2 else None
        base = untouched_pairs(spark, name, BASE, a_col, b_col, cols)
        hot = untouched_pairs(spark, name, HOT, a_col, b_col, cols)
        lost, gained = base - hot, hot - base
        row = {
            "base_nonhot_pairs": len(base),
            "hot_nonhot_pairs": len(hot),
            "lost": len(lost),
            "gained": len(gained),
            "identical": not lost and not gained,
        }
        if name == "q246_knn_graph" and gained:
            # Top-k refill adjudication (see module docstring): every
            # gained edge must be a VALID kNN edge — cosine at or above
            # the q246 threshold. (Both endpoints are untouched docs by
            # the restriction filter.) cosine_q is the 3rd compare col.
            from bigdatafraude_ml_graphx_spark.queries_corpus import _SRP_TAU

            bad = [t for t in gained if float(t[2]) < _SRP_TAU]
            row["gained_valid_knn_edges"] = len(gained) - len(bad)
            row["gained_below_threshold"] = len(bad)
            assert not bad, (
                f"q246 gained {len(bad)} edges below cosine threshold "
                f"{_SRP_TAU} — refills must be valid kNN edges: "
                f"{sorted(bad)[:5]}"
            )
        out["queries"][name] = row
        clean = clean and not lost and not gained
        print(f"{name}: base={len(base)} hot={len(hot)} "
              f"lost={len(lost)} gained={len(gained)}", file=sys.stderr)
    out["all_identical"] = clean
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
