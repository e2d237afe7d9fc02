"""Unit tests for the CDC compaction, scalar quantization, and TF-IDF
operators (semantics beyond the oracle-parity gate in test_oracle_parity.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.functions.tfidf import tfidf_top_terms
from bigdatafraude_ml_graphx_spark.operators.cdc import latest_by_key
from bigdatafraude_ml_graphx_spark.similarity.quantize import (
    dequantize,
    scalar_quantize,
)


def test_latest_by_key_picks_newest_and_breaks_ties(spark):
    rows = [
        ("k1", 1, 100, "old"),
        ("k1", 2, 200, "new"),
        ("k2", 5, 300, "only"),
        # timestamp tie on k3 → higher id wins (deterministic tiebreak)
        ("k3", 7, 400, "tie-lo"),
        ("k3", 7, 401, "tie-hi"),
    ]
    df = spark.createDataFrame(rows, "key string, ts long, id long, payload string")
    out = latest_by_key(df, keys=("key",), order_by=("ts", "id"))
    got = {r["key"]: r["payload"] for r in out.collect()}
    assert got == {"k1": "new", "k2": "only", "k3": "tie-hi"}
    assert out.columns == df.columns  # helper column dropped


def test_latest_by_key_keep_n(spark):
    rows = [("k", t, t, f"v{t}") for t in range(5)]
    df = spark.createDataFrame(rows, "key string, ts long, id long, payload string")
    out = latest_by_key(df, keys=("key",), order_by=("ts",), keep=2)
    assert sorted(r["payload"] for r in out.collect()) == ["v3", "v4"]


def test_scalar_quantize_roundtrip_error_bound(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.5, 1.0, 0.25]), (2, [-3.0, 7.0, 0.0, 2.5])],
        "vec_id long, embedding array<double>",
    )
    dq = dequantize(scalar_quantize(df, vec_col="embedding", bits=8))
    rows = dq.select(
        "vec_id",
        "qvec",
        F.array_max(
            F.zip_with("dqvec", "embedding", lambda a, b: F.abs(a - b))
        ).alias("err"),
        (F.col("qvec_max") - F.col("qvec_min")).alias("range"),
    ).collect()
    for r in rows:
        # one quantization step = range/255; reconstruction error < one step
        assert r["err"] <= r["range"] / 255.0 + 1e-12
        assert all(0 <= c <= 255 for c in r["qvec"])
    # range endpoints map to code 0 and 255
    codes = {r["vec_id"]: r["qvec"] for r in rows}
    assert codes[1][0] == 0 and codes[1][2] == 255


def test_scalar_quantize_constant_vector(spark):
    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<double>"
    )
    row = dequantize(scalar_quantize(df)).collect()[0]
    assert row["qvec"] == [0, 0, 0]
    assert row["dqvec"] == [2.5, 2.5, 2.5]  # degenerate range dequantizes back


def test_tfidf_ranks_rare_terms_above_common(spark):
    df = spark.createDataFrame(
        [
            (1, "apple apple banana common"),
            (2, "cherry common"),
            (3, "banana common"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2)
    top = {
        r["doc_id"]: r["term"]
        for r in out.filter(F.col("term_rank") == 1).collect()
    }
    # doc 1: apple has tf=2 and df=1 → top; 'common' (df=3) never ranks first
    assert top == {1: "apple", 2: "cherry", 3: "banana"}
    assert out.filter(F.col("term") == "common").filter(
        F.col("term_rank") == 1
    ).count() == 0


def test_pack_chunks_conservation_and_overflow_bound(spark):
    from bigdatafraude_ml_graphx_spark.operators.chunking import pack_chunks

    rows = []
    for doc in range(6):
        for cid in range(4):
            rows.append(("g1" if doc < 3 else "g2", doc, cid, 7 + (doc + cid) % 10))
    chunks = spark.createDataFrame(
        rows, "lang string, doc long, chunk_id long, n_chunk_tokens long"
    )
    out = pack_chunks(chunks, budget_tokens=20, group_col="lang").collect()
    total_in = sum(r[3] for r in rows)
    assert sum(r["bin_tokens"] for r in out) == total_in  # nothing lost
    assert sum(r["n_chunks"] for r in out) == len(rows)
    max_chunk = max(r[3] for r in rows)
    for r in out:
        # a bin exceeds the budget by at most one chunk's tail
        assert r["bin_tokens"] <= 20 + max_chunk - 1
    # bins are contiguous from 0 within each group
    for g in ("g1", "g2"):
        bins = sorted(r["bin_id"] for r in out if r["lang"] == g)
        assert bins == list(range(len(bins)))


def test_snapshot_diff_row_level(spark):
    from bigdatafraude_ml_graphx_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "id long, t string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged; 2 unchanged (NULL == NULL null-safe); 3 changed;
        # 4 removed; 5 added
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.5), (5, "e", 5.0)],
        "id long, t string, v double",
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            old, new, key_cols=("id",), compare_cols=("t", "v")
        ).collect()
    }
    assert got == {3: "changed", 4: "removed", 5: "added"}  # 1,2 dropped


def test_snapshot_diff_null_transition_is_change(spark):
    from bigdatafraude_ml_graphx_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(1, None)], "id long, v double")
    new = spark.createDataFrame([(1, 0.0)], "id long, v double")
    rows = snapshot_diff(old, new, ("id",), ("v",)).collect()
    assert [(r["id"], r["status"]) for r in rows] == [(1, "changed")]


def test_merge_upsert_semantics(spark):
    """Source wins on match (including NULL payloads), deletes drop, inserts
    append, unmatched target survives."""
    from bigdatafraude_ml_graphx_spark.operators.cdc import merge_upsert

    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    src = spark.createDataFrame(
        [(2, None, 99.0, False),   # update with intended NULL name
         (3, "c", 30.0, True),     # delete
         (5, "e", 50.0, False)],   # insert
        "k long, name string, v double, _deleted boolean",
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(tgt, src, ["k"], "_deleted").collect()}
    assert out == {
        1: ("a", 10.0),
        2: (None, 99.0),   # NULL must NOT be coalesced back to 'b'
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


def test_merge_then_diff_roundtrip(spark, sf_dir):
    """CDC closure property: applying a change batch via merge_upsert then
    snapshot-diffing the result against an independently-constructed
    expected table reports ZERO differences — merge, compact, and diff
    agree on what the post-change world looks like."""
    from pyspark.sql import functions as F

    from bigdatafraude_ml_graphx_spark.catalog import load_table
    from bigdatafraude_ml_graphx_spark.operators.cdc import merge_upsert, snapshot_diff

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    k = F.col("c_custkey")
    upd = (
        c.filter((k % 3 == 0) & (k % 17 != 0))
        .withColumn("c_acctbal", F.col("c_acctbal") * 2)
        .withColumn("_deleted", F.lit(False))
    )
    dele = c.filter(k % 17 == 0).withColumn("_deleted", F.lit(True))
    src = upd.unionByName(dele)
    merged = merge_upsert(c, src, ["c_custkey"], delete_col="_deleted")

    # expected world, constructed independently of the merge operator
    expected = (
        c.filter(~(k % 17 == 0))
        .withColumn(
            "c_acctbal",
            F.when((k % 3 == 0), F.col("c_acctbal") * 2).otherwise(F.col("c_acctbal")),
        )
    )
    diff = snapshot_diff(
        merged, expected, ["c_custkey"], ["c_name", "c_acctbal"]
    )
    assert diff.count() == 0


def test_merge_upsert_rejects_duplicate_source_keys(spark):
    """SQL MERGE raises on multiple source matches per key; so does the
    operator (executor-side raise_error riding the delete flag). A
    pre-compacted source, or assert_unique_source=False, skips the check."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from bigdatafraude_ml_graphx_spark.operators.cdc import (
        latest_by_key,
        merge_upsert,
    )

    tgt = spark.createDataFrame([(1, "a")], ["k", "v"])
    dup_src = spark.createDataFrame(
        [(1, "new1", 10), (1, "new2", 20), (2, "ins", 30)], ["k", "v", "ts"]
    )
    with _pytest.raises(SparkRuntimeException, match="duplicate source rows"):
        merge_upsert(tgt, dup_src.drop("ts"), ["k"]).collect()
    # the documented remedy: compact the change log first
    compacted = latest_by_key(dup_src, ["k"], ["ts"]).drop("ts")
    out = {r.k: r.v for r in merge_upsert(tgt, compacted, ["k"]).collect()}
    assert out == {1: "new2", 2: "ins"}
    # opt-out keeps the raw (fan-out) behavior for callers that want it
    n = merge_upsert(
        tgt, dup_src.drop("ts"), ["k"], assert_unique_source=False
    ).count()
    assert n == 3
