"""ONE composed end-to-end replay of the reference pipeline shape
(SURVEY §5.2): clean → split 0.8/0.2 seed 42 → per-class aggregation →
GBT train/score → confusion matrix → co-occurrence graph → connected
components / PageRank → windowed stream — asserting the golden-fact
INVARIANTS (not the reference's exact numbers, which belong to its private
dataset):

* counts conserved through cleaning and splitting
  (``1_data_cleaning.ipynb`` cell c3305a97 / cd9f0218);
* null census all zeros after cleaning (cell 0120673f);
* per-class aggregate rows = number of classes (``2_sql_analysis.ipynb``
  cell d7dee7d7);
* confusion matrix sums to the test-set size (``3_ml_fraud.ipynb``
  cell 711f4a51);
* fraud's average PageRank strictly exceeds normal's
  (``4_graphx.ipynb`` cell ac3e7869: 3.136e-6 vs 5.441e-7);
* the streamed windowed aggregate equals its batch recomputation
  (SURVEY §5.4).

Each stage is covered piecewise elsewhere; this test guards the SEAMS —
column contracts between stages — as a single regression net.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.graph import (
    connected_components,
    cooccurrence_edges,
    degrees,
    pagerank,
)
from bigdatafraude_ml_graphx_spark.graph.pagerank import normalize_weights
from bigdatafraude_ml_graphx_spark.ml import (
    assemble_features,
    confusion_matrix,
    evaluate_binary,
    threshold_alerts,
    train_gbt,
    train_test_split,
)
from bigdatafraude_ml_graphx_spark.operators.relational import null_census
from bigdatafraude_ml_graphx_spark.streaming import (
    memory_sink,
    run_available_now,
    windowed_agg,
)


@pytest.fixture(scope="module")
def transactions(spark):
    """Synthetic transactions mirroring the reference dataset's shape:
    rare fraud, separable features, and fraud entities that co-occur in the
    same hour buckets (the reference's fraud graph is a dense cluster —
    largest component 43 nodes, 100% fraud, cell 44735382)."""
    n = 4000
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("tx_id"),
            *[(F.rand(seed=7 + i) * 2 - 1).alias(f"x{i}") for i in range(4)],
        )
        # ~5% fraud, decided by a separable rule + margin so GBT learns it
        .withColumn("label", ((F.col("x0") + F.col("x1")) > 1.2).cast("int"))
        .withColumn(
            "amount",
            F.when(F.col("label") == 1, 500 + F.rand(seed=31) * 2000).otherwise(
                F.rand(seed=32) * 200
            ),
        )
        # fraud users share a small id pool (they collude); normals are spread
        .withColumn(
            "user_id",
            F.when(
                F.col("label") == 1, 9000 + F.pmod(F.col("tx_id"), F.lit(8))
            ).otherwise(F.col("tx_id") % 1000),
        )
        # fraud concentrates in two hours; normal traffic is spread over 48
        .withColumn(
            "ts",
            F.when(
                F.col("label") == 1,
                F.to_timestamp(F.lit("2024-03-01 10:00:00"))
                + F.make_interval(mins=F.pmod(F.col("tx_id"), F.lit(120))),
            ).otherwise(
                F.to_timestamp(F.lit("2024-03-01 00:00:00"))
                + F.make_interval(mins=F.pmod(F.col("tx_id") * 7, F.lit(2880)))
            ),
        )
        # a few NULL rows for the cleaning stage to remove
        .withColumn(
            "x3", F.when(F.col("tx_id") % 500 == 3, None).otherwise(F.col("x3"))
        )
    )
    return base.localCheckpoint(eager=True)


def test_reference_pipeline_replay(spark, transactions):
    raw_n = transactions.count()

    # ---- 1. clean: drop NULL rows; census must then be all zeros ----------
    clean = transactions.dropna()
    assert clean.count() == raw_n - transactions.filter(F.col("x3").isNull()).count()
    census = null_census(clean).collect()[0]
    assert all(v == 0 for v in census.asDict().values())

    # ---- 2. split 0.8/0.2 seed 42: conserves rows, ~80/20 -----------------
    train, test = train_test_split(clean, (0.8, 0.2), seed=42)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == clean.count()
    assert 0.7 < n_train / clean.count() < 0.9

    # ---- 3. per-class aggregation (2_sql_analysis cell d7dee7d7 shape) ----
    per_class = (
        train.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.avg("amount").alias("avg_amount"),
            F.sum("amount").alias("sum_amount"),
            F.max("amount").alias("max_amount"),
        )
        .collect()
    )
    stats = {r["label"]: r for r in per_class}
    assert set(stats) == {0, 1}
    assert stats[1]["avg_amount"] > stats[0]["avg_amount"]  # fraud runs hot
    assert stats[0]["n"] > stats[1]["n"]  # fraud is the minority class

    # ---- 4. GBT train → score → confusion sums to test size ---------------
    feats = [f"x{i}" for i in range(4)]
    model = train_gbt(assemble_features(train, input_cols=feats), max_iter=10)
    preds = model.transform(assemble_features(test, input_cols=feats))
    metrics = evaluate_binary(preds)
    assert metrics["areaUnderROC"] > 0.95
    cm = confusion_matrix(preds).collect()
    assert sum(r["n"] for r in cm) == n_test
    alerts_hi = threshold_alerts(preds, 0.9).count()
    alerts_lo = threshold_alerts(preds, 0.5).count()
    assert alerts_hi <= alerts_lo  # monotone thresholding

    # ---- 5. fraud co-occurrence graph → degrees / CC / PageRank -----------
    fraud = clean.filter(F.col("label") == 1)
    edges = cooccurrence_edges(fraud, entity_col="user_id", ts_col="ts")
    assert edges.filter(F.col("src") >= F.col("dst")).count() == 0  # canonical
    deg = degrees(edges)
    assert deg.agg(F.max("degree")).collect()[0][0] >= 2

    comp = connected_components(edges)
    sizes = comp.groupBy("component").count()
    largest = sizes.agg(F.max("count")).collect()[0][0]
    assert largest >= 5  # the colluding pool forms one dense component

    # PageRank over the WHOLE transaction graph: fraud must out-rank normal
    # (the reference's headline finding, cell ac3e7869).
    all_edges = cooccurrence_edges(
        clean, entity_col="user_id", ts_col="ts"
    ).withColumn("weight", F.col("weight").cast("double"))
    pr = pagerank(normalize_weights(all_edges), max_iter=5)
    label_of = clean.select(
        F.col("user_id").alias("id"), "label"
    ).groupBy("id").agg(F.max("label").alias("label"))
    by_class = (
        pr.join(label_of, "id")
        .groupBy("label")
        .agg(F.avg("pagerank").alias("avg_pr"))
        .collect()
    )
    avg_pr = {r["label"]: r["avg_pr"] for r in by_class}
    assert avg_pr[1] > avg_pr[0]

    # ---- 6. windowed stream == batch recomputation ------------------------
    src = str(spark.conf.get("spark.local.dir", "/tmp")) + "/e2e_stream_src"
    clean.select("ts", "label", "amount").write.mode("overwrite").parquet(src)
    from bigdatafraude_ml_graphx_spark.streaming import file_stream

    stream = file_stream(spark, src, "ts timestamp_ntz, label int, amount double")
    agg = windowed_agg(
        stream,
        ts_col="ts",
        window="1 hour",
        watermark=None,
        group_cols=("label",),
        aggs=(F.count("*").alias("n"), F.sum("amount").alias("amt")),
    )
    q = memory_sink(agg, "e2e_sink", output_mode="complete", available_now=True)
    run_available_now(q)
    streamed = {
        (r["window_start"], r["label"]): (r["n"], round(r["amt"], 6))
        for r in spark.table("e2e_sink").collect()
    }
    batch = {
        (r["window_start"], r["label"]): (r["n"], round(r["amt"], 6))
        for r in windowed_agg(
            clean.select("ts", "label", "amount"),
            ts_col="ts",
            window="1 hour",
            group_cols=("label",),
            aggs=(F.count("*").alias("n"), F.sum("amount").alias("amt")),
        ).collect()
    }
    assert streamed == batch and len(streamed) > 0
