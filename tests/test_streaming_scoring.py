"""T9 parity: model scoring inside a real Structured Streaming query.

The reference fakes this with a while-True parquet poll
(``/root/reference/streaming/.ipynb_checkpoints/spark_streaming-checkpoint.py:48-110``);
the engine composes the ML module with foreachBatch — train once, score every
micro-batch distributed, write alerts idempotently."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.catalog import load_table
from bigdatafraude_ml_graphx_spark.ml import (
    assemble_features,
    threshold_alerts,
    train_gbt,
)
from bigdatafraude_ml_graphx_spark.streaming import (
    file_stream,
    foreach_batch_sink,
    run_available_now,
)


def test_stream_scoring_with_foreach_batch(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "label", (F.col("label") >= 5).cast("int")
    )
    model = train_gbt(
        assemble_features(emb, array_col="embedding"), max_iter=5
    )

    # Stage the embeddings file as a streaming source dir.
    src = str(tmp_path / "emb_src")
    os.makedirs(src)
    os.symlink(
        os.path.join(sf_dir, "embeddings.parquet"),
        os.path.join(src, "embeddings.parquet"),
    )
    stream = file_stream(
        spark, src, "vec_id long, embedding array<float>, label int"
    )

    out = str(tmp_path / "alerts")

    def score_batch(batch_df, batch_id):
        feats = assemble_features(batch_df, array_col="embedding")
        scored = threshold_alerts(model.transform(feats), threshold=0.5)
        (
            scored.select("vec_id", "score", F.lit(batch_id).alias("batch_id"))
            .write.mode("append")
            .parquet(out)
        )

    q = foreach_batch_sink(
        stream,
        score_batch,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
        output_mode="append",
    )
    run_available_now(q)

    alerts = spark.read.parquet(out)
    # Same model + same rows in batch mode must produce the same alert set.
    batch_alerts = threshold_alerts(
        model.transform(assemble_features(emb, array_col="embedding")), 0.5
    )
    assert alerts.count() == batch_alerts.count() > 0
    streamed_ids = {r["vec_id"] for r in alerts.select("vec_id").collect()}
    batch_ids = {r["vec_id"] for r in batch_alerts.select("vec_id").collect()}
    assert streamed_ids == batch_ids


def test_stream_to_jdbc_end_to_end(spark, tmp_path):
    """The reference's stream-to-database flow
    (/root/reference/streaming/spark_to_postgres.py:26-34) end-to-end
    against Spark's embedded Derby driver: file stream → foreachBatch →
    distributed df.write.jdbc with the batch_id idempotence key → read back
    and reconcile."""
    from bigdatafraude_ml_graphx_spark.sources.io import read_jdbc
    from bigdatafraude_ml_graphx_spark.streaming import (
        file_stream,
        foreach_batch_sink,
        run_available_now,
    )
    from bigdatafraude_ml_graphx_spark.streaming.sinks import jdbc_batch_writer

    src = str(tmp_path / "src")
    df = spark.range(100).selectExpr("id", "id * 2 AS amount")
    df.coalesce(2).write.parquet(src)

    url = f"jdbc:derby:{tmp_path}/streamdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    stream = file_stream(spark, src, "id bigint, amount bigint")
    q = foreach_batch_sink(
        stream,
        jdbc_batch_writer(url, "stream_out", props),
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
    )
    run_available_now(q)

    back = read_jdbc(spark, url, "stream_out", props)
    assert back.count() == 100
    assert set(back.columns) == {"id", "amount", "batch_id"}
    assert back.agg(F.sum("amount")).collect()[0][0] == sum(2 * i for i in range(100))
