"""Invariant tests for the ML module (SURVEY §5.3): GBT must separate a
linearly-separable fixture; confusion matrix conserves counts; threshold
alerting is monotone."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatafraude_ml_graphx_spark.ml import (
    assemble_features,
    confusion_matrix,
    evaluate_binary,
    evaluate_multiclass,
    threshold_alerts,
    train_gbt,
    train_test_split,
)


@pytest.fixture(scope="module")
def separable(spark):
    # 2000 rows, 5 features ~ U(-1,1); label = 1 iff x0 + x1 > 0 → a GBT
    # with depth 5 separates this nearly perfectly.
    df = (
        spark.range(2000)
        .select(
            "id",
            *[
                (F.rand(seed=100 + i) * 2 - 1).alias(f"x{i}")
                for i in range(5)
            ],
        )
        .withColumn(
            "label", (F.col("x0") + F.col("x1") > 0).cast("int")
        )
    )
    return assemble_features(df, input_cols=[f"x{i}" for i in range(5)])


@pytest.fixture(scope="module")
def fitted(separable):
    train, test = train_test_split(separable, (0.8, 0.2), seed=42)
    model = train_gbt(train, max_iter=10)
    preds = model.transform(test)
    return train, test, preds


def test_split_conserves_rows(separable, fitted):
    train, test, _ = fitted
    assert train.count() + test.count() == separable.count()


def test_gbt_separates(fitted):
    _, _, preds = fitted
    metrics = evaluate_binary(preds)
    assert metrics["areaUnderROC"] > 0.95
    assert metrics["areaUnderPR"] > 0.9
    mc = evaluate_multiclass(preds)
    assert mc["accuracy"] > 0.9


def test_confusion_matrix_conserves(fitted):
    _, test, preds = fitted
    cm = confusion_matrix(preds)
    assert cm.agg(F.sum("n")).collect()[0][0] == test.count()
    cells = {(r["label"], r["prediction"]) for r in cm.collect()}
    assert cells <= {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_threshold_alerts_monotone(fitted):
    _, _, preds = fitted
    n_low = threshold_alerts(preds, 0.5).count()
    n_high = threshold_alerts(preds, 0.9).count()
    assert n_high <= n_low
    assert threshold_alerts(preds, 0.5).filter(F.col("score") <= 0.5).count() == 0


def test_model_round_trip(tmp_path, fitted, separable):
    from bigdatafraude_ml_graphx_spark.ml import load_model, save_model

    train, test, preds = fitted
    model = train_gbt(train, max_iter=3)
    path = str(tmp_path / "gbt_model")
    save_model(model, path)
    reloaded = load_model(path)
    a = model.transform(test).select("id", "prediction")
    b = reloaded.transform(test).select("id", "prediction")
    assert a.exceptAll(b).count() == 0


def test_pipeline_model_round_trip(spark, tmp_path):
    """Pipeline(assembler+GBT) persists as one artifact and scores
    identically after reload — raw feature columns in, predictions out."""
    from bigdatafraude_ml_graphx_spark.ml.pipeline import (
        load_pipeline,
        train_pipeline,
    )

    rows = [(float(i % 7), float((3 * i) % 5), 1 if i % 7 > 3 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, label int")
    model = train_pipeline(df, ["f1", "f2"], max_iter=3)
    path = str(tmp_path / "pipeline_model")
    model.write().overwrite().save(path)
    reloaded = load_pipeline(path)
    a = model.transform(df).select("f1", "f2", "prediction").collect()
    b = reloaded.transform(df).select("f1", "f2", "prediction").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
