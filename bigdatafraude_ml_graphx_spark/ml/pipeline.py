"""ML surface (SURVEY §2.11): feature assembly → split → GBT → evaluation.

Thin, composable wrappers over MLlib mirroring the reference pipeline:
``VectorAssembler`` (``/root/reference/notebooks/1_data_cleaning.ipynb:309-318``),
``randomSplit([0.8,0.2], seed=42)`` (``:337-340``),
``GBTClassifier(maxIter=10)`` (``notebooks/3_ml_fraud.ipynb:103-110``),
binary/multiclass evaluators (``:159-177``), confusion matrix (``:185``),
model persistence (``:289``), and probability-threshold alerting
(``streaming/streaming_config.yaml:24``).

Design rule (SURVEY §7.0): VectorUDT stays INSIDE this module. The relational
surface exchanges ``array<double>`` columns; ``assemble_features`` accepts
either scalar columns or one array column and converts at the boundary
(``array_to_vector`` / ``vector_to_array`` — the same bridge the reference
needs at ``notebooks/2_sql_analysis.ipynb:142-150``).
"""

from __future__ import annotations

from pyspark.ml.classification import GBTClassificationModel, GBTClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(
    df: DataFrame,
    input_cols: list[str] | None = None,
    array_col: str | None = None,
    output_col: str = "features",
) -> DataFrame:
    """Build the MLlib ``features`` vector from scalar columns (reference
    style, 30 doubles) or from one ``array<float|double>`` column
    (embedding-table style)."""
    if array_col is not None:
        return df.withColumn(
            output_col,
            array_to_vector(F.col(array_col).cast("array<double>")),
        )
    assembler = VectorAssembler(inputCols=input_cols, outputCol=output_col)
    return assembler.transform(df)


def train_test_split(
    df: DataFrame, weights: tuple[float, float] = (0.8, 0.2), seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    train, test = df.randomSplit(list(weights), seed=seed)
    return train, test


def train_gbt(
    train: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    max_iter: int = 10,
    max_depth: int = 5,
    seed: int = 42,
) -> GBTClassificationModel:
    gbt = GBTClassifier(
        featuresCol=features_col,
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
    )
    return gbt.fit(train)


def evaluate_binary(
    predictions: DataFrame, label_col: str = "label"
) -> dict[str, float]:
    """ROC-AUC + PR-AUC (reference golden: 0.9709 / 0.7611)."""
    out = {}
    for metric in ("areaUnderROC", "areaUnderPR"):
        ev = BinaryClassificationEvaluator(
            labelCol=label_col, metricName=metric
        )
        out[metric] = ev.evaluate(predictions)
    return out


def evaluate_multiclass(
    predictions: DataFrame, label_col: str = "label"
) -> dict[str, float]:
    out = {}
    for metric in ("weightedPrecision", "weightedRecall", "weightedFMeasure", "accuracy"):
        ev = MulticlassClassificationEvaluator(
            labelCol=label_col, metricName=metric
        )
        out[metric] = ev.evaluate(predictions)
    return out


def confusion_matrix(
    predictions: DataFrame, label_col: str = "label"
) -> DataFrame:
    """``groupBy(label, prediction).count()`` — the reference's confusion
    matrix (golden: 56,653 TN / 69 TP / 17 FP / 23 FN)."""
    return (
        predictions.groupBy(
            F.col(label_col).cast("int").alias("label"),
            F.col("prediction").cast("int").alias("prediction"),
        )
        .agg(F.count("*").alias("n"))
    )


def threshold_alerts(
    predictions: DataFrame, threshold: float = 0.85
) -> DataFrame:
    """Rows whose positive-class probability exceeds the alert threshold
    (``probability[1] > t`` — reference checkpoint ``:55`` + config ``ml.threshold``)."""
    prob = vector_to_array(F.col("probability")).getItem(1)
    return predictions.withColumn("score", prob).filter(
        F.col("score") > F.lit(threshold)
    )


def save_model(model, path: str) -> None:
    model.write().overwrite().save(path)


def load_model(path: str) -> GBTClassificationModel:
    return GBTClassificationModel.load(path)


def train_pipeline(
    train: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    max_iter: int = 10,
    max_depth: int = 5,
    seed: int = 42,
):
    """Assembler + GBT as ONE ``Pipeline`` fit — the artifact shape the
    reference's scoring job loads (``PipelineModel.load``,
    ``streaming/.ipynb_checkpoints/spark_streaming-checkpoint.py:26``).
    Persisting the assembler WITH the model pins the feature order at
    training time; scoring jobs can then never skew columns."""
    from pyspark.ml import Pipeline

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    gbt = GBTClassifier(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
    )
    return Pipeline(stages=[assembler, gbt]).fit(train)


def load_pipeline(path: str):
    """Load a persisted ``PipelineModel`` (assembler + model, one artifact)."""
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)
