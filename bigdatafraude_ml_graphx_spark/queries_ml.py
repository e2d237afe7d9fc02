"""ML query declarations (SURVEY §2.11) — rows-only checks.

GBT training/eval is not SQL-expressible, so these queries carry no
``oracle_sql`` entry; the driver records the weaker rows+schema check and the
pytest invariant suite (tests/test_ml.py) carries the correctness burden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .ml import (
    assemble_features,
    confusion_matrix,
    train_gbt,
    train_test_split,
)
from .queries import query


@query("q32_gbt_confusion")
def q32_gbt_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline shape (M1→M7): assemble features from the
    embedding array, 0.8/0.2 seed-42 split, GBTClassifier(maxIter=10), score
    the held-out split, return the confusion matrix
    (``groupBy(label, prediction).count()``,
    ``/root/reference/notebooks/3_ml_fraud.ipynb:185``)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "label", (F.col("label") >= 5).cast("int")
    )
    df = assemble_features(emb, array_col="embedding")
    train, test = train_test_split(df, (0.8, 0.2), seed=42)
    model = train_gbt(train, max_iter=10)
    return confusion_matrix(model.transform(test))
