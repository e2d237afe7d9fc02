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


# ---------------------------------------------------------------------------
# q185 — GBT quality contract (graduates q32's rows-only check)
# ---------------------------------------------------------------------------

_GBT_ACC_MIN = 0.95
_GBT_AUC_MIN = 0.95


@query(
    "q185_gbt_quality_contract",
    oracle=f"""
    WITH e AS (
      SELECT CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END AS label
      FROM embeddings
      WHERE CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 4))
                 AS INTEGER) % 10 >= 8)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg,
           TRUE AS accuracy_ok,
           TRUE AS auc_ok
    FROM e
    """,
)
def q185_gbt_quality_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated quality contract for the GBT pipeline — the
    q140/q172/q179 discipline applied to the last rows-only pair (q32
    stays rows-only underneath: the trained ensemble itself is
    legitimately engine-specific). Three properties the oracle pins
    exactly:

    (a) **confusion-marginal consistency** — n_test/n_pos/n_neg are
        computed from the CONFUSION MATRIX (TP+FN, TN+FP, total), so a
        hash match proves the scored split's marginals equal the data's;
    (b) **the split is the deterministic md5 split** (q135's discipline,
        h ≥ 8 → 20% test) — reproducible on any engine, unlike
        randomSplit;
    (c) **the machinery learns a learnable signal** — the label is the
        sign of the first embedding component (an exact, float-free SQL
        predicate; the fixture's own labels are random w.r.t. the
        embeddings — AUC ≈ 0.47 — so they cannot certify learning), and
        accuracy/AUC on held-out data must clear {_GBT_ACC_MIN}
        (measured ≥ 0.98 at sf0.001/0.01/0.1; a monotone single-feature
        threshold is exactly the shape greedy trees learn — an XOR
        construction was rejected because greedy splits see zero
        marginal gain on it).

    The confusion matrix is ≤4 rows — the collect is a bounded scalar
    read (q179 contract class), never a data collect."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "label", (F.element_at("embedding", 1) > 0).cast("int")
    )
    h = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 10
    )
    df = assemble_features(emb, array_col="embedding").withColumn("h", h)
    train = df.filter(F.col("h") < 8)
    test = df.filter(F.col("h") >= 8)
    model = train_gbt(train, max_iter=10)
    pred = model.transform(test).localCheckpoint(eager=True)  # scored once
    cm = {
        (r["label"], r["prediction"]): r["n"]
        for r in confusion_matrix(pred).collect()
    }
    n_pos = cm.get((1, 1), 0) + cm.get((1, 0), 0)  # TP + FN
    n_neg = cm.get((0, 0), 0) + cm.get((0, 1), 0)  # TN + FP
    n_test = n_pos + n_neg
    accuracy = (cm.get((1, 1), 0) + cm.get((0, 0), 0)) / n_test
    auc = BinaryClassificationEvaluator(labelCol="label").evaluate(pred)
    return spark.createDataFrame(
        [
            (
                n_test,
                n_pos,
                n_neg,
                accuracy >= _GBT_ACC_MIN,
                auc >= _GBT_AUC_MIN,
            )
        ],
        "n_test long, n_pos long, n_neg long, accuracy_ok boolean,"
        " auc_ok boolean",
    )
