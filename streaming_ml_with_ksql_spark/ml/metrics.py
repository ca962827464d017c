"""Model-evaluation metrics as DataFrame operators.

The reference trains and serves a classifier but never reports quality
beyond the training job's AUC (reference: SparkTrainingJob §evaluator);
a production scoring pipeline owes its owners a continuously-computable
evaluation surface. ``classification_report`` is the standard one —
per-class precision/recall/F1 plus support — computed from three keyed
counts (true, predicted, agreeing) over a (label, prediction) frame.

Exactness discipline: every metric is a ratio of small integers
evaluated through ONE fixed expression shape both engines restate
verbatim (the zscore/scale_features pattern), with zero-denominator
guards emitting 0.0 — so reports hash-check exactly cross-engine.
Shape: three map-side-combined aggregations over one scan, joined on
the bounded class dimension — no shuffle touches the corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["classification_report"]


def classification_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """(class, n_true_d, n_pred_d, tp_d, precision, recall, f1) — one row
    per class observed as label OR prediction; metrics rounded at 6 dp
    with 0.0 for undefined (empty-denominator) cases."""
    pairs = df.select(
        F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
    )
    classes = (
        pairs.select(F.col("label").alias("class"))
        .unionByName(pairs.select(F.col("pred").alias("class")))
        .distinct()
    )
    n_true = pairs.groupBy(F.col("label").alias("class")).agg(
        F.count(F.lit(1)).cast("double").alias("n_true_d")
    )
    n_pred = pairs.groupBy(F.col("pred").alias("class")).agg(
        F.count(F.lit(1)).cast("double").alias("n_pred_d")
    )
    tp = (
        pairs.filter(F.col("label") == F.col("pred"))
        .groupBy(F.col("label").alias("class"))
        .agg(F.count(F.lit(1)).cast("double").alias("tp_d"))
    )
    base = (
        classes.join(n_true, "class", "left")
        .join(n_pred, "class", "left")
        .join(tp, "class", "left")
        .select(
            "class",
            F.coalesce("n_true_d", F.lit(0.0)).alias("n_true_d"),
            F.coalesce("n_pred_d", F.lit(0.0)).alias("n_pred_d"),
            F.coalesce("tp_d", F.lit(0.0)).alias("tp_d"),
        )
    )
    p = F.when(
        F.col("n_pred_d") > 0, F.col("tp_d") / F.col("n_pred_d")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("n_true_d") > 0, F.col("tp_d") / F.col("n_true_d")
    ).otherwise(F.lit(0.0))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return base.select(
        "class",
        "n_true_d",
        "n_pred_d",
        "tp_d",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
