"""Model-performance metrics: confusion matrix, regression, accuracy.

Reference equivalents:
  ConfusionMatrix  python/whylogs/core/model_performance_metrics/confusion_matrix.py:43
      — per-(target, pred) cell with a score distribution; the reference
      caps labels at 256 and re-encodes on merge; here a cell is just a
      grouped row, so merge is a second groupBy — no label cap needed.
  RegressionMetrics python/whylogs/core/model_performance_metrics/regression_metrics.py:7
      — count, sum |err|, sum err^2 -> MAE/MSE/RMSE, trivially mergeable.
  AccuracyEstimator python/whylogs/experimental/performance_estimation/estimators.py:28
      — reference per-segment accuracies weighted by target segment volumes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame,
    target_col: str,
    prediction_col: str,
    score_col: Optional[str] = None,
) -> DataFrame:
    """(target, prediction, cnt [, mean_score, min_score, max_score]).

    Nulls map to the string "None" like the reference's label handling
    (confusion_matrix.py:57-69 sorts "None" last).
    """
    t = F.coalesce(F.col(target_col).cast("string"), F.lit("None"))
    p = F.coalesce(F.col(prediction_col).cast("string"), F.lit("None"))
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if score_col is not None:
        aggs += [
            F.avg(score_col).alias("mean_score"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
        ]
    return (
        df.groupBy(t.alias("target"), p.alias("prediction"))
        .agg(*aggs)
        .orderBy("target", "prediction")
    )


def regression_metrics(
    df: DataFrame, prediction_col: str, target_col: str
) -> DataFrame:
    """One row: n, mae, mse, rmse, mean_error (exact, mergeable sums)."""
    err = F.col(prediction_col) - F.col(target_col)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.abs(err)).alias("mae"),
        F.avg(err * err).alias("mse"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(err).alias("mean_error"),
    )


def accuracy(
    df: DataFrame, target_col: str, prediction_col: str
) -> DataFrame:
    return df.agg(
        (F.sum((F.col(target_col) == F.col(prediction_col)).cast("long"))
         / F.count(F.lit(1))).alias("accuracy"),
        F.count(F.lit(1)).alias("n"),
    )


def estimated_accuracy(
    reference_segmented: DataFrame, target_volumes: DataFrame
) -> DataFrame:
    """AccuracyEstimator: join reference per-segment accuracy with target
    per-segment volumes; weighted average. Both inputs are tiny profile
    tables -> broadcast join.

    reference_segmented: (segment, accuracy)
    target_volumes:      (segment, n)
    """
    j = reference_segmented.join(
        F.broadcast(target_volumes), "segment", "inner")
    return j.agg(
        (F.sum(F.col("accuracy") * F.col("n")) / F.sum("n"))
        .alias("estimated_accuracy"),
        F.sum("n").alias("n_target"),
    )
