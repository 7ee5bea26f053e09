"""Ranking metrics over per-row prediction/target lists.

Reference: python/whylogs/experimental/api/logger/__init__.py:158
(log_batch_ranking_metrics) with row ops at :20-96 — recall@k,
precision@k, top_rank, average_precision@k, NDCG@k, sum_gain@k,
reciprocal rank. The reference computes these row-by-row in pandas;
here every metric is a higher-order array expression (transform /
aggregate / slice / array_position) that runs inside whole-stage codegen —
no UDF, no shuffle beyond the final aggregate.

Input model (mirrors the reference's batch API):
  * ``prediction_col``: array of predicted item ids, ranked best-first
  * ``target_col``: array of relevant item ids
  k defaults to the prediction list length.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hits(pred_k: Column, target: Column) -> Column:
    """array<int> of 0/1 relevance flags for the top-k predictions."""
    return F.transform(
        pred_k, lambda p: F.array_contains(target, p).cast("int"))


def with_ranking_metrics(
    df: DataFrame,
    prediction_col: str = "predictions",
    target_col: str = "targets",
    k: Optional[int] = None,
) -> DataFrame:
    """Adds per-row columns: recall_k, precision_k, top_rank, mrr,
    average_precision_k, ndcg_k, sum_gain_k."""
    pred = F.col(prediction_col)
    target = F.col(target_col)
    pred_k = F.slice(pred, 1, k) if k is not None else pred
    hits = _hits(pred_k, target)
    n_hits = F.aggregate(hits, F.lit(0), lambda a, x: a + x)
    n_rel = F.size(target)
    kk = F.size(pred_k)

    # first relevant rank (1-based; 0 if none)
    top_rank = F.coalesce(
        F.array_position(hits, 1).cast("long"), F.lit(0))

    # average precision@k: mean over hit positions of precision-at-that-rank
    idx = F.sequence(F.lit(1), kk)
    prec_at = F.zip_with(
        hits, idx,
        lambda h, i: h.cast("double")
        * F.aggregate(F.slice(hits, 1, i), F.lit(0),
                      lambda a, x: a + x).cast("double") / i.cast("double"),
    )
    ap_num = F.aggregate(prec_at, F.lit(0.0), lambda a, x: a + x)
    ap = F.when(n_hits > 0, ap_num / n_hits.cast("double")).otherwise(0.0)

    # DCG@k with binary gains; IDCG over min(n_rel, k) ideal positions
    dcg = F.aggregate(
        F.zip_with(hits, idx,
                   lambda h, i: h.cast("double") / F.log2(i + 1)),
        F.lit(0.0), lambda a, x: a + x)
    ideal_n = F.least(n_rel, kk)
    idcg = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.greatest(ideal_n, F.lit(1))),
                    lambda i: F.lit(1.0) / F.log2(i + 1)),
        F.lit(0.0), lambda a, x: a + x)
    ndcg = F.when(ideal_n > 0, dcg / idcg).otherwise(0.0)

    return (
        df.withColumn("recall_k",
                      F.when(n_rel > 0,
                             n_hits.cast("double") / n_rel.cast("double"))
                      .otherwise(0.0))
        .withColumn("precision_k",
                    F.when(kk > 0,
                           n_hits.cast("double") / kk.cast("double"))
                    .otherwise(0.0))
        .withColumn("top_rank", top_rank)
        .withColumn("mrr",
                    F.when(top_rank > 0,
                           F.lit(1.0) / top_rank.cast("double"))
                    .otherwise(0.0))
        .withColumn("average_precision_k", ap)
        .withColumn("ndcg_k", ndcg)
        .withColumn("sum_gain_k", n_hits.cast("long"))
    )


def ranking_summary(
    df: DataFrame,
    prediction_col: str = "predictions",
    target_col: str = "targets",
    k: Optional[int] = None,
) -> DataFrame:
    """Dataset-level means of the per-row ranking metrics (the reference
    then profiles the derived columns; both paths are available)."""
    d = with_ranking_metrics(df, prediction_col, target_col, k)
    return d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("recall_k").alias("mean_recall_k"),
        F.avg("precision_k").alias("mean_precision_k"),
        F.avg("mrr").alias("mean_reciprocal_rank"),
        F.avg("average_precision_k").alias("map_k"),
        F.avg("ndcg_k").alias("mean_ndcg_k"),
        F.avg("sum_gain_k").alias("mean_sum_gain_k"),
    )
