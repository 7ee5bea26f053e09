"""Label-noise detection via confident learning (Northcutt et al.
2021, simplified): estimate which rows are probably MIS-LABELED from
the model's predicted class probabilities — the triage step before
retraining on a corpus with crowdsourced or heuristic labels.

Two passes, both bounded:

1. ``class thresholds`` — t_c = mean predicted probability of class c
   among rows LABELED c (one groupBy(label) aggregation, k rows,
   broadcast back).
2. ``confident joint`` — a row labeled i counts into cell (i, j) when
   class j's probability >= t_j and j is the argmax among classes
   over their thresholds (one more single-pass aggregation over the
   k×k cell space).

Off-diagonal mass is the estimated label-error rate; per-row output
flags the suspects with a margin score so the worst offenders sort
first for human review.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["confident_joint", "label_issues"]


def _suggest_expr(prob_cols: Dict[str, str], thr) -> Column:
    """argmax_j over classes with prob_j >= t_j of (prob_j − t_j)
    margin; null when no class clears its threshold.  Struct-max
    breaks margin ties by class name (deterministic)."""
    cands = F.array(*[
        F.when(F.col(pc) >= thr[c],
               F.struct((F.col(pc) - thr[c]).alias("m"),
                        F.lit(c).alias("cls")))
        for c, pc in sorted(prob_cols.items())
    ])
    return F.array_max(F.filter(cands, lambda x: x.isNotNull()))


def confident_joint(
    df: DataFrame,
    label_col: str,
    prob_cols: Dict[str, str],
) -> DataFrame:
    """The confident-joint matrix: ``(given_label, suggested_label,
    n)`` — counts of rows whose given label is i but
    whose CONFIDENT prediction (probability above that class's own
    mean-on-its-labeled-rows threshold, max margin wins) is j.
    Off-diagonal cells estimate the label-error mass.

    ``prob_cols`` maps class label -> probability column.  Rows whose
    label is not a known class, or where no class clears its
    threshold, are excluded (the conservative convention).
    """
    if len(prob_cols) < 2:
        raise ValueError("need >= 2 classes")
    lab = F.col(label_col).cast("string")
    base = df.filter(
        lab.isin(list(prob_cols))).select(
        lab.alias("__given"),
        *[F.col(pc).cast("double").alias(pc)
          for pc in prob_cols.values()])
    # pass 1: per-class thresholds t_c (k-row agg folded into ONE
    # broadcastable row)
    one = base.groupBy("__given").agg(
        *[F.avg(pc).alias(f"__t_{c}")
          for c, pc in prob_cols.items()]).agg(*[
        F.max(F.when(F.col("__given") == F.lit(c),
                     F.col(f"__t_{c}"))).alias(f"__thr_{c}")
        for c in prob_cols])
    joined = base.crossJoin(F.broadcast(one))
    thr = {c: F.col(f"__thr_{c}") for c in prob_cols}
    pick = _suggest_expr(prob_cols, thr)
    return (
        joined.select("__given", pick.alias("__p"))
        .filter(F.col("__p").isNotNull())
        .groupBy(F.col("__given").alias("given_label"),
                 F.col("__p.cls").alias("suggested_label"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("given_label", "suggested_label")
    )


def label_issues(
    df: DataFrame,
    label_col: str,
    prob_cols: Dict[str, str],
    id_col: str = "id",
) -> DataFrame:
    """Per-row label-issue flags: ``(id, given_label,
    suggested_label, margin)`` for every row whose CONFIDENT
    suggested class differs from its given label, margin = how far
    the suggested class's probability clears its threshold (sort
    descending for review priority).  Same two-pass shape as
    :func:`confident_joint`; the flagged set is the off-diagonal
    mass, orders of magnitude smaller than the corpus.
    """
    if len(prob_cols) < 2:
        raise ValueError("need >= 2 classes")
    lab = F.col(label_col).cast("string")
    base = df.filter(lab.isin(list(prob_cols))).select(
        F.col(id_col),
        lab.alias("given_label"),
        *[F.col(pc).cast("double").alias(pc)
          for pc in prob_cols.values()])
    one = base.groupBy("given_label").agg(
        *[F.avg(pc).alias(f"__t_{c}")
          for c, pc in prob_cols.items()]).agg(*[
        F.max(F.when(F.col("given_label") == F.lit(c),
                     F.col(f"__t_{c}"))).alias(f"__thr_{c}")
        for c in prob_cols])
    joined = base.crossJoin(F.broadcast(one))
    thr = {c: F.col(f"__thr_{c}") for c in prob_cols}
    pick = _suggest_expr(prob_cols, thr)
    return (
        joined.select(id_col, "given_label", pick.alias("__p"))
        .filter(F.col("__p").isNotNull()
                & (F.col("__p.cls") != F.col("given_label")))
        .select(id_col, "given_label",
                F.col("__p.cls").alias("suggested_label"),
                F.col("__p.m").alias("margin"))
    )
