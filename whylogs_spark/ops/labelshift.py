"""Label-shift (prior-shift) estimation: how did the CLASS MIX move
between training and production, using only a black-box classifier's
predictions — no target labels needed.

BBSE (Lipton, Wang & Smola, ICML 2018): with source-validation pairs
``(y, y_hat)`` and target predictions ``y_hat`` only,

    C[i, j] = P_src(y_hat = i, y = j)     (k x k joint confusion)
    mu[i]   = P_tgt(y_hat = i)
    solve C w = mu  ->  w[j] = P_tgt(y = j) / P_src(y = j)

The importance weights ``w`` re-weight source data to the target
label mix (training-set re-sampling, prior-corrected inference), and
``P_tgt(y = j) = w[j] * P_src(y = j)`` is the estimated production
class prior — drift monitoring's "did the base rate move" answer
when the ground truth lags (fraud, churn, medical review queues).

Scale shape: ONE partial-agged pass per frame — the k x k confusion
cells from validation and the k-vector prediction counts from the
target — then a driver-side numpy solve on the k x k system
(``max_classes`` guards k at plan build).  No SQL oracle: the matrix
inversion is a driver solve, so the gate is rows-only with a numpy
cross-implementation and a planted-shift recovery test
(tests/test_labelshift.py).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_shift_bbse"]


def label_shift_bbse(
    source: DataFrame,
    target: DataFrame,
    label_col: str,
    pred_col: str,
    max_classes: int = 1000,
    clip_negative: bool = True,
) -> DataFrame:
    """-> one row per class seen in source labels or predictions:
    ``(label, weight, p_source, p_target_est, n_source, n_target)``.

    ``source`` needs ``label_col`` + ``pred_col``; ``target`` needs
    only ``pred_col``.  Classes are the union of source labels and
    both frames' predictions (a prediction class never labeled in
    source gets a zero confusion column — its weight is whatever the
    least-squares solve assigns, usually ~0).  Singular/ill-posed
    systems fall back to least squares.  ``clip_negative`` floors
    estimated weights at 0 and renormalizes the implied target prior
    to sum to 1 (the published practice; raw solutions can go
    slightly negative under sampling noise).  Null labels /
    predictions drop.
    """
    sl = F.col(label_col).cast("string")
    sp = F.col(pred_col).cast("string")
    src = (source.filter(sl.isNotNull() & sp.isNotNull())
           .select(sl.alias("__y"), sp.alias("__p")))
    tgt = (target.filter(F.col(pred_col).isNotNull())
           .select(F.col(pred_col).cast("string").alias("__p")))

    cells = src.groupBy("__p", "__y").count().collect()
    tcounts = tgt.groupBy("__p").count().collect()
    if not cells:
        raise ValueError("source frame has no labeled rows")
    if not tcounts:
        raise ValueError("target frame has no predictions")

    classes = sorted({r["__y"] for r in cells}
                     | {r["__p"] for r in cells}
                     | {r["__p"] for r in tcounts})
    k = len(classes)
    if k > max_classes:
        raise ValueError(
            f"{k} classes > max_classes={max_classes}: the solve is "
            "k x k driver-side — this is for class labels, not ids")
    idx = {c: i for i, c in enumerate(classes)}

    n_src = sum(r["count"] for r in cells)
    n_tgt = sum(r["count"] for r in tcounts)
    C = np.zeros((k, k))
    for r in cells:
        C[idx[r["__p"]], idx[r["__y"]]] = r["count"] / n_src
    mu = np.zeros(k)
    for r in tcounts:
        mu[idx[r["__p"]]] = r["count"] / n_tgt
    p_src = C.sum(axis=0)  # column sums = P_src(y = j)

    try:
        w = np.linalg.solve(C, mu)
    except np.linalg.LinAlgError:
        w, *_ = np.linalg.lstsq(C, mu, rcond=None)
    if clip_negative:
        w = np.clip(w, 0.0, None)
    p_tgt = w * p_src
    tot = p_tgt.sum()
    if clip_negative and tot > 0:
        p_tgt = p_tgt / tot

    rows = [(c, float(w[i]), float(p_src[i]), float(p_tgt[i]),
             int(n_src), int(n_tgt))
            for i, c in enumerate(classes)]
    return source.sparkSession.createDataFrame(
        rows, "label string, weight double, p_source double, "
              "p_target_est double, n_source long, n_target long")
