"""Split-conformal prediction intervals: the distribution-free
uncertainty wrapper for ANY point regressor — calibrate the
``ceil((n+1)(1−α))``-th absolute residual once, and ``ŷ ± q̂`` covers
the truth with probability ≥ 1−α on exchangeable data (Vovk et al.;
the modern split-conformal form of Lei et al. 2018).  The model-eval
companion to ``core.model_perf``'s point metrics.

One data shuffle: residuals collapse to a per-(group, value) count
table map-side, the rank walk is the shared two-phase grouped prefix
sum (``core.prefix``), and every group's q̂ + achieved calibration
coverage read off the walked table in one final aggregation —
identical shape to ``weighted_quantiles``, skew bound = one distinct
residual value.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_conformal"]


def split_conformal(
    df: DataFrame,
    y_col: str,
    yhat_col: str,
    alpha: float = 0.1,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Per-group conformal half-width over a CALIBRATION frame:
    ``(group…, n, qhat, coverage)`` where ``qhat`` is the
    ``ceil((n+1)(1−alpha))``-th smallest ``|y − ŷ|`` (the
    finite-sample-corrected quantile) and ``coverage`` the fraction
    of calibration residuals within it (≥ 1−alpha by construction —
    the sanity readback, not a test-set estimate).

    ``qhat`` is null when ``ceil((n+1)(1−alpha)) > n`` (the interval
    is formally infinite — too few calibration rows for this alpha).
    Null/NaN y or ŷ rows are excluded.  Groups = one row each.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    from whylogs_spark.core.prefix import grouped_running_sums

    groups = list(group_cols or [])
    y = F.col(y_col).cast("double")
    p = F.col(yhat_col).cast("double")
    base = (
        df.filter(y.isNotNull() & ~F.isnan(y)
                  & p.isNotNull() & ~F.isnan(p))
        .select(*groups, F.abs(y - p).alias("__r"))
    )
    g = base.groupBy(*groups, "__r").agg(
        F.count(F.lit(1)).alias("ct"))
    j = grouped_running_sums(g, groups, ["__r"], ["ct"])
    n = F.col("__g_ct")
    k = F.ceil((n.cast("double") + 1.0) * F.lit(1.0 - float(alpha)))
    hit = F.col("__cum_ct") >= k
    aggs = [
        F.first("__g_ct").alias("n"),
        # cum is monotone in __r: the first crossing is both the
        # quantile value and its coverage count
        F.min(F.when(hit, F.col("__r"))).alias("qhat"),
        F.min(F.when(hit, F.col("__cum_ct"))).alias("__cov_ct"),
    ]
    out = j.groupBy(*groups).agg(*aggs) if groups else j.agg(*aggs)
    return out.select(
        *groups, "n", "qhat",
        F.when(F.col("qhat").isNotNull(),
               F.col("__cov_ct").cast("double") / F.col("n"))
        .alias("coverage"))
