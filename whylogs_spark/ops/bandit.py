"""Beta-Bernoulli bandit evaluation: posterior summaries and
probability-of-being-best per arm from logged (arm, reward) data —
the Bayesian companion of the frequentist A/B family
(``ops/abtest.py``) and the evaluation side of Thompson sampling.

Counts come from ONE partial-agged groupBy (the only thing that
touches data); every posterior quantity is closed-form algebra on
the bounded (arms × 2) count table.  ``P(best)`` integrates
``P(arm_i > all others)`` by fixed-grid quadrature DRIVER-side over
the bounded table (deterministic — no sampling), the same
bounded-driver-solve pattern as the IRLS/EM fits.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bandit_report"]


def _log_beta(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def _beta_logpdf(x: float, a: float, b: float, lb: float) -> float:
    if x <= 0.0 or x >= 1.0:
        return -math.inf
    return (a - 1.0) * math.log(x) + (b - 1.0) * math.log1p(-x) - lb


def _beta_cdf_grid(a: float, b: float, grid) -> list:
    """CDF at grid points by trapezoid integration of the pdf —
    deterministic, no special functions beyond lgamma."""
    lb = _log_beta(a, b)
    pdf = [math.exp(_beta_logpdf(x, a, b, lb)) for x in grid]
    cdf = [0.0]
    for i in range(1, len(grid)):
        cdf.append(cdf[-1] + 0.5 * (pdf[i] + pdf[i - 1])
                   * (grid[i] - grid[i - 1]))
    top = cdf[-1] or 1.0
    return [min(c / top, 1.0) for c in cdf]


def bandit_report(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    prior_alpha: float = 1.0,
    prior_beta: float = 1.0,
    grid_points: int = 2001,
) -> DataFrame:
    """-> one row per arm: ``(arm, n, successes, posterior_mean,
    posterior_var, ci_lo, ci_hi, p_best)``.

    * rewards are binarized: any value > 0 counts as success (pass a
      pre-thresholded 0/1 column for custom definitions);
    * posterior = Beta(prior_alpha + s, prior_beta + n - s); mean,
      variance and the central 95% interval are closed form /
      grid-inverted;
    * ``p_best`` = ∫ pdf_i(x) · Π_{j≠i} CDF_j(x) dx on a uniform
      ``grid_points`` grid (trapezoid) — exact to grid resolution,
      reproducible run to run.

    Scale shape: ONE groupBy over the data; ALL posterior math runs
    driver-side on the (arms × 2) table — arms are bounded by the
    experiment design, not the data.
    """
    if prior_alpha <= 0 or prior_beta <= 0:
        raise ValueError("priors must be > 0")
    if grid_points < 101:
        raise ValueError(f"grid_points must be >= 101: {grid_points}")
    r = F.col(reward_col).cast("double")
    counts = (df.filter(F.col(arm_col).isNotNull()
                        & r.isNotNull() & ~F.isnan(r))
              .groupBy(arm_col)
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.sum(F.when(r > 0, 1).otherwise(0))
                   .cast("long").alias("s"))
              .collect())
    if not counts:
        raise ValueError("no usable (arm, reward) rows")
    arms = sorted((str(row[arm_col]), int(row["n"]), int(row["s"]))
                  for row in counts)

    grid = [i / (grid_points - 1) for i in range(grid_points)]
    posts = []
    for arm, n, s in arms:
        a = prior_alpha + s
        b = prior_beta + (n - s)
        posts.append((arm, n, s, a, b, _beta_cdf_grid(a, b, grid)))

    rows = []
    for i, (arm, n, s, a, b, _) in enumerate(posts):
        mean = a / (a + b)
        # plain multiplications (not **2): every factor is an exact
        # integer in a double while counts < ~9e15, so the value is
        # bit-identical to the SQL oracle's a*b/((a+b)*(a+b)*(a+b+1))
        var = a * b / ((a + b) * (a + b) * (a + b + 1.0))
        cdf = posts[i][5]
        def _inv(q):
            for k, c in enumerate(cdf):
                if c >= q:
                    return grid[k]
            return 1.0
        lb = _log_beta(a, b)
        p_best = 0.0
        prev = None
        for k, x in enumerate(grid):
            val = math.exp(_beta_logpdf(x, a, b, lb))
            for j, other in enumerate(posts):
                if j != i:
                    val *= other[5][k]
            if prev is not None:
                p_best += 0.5 * (val + prev) * (grid[k] - grid[k - 1])
            prev = val
        rows.append((arm, n, s, mean, var, _inv(0.025), _inv(0.975),
                     p_best))
    # normalize p_best to sum to 1 (grid quadrature leaves ~1e-6 slack)
    tot = sum(r_[7] for r_ in rows) or 1.0
    rows = [r_[:7] + (r_[7] / tot,) for r_ in rows]
    return df.sparkSession.createDataFrame(
        rows, f"{arm_col} string, n long, successes long, "
              "posterior_mean double, posterior_var double, "
              "ci_lo double, ci_hi double, p_best double")
