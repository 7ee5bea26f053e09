"""Kaplan-Meier survival estimation over right-censored durations —
time-to-churn / time-to-failure curves for user lifecycles, hardware
fleets, or label-delay analysis.

Beyond the reference (whose model metrics stop at classification /
regression / ranking — ``python/whylogs/core/model_performance_metrics``);
survival curves are the standard answer to "how long do users stay",
where naive averages are biased by the users who haven't churned YET
(right censoring).

Scale shape: the raw (duration, event) rows collapse to one row per
DISTINCT duration with a partial-aggregated groupBy; every ordered walk
after that runs through the two-phase range-partitioned prefix machinery
(``core.prefix.running_sums``) — no single-partition window over the
data, matching the repo-wide global-window audit. Two prefix passes
total: one for the at-risk counts, one for the log-survival /
Greenwood accumulations (the second depends on the first's output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whylogs_spark.core.prefix import running_sums

__all__ = ["km_survival"]


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier product-limit estimate.

    Input: one row per subject; ``duration_col`` (numeric time on
    study) and ``event_col`` (truthy = the event happened at that
    time; falsy = censored — still alive / still subscribed when
    observation ended). Null/NaN durations are excluded.

    Output, one row per distinct duration (ascending): ``(t, n_risk,
    n_events, n_censored, survival, se)`` where ``n_risk`` counts
    subjects with duration >= t, ``survival`` is the product-limit
    S(t) = prod_{t' <= t} (1 - d/n) over event times, and ``se`` is
    the Greenwood standard error (null once S hits 0, where the
    variance sum is undefined).

    Computed in log space: ln S(t) is a running SUM of ln(1 - d/n),
    which distributes through ``running_sums``; a duration where every
    remaining subject dies (d = n) zeroes the curve from there on
    (handled by a cumulative flag, not a -inf logarithm).
    """
    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("boolean").cast("int")
    base = df.filter(dur.isNotNull() & ~F.isnan(dur)).select(
        dur.alias("t"),
        F.coalesce(ev, F.lit(0)).alias("__e"))
    g = base.groupBy("t").agg(
        F.sum("__e").alias("n_events"),
        F.sum(F.lit(1) - F.col("__e")).alias("n_censored"),
        F.count(F.lit(1)).alias("__tot"),
    )
    # pass 1: cumulative subjects up to and including t -> at-risk
    c1 = running_sums(g, ["t"], ["__tot"])
    c1 = c1.withColumn(
        "n_risk", F.col("__g___tot") - F.col("__cum___tot")
        + F.col("__tot"))
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    # ln(1 - d/n): null at a total-death time (d = n); the zero flag
    # carries the "curve is 0 from here" fact through the prefix sum
    term = F.when(d < n, F.log(F.lit(1.0) - d / n)).otherwise(F.lit(0.0))
    gw = F.when((d > 0) & (d < n), d / (n * (n - d))).otherwise(F.lit(0.0))
    dead = (d >= n).cast("int")
    c2 = running_sums(
        c1.select("t", "n_risk", "n_events", "n_censored",
                  term.alias("__ln"), gw.alias("__gw"),
                  dead.alias("__dead")),
        ["t"], ["__ln", "__gw", "__dead"])
    surv = F.when(F.col("__cum___dead") > 0, F.lit(0.0)) \
        .otherwise(F.exp(F.col("__cum___ln")))
    se = F.when(F.col("__cum___dead") > 0, F.lit(None)) \
        .otherwise(surv * F.sqrt(F.col("__cum___gw")))
    return c2.select(
        "t", "n_risk", "n_events", "n_censored",
        surv.alias("survival"), se.cast("double").alias("se"),
    ).orderBy("t")
