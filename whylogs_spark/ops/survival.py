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

__all__ = ["km_survival", "logrank_test", "nelson_aalen"]


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


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample log-rank test — "do these two arms have the same
    survival curve?", the hypothesis-test companion to
    :func:`km_survival` (compare churn between an A/B test's arms,
    or failure curves between hardware batches, censoring handled
    exactly).

    At every distinct duration t with at least one event, arm A's
    observed events d_A(t) are compared with the hypergeometric
    expectation  E_A(t) = d(t) * n_A(t) / n(t)  given the at-risk
    counts, with variance
    V(t) = d(t) (n_A/n) (1 - n_A/n) (n - d) / (n - 1).
    ``chi2 = (sum d_A - sum E_A)^2 / sum V`` with dof 1 (feed to
    ``core.drift.chi2_sf``).

    Scale shape: one groupBy(duration) collapse carrying BOTH arms'
    per-time counts, ONE prefix-sum pass (``running_sums``) for the
    two at-risk suffix counts, then a 1-row aggregation — the same
    machinery as the KM curve, one pass fewer. Null/NaN durations
    and rows outside the two arms are excluded.

    Returns one row: ``(n_a, n_b, events_a, events_b, observed_a,
    expected_a, chi2, dof)`` (``observed_a``/``expected_a`` summed
    over event times; chi2 null when every variance term is 0 —
    e.g. all events tie at one time with one arm at risk).
    """
    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("boolean").cast("int")
    is_a = (F.col(group_col) == F.lit(group_a)).cast("int")
    base = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .filter(dur.isNotNull() & ~F.isnan(dur))
        .select(dur.alias("t"),
                F.coalesce(ev, F.lit(0)).alias("__e"),
                is_a.alias("__a"))
    )
    g = base.groupBy("t").agg(
        F.sum(F.col("__e") * F.col("__a")).alias("__da"),
        F.sum(F.col("__e") * (F.lit(1) - F.col("__a"))).alias("__db"),
        F.sum("__a").alias("__ma"),
        F.sum(F.lit(1) - F.col("__a")).alias("__mb"),
    )
    c = running_sums(g, ["t"], ["__ma", "__mb"])
    na = (F.col("__g___ma") - F.col("__cum___ma")
          + F.col("__ma")).cast("double")
    nb = (F.col("__g___mb") - F.col("__cum___mb")
          + F.col("__mb")).cast("double")
    n = na + nb
    d = (F.col("__da") + F.col("__db")).cast("double")
    e_a = F.when(n > 0, d * na / n)
    v = F.when(
        n > 1,
        d * (na / n) * (F.lit(1.0) - na / n) * (n - d)
        / (n - F.lit(1.0))).otherwise(F.lit(0.0))
    per_t = c.filter(d > 0).select(
        F.col("__da").cast("double").alias("__oa"),
        e_a.alias("__ea"), v.alias("__v"))
    totals = base.agg(
        F.sum("__a").alias("n_a"),
        F.sum(F.lit(1) - F.col("__a")).alias("n_b"),
        F.sum(F.col("__e") * F.col("__a")).alias("events_a"),
        F.sum(F.col("__e") * (F.lit(1) - F.col("__a")))
        .alias("events_b"))
    agg = per_t.agg(
        F.sum("__oa").alias("observed_a"),
        F.sum("__ea").alias("expected_a"),
        F.sum("__v").alias("__sv"))
    out = totals.crossJoin(F.broadcast(agg))
    chi2 = F.when(
        F.col("__sv") > 0,
        (F.col("observed_a") - F.col("expected_a")) ** 2
        / F.col("__sv"))
    return out.select(
        "n_a", "n_b", "events_a", "events_b",
        "observed_a", "expected_a",
        chi2.alias("chi2"), F.lit(1).alias("dof"))


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — the additive
    companion to :func:`km_survival` (H(t) = sum_{t' <= t} d/n), the
    standard basis for hazard-ratio eyeballing and for the
    Breslow-type baseline hazard.  Same input contract as
    ``km_survival``; output one row per distinct duration:
    ``(t, n_risk, n_events, cum_hazard, se)`` with the Poisson-type
    variance sum d/n² under the square root.

    Same scale shape as the KM curve: one partial-agged collapse to
    distinct durations, then the two-phase range-partitioned prefix
    machinery for the at-risk counts and the hazard/variance
    accumulations — no single-partition window over the data.
    """
    dur = F.col(duration_col).cast("double")
    ev = F.col(event_col).cast("boolean").cast("int")
    base = df.filter(dur.isNotNull() & ~F.isnan(dur)).select(
        dur.alias("t"),
        F.coalesce(ev, F.lit(0)).alias("__e"))
    g = base.groupBy("t").agg(
        F.sum("__e").alias("n_events"),
        F.count(F.lit(1)).alias("__tot"))
    c1 = running_sums(g, ["t"], ["__tot"])
    c1 = c1.withColumn(
        "n_risk", F.col("__g___tot") - F.col("__cum___tot")
        + F.col("__tot"))
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    c2 = running_sums(
        c1.select("t", "n_risk", "n_events",
                  (d / n).alias("__h"),
                  (d / (n * n)).alias("__v")),
        ["t"], ["__h", "__v"])
    return c2.select(
        "t", "n_risk", "n_events",
        F.col("__cum___h").alias("cum_hazard"),
        F.sqrt(F.col("__cum___v")).alias("se"),
    ).orderBy("t")
