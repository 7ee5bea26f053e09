"""Off-policy evaluation of a target decision policy from logged
bandit feedback — "what value WOULD this new ranking / routing /
recommendation policy have earned" estimated from data collected
under the old one, without an online experiment.

No reference analogue; the estimators are the standard IPS family
(Horvitz-Thompson 1952 / Li et al. 2011), self-normalized IPS
(Swaminathan & Joachims 2015), and the doubly-robust combination
(Dudík et al. 2011) with the per-action empirical mean as the direct
model.

Input: one row per logged decision with the ACTION taken, the REWARD
observed, and the behavior policy's PROPENSITY (probability of the
logged action).  The target policy is a context-free action →
probability map (the common policy-audit form; for contextual targets
pre-compute π(a|x) into a column and pass ``target_prob_col``).

Scale shape: ONE data-sized aggregation per group.  The policy map
ships as a broadcast literal table; the per-action reward means
(direct model) are a bounded groups × actions aggregate broadcast
back.  No windows, no shuffles beyond the single groupBy exchange.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["offpolicy_value"]


def offpolicy_value(
    df: DataFrame,
    action_col: str,
    reward_col: str,
    propensity_col: str,
    target_policy: Optional[Dict[str, float]] = None,
    target_prob_col: Optional[str] = None,
    clip: float = 10.0,
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One row per group: ``(group..., n, behavior_value, ips,
    ips_clipped, snips, ess, direct, dr)``.

    * ``behavior_value`` — mean logged reward (the old policy).
    * ``ips`` — mean of w·r with w = π(a)/propensity (unbiased,
      high-variance); ``ips_clipped`` caps w at ``clip``.
    * ``snips`` — Σw·r / Σw (self-normalized; biased, much lower
      variance, invariant to reward shifts).
    * ``ess`` — Kish effective sample size (Σw)²/Σw²: how many
      logged rows effectively support the estimate (small ess =
      don't trust any of these numbers).
    * ``direct`` — Σ_a π(a)·Q̂(a) with Q̂ the per-group empirical
      mean reward of each action (actions the group never logged
      contribute 0 — state your coverage before trusting it).
    * ``dr`` — doubly robust: direct + mean(w·(r − Q̂(a))).

    Exactly one of ``target_policy`` (action → probability dict) or
    ``target_prob_col`` (a column holding π(logged action | x)) must
    be given; with the column form ``direct``/``dr`` need the
    per-action baseline too, so they use the column's per-action
    mean as π(a).  Rows with null action/reward or propensity ≤ 0
    are excluded.
    """
    if (target_policy is None) == (target_prob_col is None):
        raise ValueError(
            "give exactly one of target_policy or target_prob_col")
    if clip <= 0:
        raise ValueError(f"clip must be > 0: {clip}")
    groups: List[str] = list(group_cols or [])
    r = F.col(reward_col).cast("double")
    p = F.col(propensity_col).cast("double")
    a = F.col(action_col).cast("string")
    base = df.filter(
        a.isNotNull() & r.isNotNull() & ~F.isnan(r)
        & p.isNotNull() & (p > 0)
    ).select(*groups, a.alias("__a"), r.alias("__r"),
             p.alias("__p"),
             *([F.col(target_prob_col).cast("double").alias("__pi")]
               if target_prob_col else []))

    spark = df.sparkSession
    if target_policy is not None:
        items = [(str(k), float(v)) for k, v in target_policy.items()]
        pol = spark.createDataFrame(items, "__a string, __pi double")
        # actions outside the policy's support get probability 0
        base = base.join(F.broadcast(pol), "__a", "left") \
            .withColumn("__pi", F.coalesce("__pi", F.lit(0.0)))

    # direct model: per-(group, action) empirical mean reward and the
    # action's target probability — bounded at groups x actions
    qhat = base.groupBy(*groups, "__a").agg(
        F.avg("__r").alias("__q"),
        F.avg("__pi").alias("__pi_a"))
    direct = qhat.groupBy(*groups).agg(
        F.sum(F.col("__pi_a") * F.col("__q")).alias("direct"))

    scored = base.join(
        F.broadcast(qhat.select(*groups, "__a", "__q")),
        groups + ["__a"])
    w = F.col("__pi") / F.col("__p")
    wc = F.least(w, F.lit(float(clip)))
    agg = scored.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__r").alias("behavior_value"),
        F.avg(w * F.col("__r")).alias("ips"),
        F.avg(wc * F.col("__r")).alias("ips_clipped"),
        F.sum(w * F.col("__r")).alias("__swr"),
        F.sum(w).alias("__sw"),
        F.sum(w * w).alias("__sww"),
        F.avg(w * (F.col("__r") - F.col("__q"))).alias("__corr"),
    )
    if groups:
        rep = agg.join(F.broadcast(direct), groups, "left")
    else:
        rep = agg.join(F.broadcast(direct), F.lit(True), "left")
    return rep.select(
        *groups, "n", "behavior_value", "ips", "ips_clipped",
        F.try_divide(F.col("__swr"), F.col("__sw")).alias("snips"),
        F.try_divide(F.col("__sw") * F.col("__sw"),
                     F.col("__sww")).alias("ess"),
        "direct",
        (F.col("direct") + F.col("__corr")).alias("dr"),
    )
