"""A/B experiment analysis at corpus scale.

``ab_test_report`` computes, per segment, the two workhorse
two-sample tests — Welch's unequal-variance t and the exact
(tie-corrected) Mann-Whitney U — in ONE shuffle over a
distinct-value table. The rank machinery is the shared grouped
two-phase prefix sum (``core.prefix.grouped_running_sums``): no
single-partition window ever touches the data, so a 100 TB metric
column with three segments walks in bounded per-slice sorts exactly
like the exact-quantile path.

``with_ab_pvalues`` attaches p-values (Student-t and normal
survival functions, pure-Python kernels shared with ``core.drift``)
via an Arrow batch over the BOUNDED report frame — one row per
segment, never the data.

Design notes vs the reference: whylogs ships model-performance
metrics but no experiment analysis; this is an extension family in
the spirit of its drift p-values (reference
``viz/drift/column_drift_algorithms.py`` computes KS/chi2 p-values
driver-side; here the statistics are distributed-exact and the
p-value kernel is vectorized over the bounded report).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ab_test_report", "with_ab_pvalues", "cuped_adjust",
           "uplift_curve", "auuc", "msprt_scan", "stratified_ate",
           "srm_check", "ratio_delta_ci", "quantile_treatment_effect"]


def ab_test_report(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control,
    treatment,
    segment_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-segment A/B statistics for ``metric_col`` between the
    ``control`` and ``treatment`` values of ``group_col``.

    Returns one row per segment:

    * ``n_c, n_t, mean_c, mean_t, var_c, var_t`` — sample moments
      (sample variance, n-1 denominator; null when n < 2)
    * ``diff = mean_t - mean_c``, ``lift = diff / mean_c`` (null
      when mean_c == 0)
    * ``welch_t, welch_df`` — Welch's t statistic and
      Welch–Satterthwaite degrees of freedom (null when either
      variance contribution is undefined or the pooled SE is 0)
    * ``u_stat, mw_z`` — Mann-Whitney U for the treatment side
      (average-rank ties) and its tie-corrected normal
      approximation WITHOUT continuity correction (null when every
      value ties or a side is empty)

    Everything reduces over a groupBy(segments, value) distinct-value
    table: moments come from value-weighted sums, rank sums from the
    grouped prefix-sum walk, and the tie term sum(t^3 - t) from the
    same table — one data shuffle total. Rows with null/NaN metric
    or a group other than control/treatment are excluded.
    """
    from whylogs_spark.core.prefix import grouped_running_sums

    if control == treatment:
        raise ValueError("control and treatment must differ")
    segs = list(segment_cols)
    v = F.col(metric_col).cast("double")
    base = (
        df.filter(F.col(group_col).isin([control, treatment]))
        .filter(v.isNotNull() & ~F.isnan(v))
        .select(
            *segs,
            (F.col(group_col) == F.lit(treatment)).cast("long")
            .alias("__t"),
            v.alias("__v"),
        )
    )
    g = base.groupBy(*segs, "__v").agg(
        F.sum(F.lit(1) - F.col("__t")).alias("__c_ct"),
        F.sum("__t").alias("__t_ct"),
    )
    g = g.withColumn("__tot", F.col("__c_ct") + F.col("__t_ct"))
    walked = grouped_running_sums(g, segs, ["__v"], ["__tot"])

    tot_d = F.col("__tot").cast("double")
    # average rank of every occurrence of this value
    avg_rank = (F.col("__cum___tot") - F.col("__tot")).cast("double") \
        + (tot_d + F.lit(1.0)) / F.lit(2.0)
    rep = walked.groupBy(*segs).agg(
        F.sum("__c_ct").alias("n_c"),
        F.sum("__t_ct").alias("n_t"),
        F.sum(F.col("__v") * F.col("__c_ct")).alias("__s_c"),
        F.sum(F.col("__v") * F.col("__v") * F.col("__c_ct"))
        .alias("__ss_c"),
        F.sum(F.col("__v") * F.col("__t_ct")).alias("__s_t"),
        F.sum(F.col("__v") * F.col("__v") * F.col("__t_ct"))
        .alias("__ss_t"),
        F.sum(F.col("__t_ct").cast("double") * avg_rank)
        .alias("rank_sum_t"),
        # cast before cubing: a 2M-row tie group cubes past int64
        F.sum(tot_d * tot_d * tot_d - tot_d).alias("__ties"),
    )

    n_c = F.col("n_c").cast("double")
    n_t = F.col("n_t").cast("double")
    mean_c = F.try_divide(F.col("__s_c"), n_c)
    mean_t = F.try_divide(F.col("__s_t"), n_t)
    var_c = F.try_divide(
        F.col("__ss_c") - n_c * mean_c * mean_c, n_c - F.lit(1.0))
    var_t = F.try_divide(
        F.col("__ss_t") - n_t * mean_t * mean_t, n_t - F.lit(1.0))
    # float cancellation can drive a constant side epsilon-negative;
    # clamp WITHOUT losing the null of an undefined (n < 2) variance —
    # Spark's greatest() ignores nulls, so guard explicitly
    def _clamp(v):
        return F.when(v.isNotNull(), F.greatest(v, F.lit(0.0)))

    rep = rep.select(
        *segs, "n_c", "n_t",
        mean_c.alias("mean_c"), mean_t.alias("mean_t"),
        _clamp(var_c).alias("var_c"),
        _clamp(var_t).alias("var_t"),
        "rank_sum_t", "__ties",
    )

    se2 = F.try_divide(F.col("var_c"), n_c) \
        + F.try_divide(F.col("var_t"), n_t)
    welch_t = F.when(
        se2 > 0,
        (F.col("mean_t") - F.col("mean_c")) / F.sqrt(se2))
    welch_df = F.when(
        se2 > 0,
        F.try_divide(
            se2 * se2,
            F.try_divide(F.try_divide(F.col("var_c"), n_c)
                         * F.try_divide(F.col("var_c"), n_c),
                         n_c - F.lit(1.0))
            + F.try_divide(F.try_divide(F.col("var_t"), n_t)
                           * F.try_divide(F.col("var_t"), n_t),
                           n_t - F.lit(1.0))))
    n_all = n_c + n_t
    u_stat = F.col("rank_sum_t") - n_t * (n_t + F.lit(1.0)) / F.lit(2.0)
    mu_u = n_c * n_t / F.lit(2.0)
    sigma2_u = n_c * n_t / F.lit(12.0) * (
        n_all + F.lit(1.0)
        - F.try_divide(F.col("__ties"),
                       n_all * (n_all - F.lit(1.0))))
    mw_z = F.when(sigma2_u > 0, (u_stat - mu_u) / F.sqrt(sigma2_u))
    return rep.select(
        *segs, "n_c", "n_t", "mean_c", "mean_t",
        (F.col("mean_t") - F.col("mean_c")).alias("diff"),
        F.when(F.col("mean_c") != 0,
               F.try_divide(F.col("mean_t") - F.col("mean_c"),
                            F.col("mean_c"))).alias("lift"),
        "var_c", "var_t",
        welch_t.alias("welch_t"), welch_df.alias("welch_df"),
        "rank_sum_t", u_stat.alias("u_stat"), mw_z.alias("mw_z"),
    )


def with_ab_pvalues(report: DataFrame) -> DataFrame:
    """Attach two-sided p-values to an :func:`ab_test_report` frame:
    ``p_welch`` (Student-t SF at ``welch_df``) and ``p_mw`` (normal
    SF of the tie-corrected z). Arrow batch over the bounded report
    frame (one row per segment) — the data never re-enters."""
    from whylogs_spark.core.drift import normal_sf, student_t_sf

    schema = T.StructType(
        list(report.schema.fields)
        + [T.StructField("p_welch", T.DoubleType()),
           T.StructField("p_mw", T.DoubleType())])

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            pw, pm = [], []
            for t, d in zip(pdf["welch_t"], pdf["welch_df"]):
                if pd.isna(t) or pd.isna(d):
                    pw.append(None)
                else:
                    pw.append(2.0 * student_t_sf(abs(float(t)),
                                                 float(d)))
            for z in pdf["mw_z"]:
                pm.append(None if pd.isna(z)
                          else 2.0 * normal_sf(abs(float(z))))
            pdf = pdf.copy()
            pdf["p_welch"] = pd.array(pw, dtype="float64")
            pdf["p_mw"] = pd.array(pm, dtype="float64")
            yield pdf

    return report.mapInPandas(gen, schema)


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    segment_cols: Sequence[str] = (),
    out_col: str = None,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): replace the
    experiment metric y with ``y - theta * (x - mean(x))`` where x is
    a pre-experiment covariate (e.g. the same metric measured before
    assignment) and ``theta = cov(x, y) / var(x)`` — the OLS slope.
    Feeding the adjusted column to :func:`ab_test_report` keeps the
    treatment-effect estimate unbiased (assignment is independent of
    x) while shrinking variance by the squared correlation.

    theta and mean(x) are estimated per segment over ALL rows (both
    arms pooled — the standard CUPED recipe; a per-arm theta would
    bias the difference) in one aggregation, broadcast back; rows
    with a null/NaN covariate keep their raw metric (adjustment 0).
    Degenerate var(x) == 0 leaves the metric unadjusted.

    Returns ``df`` plus the adjusted column (default
    ``<metric_col>_cuped``).
    """
    out_col = out_col or f"{metric_col}_cuped"
    segs = list(segment_cols)
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    both = y.isNotNull() & ~F.isnan(y) & x.isNotNull() & ~F.isnan(x)
    xm = F.when(both, x)
    ym = F.when(both, y)
    stats = df.groupBy(*segs).agg(
        F.sum(xm).alias("__sx"), F.sum(ym).alias("__sy"),
        F.sum(xm * xm).alias("__sxx"), F.sum(xm * ym).alias("__sxy"),
        F.count(xm).cast("double").alias("__nb"))
    nb = F.col("__nb")
    varx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nb
    covxy = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nb
    stats = stats.select(
        *segs,
        F.when((nb > 1) & (varx > 0), covxy / varx).alias("__theta"),
        F.try_divide(F.col("__sx"), nb).alias("__xbar"))
    if segs:
        j = df.join(F.broadcast(stats), on=segs, how="left")
    else:
        j = df.crossJoin(F.broadcast(stats))
    adj = F.when(
        both & F.col("__theta").isNotNull(),
        y - F.col("__theta") * (x - F.col("__xbar"))).otherwise(y)
    return j.withColumn(out_col, adj).drop("__theta", "__xbar")


def srm_check(
    df: DataFrame,
    group_col: str,
    expected: dict,
    segment_cols: Sequence[str] = (),
) -> DataFrame:
    """Sample-ratio-mismatch check: chi-square goodness-of-fit of the
    observed per-arm counts against the designed allocation (e.g.
    ``{"control": 0.5, "treatment": 0.5}``) — the first thing to
    verify before reading ANY experiment result; an SRM means broken
    assignment or logging, not a treatment effect.

    One aggregation: per (segment, arm) counts, expected counts from
    the broadcast allocation, ``chi2 = sum (obs - exp)^2 / exp`` with
    dof = arms - 1 per segment. Arms absent from ``expected`` are
    ignored (filtered at the scan); arms in ``expected`` with zero
    observed rows still contribute (obs = 0). Feed ``chi2``/``dof``
    to ``core.drift.chi2_sf`` for the p-value.

    Returns one row per segment: ``segment_cols…, n_total, chi2,
    dof`` plus per-arm ``n_<arm>`` observed counts.
    """
    arms = list(expected)
    if len(arms) < 2:
        raise ValueError("expected must name at least 2 arms")
    tot = float(sum(expected.values()))
    if tot <= 0:
        raise ValueError("expected ratios must sum to > 0")
    fracs = {a: float(expected[a]) / tot for a in arms}
    if any(f <= 0 for f in fracs.values()):
        raise ValueError("every expected ratio must be > 0")
    if len({str(a) for a in arms}) != len(arms):
        raise ValueError(
            f"arm names collide after str(): {sorted(map(str, arms))}")
    segs = list(segment_cols)
    g = F.col(group_col).cast("string")
    base = df.filter(g.isin([str(a) for a in arms]))
    counts = base.groupBy(*segs).agg(
        F.count(F.lit(1)).alias("n_total"),
        *[F.sum((g == F.lit(str(a))).cast("long")).alias(f"n_{a}")
          for a in arms])
    def armcol(a):
        # backtick-quoted resolution: arm names may contain '.' or
        # other identifier-breakers that plain F.col would parse
        return F.col("`n_" + str(a).replace("`", "``") + "`")

    nt = F.col("n_total").cast("double")
    chi2 = None
    for a in arms:
        exp_a = nt * F.lit(fracs[a])
        term = (armcol(a).cast("double") - exp_a) ** 2 / exp_a
        chi2 = term if chi2 is None else chi2 + term
    return counts.select(
        *segs, "n_total", *[armcol(a) for a in arms],
        F.when(nt > 0, chi2).alias("chi2"),
        F.lit(len(arms) - 1).alias("dof"),
    )


# Poisson(1) inverse-CDF cut points: cumulative e^-1 * sum 1/k!.
# A hash-uniform u maps to the smallest k with u < cdf[k]; the tail
# past k=9 (probability ~1e-7) truncates to 9 — identical constants
# on every engine, so the draw replays exactly.
_POISSON1_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988747974021,
]


def poisson_bootstrap_diff(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    control,
    treatment,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 0,
) -> DataFrame:
    """Percentile bootstrap CI for the mean treatment effect via the
    Poisson bootstrap (the distributed bootstrap: resampling n rows
    with replacement == giving each row an independent Poisson(1)
    weight, exact as n grows — Chamandy et al., "Estimating
    uncertainty for massive data streams", Google 2012).

    Each row's weight for replicate r is a DETERMINISTIC function of
    ``md5(id_col | r | seed)`` mapped through the Poisson(1) inverse
    CDF — reproducible run-to-run and engine-to-engine (no RNG
    state). One pass: the replicate spine explodes in-plan and the
    per-(replicate, arm) weighted sums partial-agg map-side to
    ``2 * n_boot`` rows per partition, so shuffle volume is bounded
    by replicates, not data x replicates.

    Returns ONE row: ``(diff_obs, ci_lo, ci_hi, n_boot)`` — the
    observed mean difference (treatment - control) and the
    ``alpha/2 .. 1-alpha/2`` percentile interval of the bootstrap
    replicate differences.
    """
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2: {n_boot}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    v = F.col(metric_col).cast("double")
    base = (
        df.filter(F.col(group_col).isin([control, treatment]))
        .filter(v.isNotNull() & ~F.isnan(v))
        .select(
            (F.col(group_col) == F.lit(treatment)).cast("int")
            .alias("__t"),
            v.alias("__v"),
            F.col(id_col).cast("string").alias("__id"))
    )
    rep = base.select(
        "__t", "__v", "__id",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1)))
        .alias("__r"))
    u = (
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.col("__id"),
                              F.col("__r").cast("string"),
                              F.lit(str(seed)))), 1, 8), 16, 10)
        .cast("double") / F.lit(float(1 << 32)))
    w = F.lit(9)
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    weighted = rep.select(
        "__r", "__t", "__v", w.cast("double").alias("__w"))
    per_rep = weighted.groupBy("__r").agg(
        F.sum(F.when(F.col("__t") == 1, F.col("__w") * F.col("__v"))
              .otherwise(F.lit(0.0))).alias("__swt"),
        F.sum(F.when(F.col("__t") == 1, F.col("__w"))
              .otherwise(F.lit(0.0))).alias("__swt_n"),
        F.sum(F.when(F.col("__t") == 0, F.col("__w") * F.col("__v"))
              .otherwise(F.lit(0.0))).alias("__swc"),
        F.sum(F.when(F.col("__t") == 0, F.col("__w"))
              .otherwise(F.lit(0.0))).alias("__swc_n"),
    )
    bdiff = (F.try_divide(F.col("__swt"), F.col("__swt_n"))
             - F.try_divide(F.col("__swc"), F.col("__swc_n")))
    reps = per_rep.select(bdiff.alias("__d"))
    obs = base.agg(
        (F.try_divide(
            F.sum(F.when(F.col("__t") == 1, F.col("__v"))),
            F.sum(F.col("__t")))
         - F.try_divide(
             F.sum(F.when(F.col("__t") == 0, F.col("__v"))),
             F.sum(F.lit(1) - F.col("__t")))).alias("diff_obs"))
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    ci = reps.agg(
        F.expr(f"percentile(__d, {lo!r})").alias("ci_lo"),
        F.expr(f"percentile(__d, {hi!r})").alias("ci_hi"),
        F.count(F.lit(1)).cast("int").alias("n_boot"))
    return obs.crossJoin(F.broadcast(ci))


def msprt_scan(
    df: DataFrame,
    time_col: str,
    group_col: str,
    metric_col: str,
    control,
    treatment,
    tau2: float = 1.0,
    grain: str = "day",
) -> DataFrame:
    """Always-valid sequential A/B monitoring: the mixture SPRT
    (Johari et al. 2017 'Peeking at A/B tests') over time buckets —
    the experiment can be checked after EVERY bucket without
    inflating false positives, unlike repeated fixed-horizon t-tests.

    One row per ``grain`` bucket, ascending: cumulative arm counts
    and means, the mean difference, its variance ``v_t`` (pooled
    two-sample), the mixture likelihood ratio

        Λ_t = sqrt(v_t/(v_t+τ²)) · exp(d_t²·τ²/(2·v_t·(v_t+τ²)))

    and ``p_always_valid = min(1, 1/Λ_t)`` — reject when it crosses
    α at ANY bucket.  ``tau2`` is the mixture-prior variance of the
    effect size (tune to the effect scale you care to detect).
    Buckets before both arms have ≥2 observations report null Λ/p.

    Scale shape: the data collapses to one row per bucket with
    conditional partial-agged sums (map-side; skew bound = nothing),
    then the cumulative walk is the shared two-phase
    range-partitioned prefix sum — no single-partition window.
    """
    from whylogs_spark.core.prefix import running_sums

    if tau2 <= 0:
        raise ValueError(f"tau2 must be > 0: {tau2}")
    m = F.col(metric_col).cast("double")
    gcol = F.col(group_col)
    is_c = (gcol == F.lit(control)).cast("int")
    is_t = (gcol == F.lit(treatment)).cast("int")
    base = df.filter(
        m.isNotNull() & ~F.isnan(m) & F.col(time_col).isNotNull()
        & (gcol.isin([control, treatment]))
    ).select(
        F.date_trunc(grain, F.col(time_col)).alias("bucket"),
        is_c.alias("__c"), is_t.alias("__t"), m.alias("__v"))
    g = base.groupBy("bucket").agg(
        F.sum("__c").alias("nc"),
        F.sum("__t").alias("nt"),
        F.sum(F.col("__v") * F.col("__c")).alias("sc"),
        F.sum(F.col("__v") * F.col("__t")).alias("st"),
        F.sum(F.col("__v") * F.col("__v") * F.col("__c")).alias("qc"),
        F.sum(F.col("__v") * F.col("__v") * F.col("__t")).alias("qt"),
    )
    w = running_sums(g, ["bucket"], ["nc", "nt", "sc", "st",
                                     "qc", "qt"])
    nc = F.col("__cum_nc").cast("double")
    nt = F.col("__cum_nt").cast("double")
    mean_c = F.try_divide(F.col("__cum_sc"), nc)
    mean_t = F.try_divide(F.col("__cum_st"), nt)
    # pooled two-sample variance of the mean difference
    ss = (F.col("__cum_qc") - nc * mean_c * mean_c
          + F.col("__cum_qt") - nt * mean_t * mean_t)
    pooled = F.try_divide(ss, nc + nt - F.lit(2.0))
    v_t = F.when((nc >= 2) & (nt >= 2),
                 pooled * (F.lit(1.0) / nc + F.lit(1.0) / nt))
    d = mean_t - mean_c
    t2 = F.lit(float(tau2))
    lam = F.when(
        v_t > 0,
        F.sqrt(v_t / (v_t + t2))
        * F.exp(d * d * t2 / (F.lit(2.0) * v_t * (v_t + t2))))
    return w.select(
        "bucket",
        F.col("__cum_nc").alias("n_c"),
        F.col("__cum_nt").alias("n_t"),
        mean_c.alias("mean_c"), mean_t.alias("mean_t"),
        d.alias("diff"), v_t.alias("v_t"),
        lam.alias("lambda"),
        F.when(lam.isNotNull(),
               F.least(F.lit(1.0), F.lit(1.0) / lam))
        .alias("p_always_valid"),
    )


def uplift_curve(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
) -> DataFrame:
    """Qini / uplift curve for a targeting model: rank the population
    by ``score_col`` DESCENDING (target the highest scores first) and
    report, at every distinct score threshold, the cumulative
    treated/control outcome split — the evaluation standard for
    uplift models (Radcliffe 2007).

    One row per distinct score, descending: ``(score, n, cum_n,
    cum_n_t, cum_n_c, cum_y_t, cum_y_c, uplift, qini)`` with

    * ``uplift`` = y_t/n_t − y_c/n_c over the targeted prefix (null
      until both arms appear)
    * ``qini``   = y_t − y_c · n_t/n_c, the incremental-outcomes
      estimate at that targeting depth (null while n_c = 0)

    Scale shape: the data collapses to one row per DISTINCT score
    with a partial-agged groupBy, the descending walk is the shared
    two-phase range-partitioned prefix sum over the negated score —
    identical machinery to ``roc_auc_exact``.  Null/NaN scores and
    null treatment/outcome rows are excluded.
    """
    from whylogs_spark.core.prefix import running_sums

    s = F.col(score_col).cast("double")
    tr = F.col(treatment_col).cast("boolean").cast("int")
    y = F.col(outcome_col).cast("double")
    base = df.filter(
        s.isNotNull() & ~F.isnan(s) & tr.isNotNull()
        & y.isNotNull() & ~F.isnan(y)
    ).select((-s).alias("__negs"), tr.alias("__t"), y.alias("__y"))
    g = base.groupBy("__negs").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__t").alias("__nt"),
        F.sum(F.lit(1) - F.col("__t")).alias("__nc"),
        F.sum(F.col("__y") * F.col("__t")).alias("__yt"),
        F.sum(F.col("__y") * (F.lit(1) - F.col("__t"))).alias("__yc"),
    )
    w = running_sums(g, ["__negs"], ["n", "__nt", "__nc", "__yt",
                                     "__yc"])
    nt = F.col("__cum___nt").cast("double")
    nc = F.col("__cum___nc").cast("double")
    yt = F.col("__cum___yt")
    yc = F.col("__cum___yc")
    return w.select(
        # 0.0 - x, not -x: grouping normalized a -0.0 key to 0.0 and
        # bare negation would emit score -0.0
        (F.lit(0.0) - F.col("__negs")).alias("score"), "n",
        F.col("__cum_n").alias("cum_n"),
        F.col("__cum___nt").alias("cum_n_t"),
        F.col("__cum___nc").alias("cum_n_c"),
        yt.alias("cum_y_t"), yc.alias("cum_y_c"),
        (F.try_divide(yt, nt) - F.try_divide(yc, nc)).alias("uplift"),
        (yt - yc * F.try_divide(nt, nc)).alias("qini"),
    )


def auuc(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
) -> DataFrame:
    """Scalar summary of :func:`uplift_curve`: one row ``(n, auuc,
    qini_total, qini_random, qini_coefficient)`` where ``auuc`` is
    the right-rectangle area under the qini curve over the targeted
    fraction (Σ qini_k · n_k / N), ``qini_total`` the qini value at
    full targeting, ``qini_random`` the random-targeting baseline
    area (qini_total / 2), and ``qini_coefficient`` their difference
    (positive = the model targets better than random).  Same single
    walked frame as the curve; the summary is ONE more bounded
    aggregation.

    Depths where the control arm is still empty (``cum_n_c = 0``,
    null ``qini``) contribute the n_c→0 limit ``cum_y_t`` to the
    area term rather than silently dropping out — a model that ranks
    treated units first is credited for its incremental outcomes at
    those depths instead of being biased low."""
    curve = uplift_curve(df, treatment_col, outcome_col, score_col)
    # qini_total = qini at the final (full-targeting) row: max by
    # cum_n via a struct-max — window-free
    row = curve.agg(
        F.max("cum_n").alias("n"),
        F.sum(F.coalesce(F.col("qini"), F.col("cum_y_t"))
              * F.col("n").cast("double")).alias("__a"),
        F.max(F.struct(F.col("cum_n").alias("k"),
                       F.col("qini").alias("q"))).alias("__last"))
    nn = F.col("n").cast("double")
    qt = F.col("__last.q")
    a = F.col("__a") / nn
    return row.select(
        "n", a.alias("auuc"), qt.alias("qini_total"),
        (qt / 2.0).alias("qini_random"),
        (a - qt / 2.0).alias("qini_coefficient"))


def stratified_ate(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    strata_cols: Sequence[str],
) -> DataFrame:
    """Stratified average-treatment-effect estimate for OBSERVATIONAL
    comparisons (no randomization): within each stratum the arms are
    assumed comparable, so the confounding carried by the strata
    variables is adjusted away by weighting per-stratum mean
    differences (the classic stratification / subclassification
    estimator; bin a propensity-like score with
    ``core.summaries.with_quantile_bins`` first to stratify on it).

    One row: ``(n, n_strata, n_used, n_dropped, ate, att, se)``

    * ``ate`` — Σ_b (n_b / N) · (mean_t,b − mean_c,b) over strata
      with BOTH arms present (population-weighted)
    * ``att`` — the same weighted by the treated counts
    * ``se``  — √ Σ_b w_b² (var_t,b/n_t,b + var_c,b/n_c,b) with the
      ATE weights (normal-approximation standard error)
    * ``n_dropped`` — strata missing an arm, excluded from every
      estimate (and from N; report it — heavy drop means the strata
      don't overlap and NO weighting rescues the comparison)

    Scale shape: ONE partial-agged groupBy over (strata, arm
    moments); everything after runs on the #strata-sized table.
    """
    from functools import reduce
    from operator import and_

    if not strata_cols:
        raise ValueError("strata_cols must be non-empty")
    tr = F.col(treatment_col).cast("boolean")
    y = F.col(outcome_col).cast("double")
    base = df.filter(
        tr.isNotNull() & y.isNotNull() & ~F.isnan(y)
        & reduce(and_, [F.col(c).isNotNull() for c in strata_cols])
    ).select(*strata_cols, tr.cast("int").alias("__t"),
             y.alias("__y"))
    t = F.col("__t")
    g = base.groupBy(*strata_cols).agg(
        F.sum(t).alias("nt"),
        F.sum(1 - t).alias("nc"),
        F.sum(F.col("__y") * t).alias("st"),
        F.sum(F.col("__y") * (1 - t)).alias("sc"),
        F.sum(F.col("__y") * F.col("__y") * t).alias("qt"),
        F.sum(F.col("__y") * F.col("__y") * (1 - t)).alias("qc"),
    )
    ntd = F.col("nt").cast("double")
    ncd = F.col("nc").cast("double")
    mt = F.col("st") / ntd
    mc = F.col("sc") / ncd
    vart = F.when(F.col("nt") >= 2, F.greatest(
        (F.col("qt") - ntd * mt * mt) / (ntd - 1), F.lit(0.0)))
    varc = F.when(F.col("nc") >= 2, F.greatest(
        (F.col("qc") - ncd * mc * mc) / (ncd - 1), F.lit(0.0)))
    both = (F.col("nt") > 0) & (F.col("nc") > 0)
    per = g.select(
        both.alias("__ok"), (ntd + ncd).alias("__n"),
        ntd.alias("__ntd"),
        F.when(both, mt - mc).alias("__d"),
        F.when(both, F.try_divide(vart, ntd)
               + F.try_divide(varc, ncd)).alias("__v"))
    return per.agg(
        F.sum("__n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(F.when(F.col("__ok"), 1).otherwise(0)).cast("long")
        .alias("n_used"),
        F.sum(F.when(F.col("__ok"), 0).otherwise(1)).cast("long")
        .alias("n_dropped"),
        (F.sum(F.when(F.col("__ok"), F.col("__n") * F.col("__d")))
         / F.sum(F.when(F.col("__ok"), F.col("__n"))))
        .alias("ate"),
        (F.sum(F.when(F.col("__ok"), F.col("__ntd") * F.col("__d")))
         / F.sum(F.when(F.col("__ok"), F.col("__ntd"))))
        .alias("att"),
        F.sqrt(
            F.sum(F.when(F.col("__ok"),
                         F.col("__n") * F.col("__n") * F.col("__v")))
            / (F.sum(F.when(F.col("__ok"), F.col("__n")))
               * F.sum(F.when(F.col("__ok"), F.col("__n")))))
        .alias("se"),
    )


def ratio_delta_ci(
    df: DataFrame,
    num_col: str,
    den_col: str,
    group_cols: Optional[Sequence[str]] = None,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric
    sum(num)/sum(den) over randomization units (Deng, Knoblich & Lu
    2018) — the correct CI when the metric's denominator is itself
    random (revenue per session, CTR per user), where a naive
    per-row t-interval is wrong because rows aren't the units.

    One row per group: ``(group…, n, ratio, se, ci_lo, ci_hi)`` with
    ``se² = (var_x − 2·r·cov_xy + r²·var_y) / (n·ȳ²)`` (first-order
    Taylor expansion around the means), ``z`` the normal quantile
    (default two-sided 95%).  Null when n < 2, ȳ = 0, or the
    denominator variance expression degenerates.  Each input ROW must
    already be one randomization unit (pre-aggregate per user first —
    :func:`ab_test_report`'s contract).

    Scale shape: ONE partial-agged aggregation per group (five moment
    sums); nothing else.
    """
    groups = list(group_cols or [])
    x = F.col(num_col).cast("double")
    y = F.col(den_col).cast("double")
    base = df.filter(x.isNotNull() & ~F.isnan(x)
                     & y.isNotNull() & ~F.isnan(y))
    rep = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("__mx"), F.avg(y).alias("__my"),
        F.var_samp(x).alias("__vx"), F.var_samp(y).alias("__vy"),
        F.covar_samp(x, y).alias("__cxy"))
    nd = F.col("n").cast("double")
    r = F.when(F.col("__my") != 0, F.col("__mx") / F.col("__my"))
    var_r = (F.col("__vx") - 2.0 * r * F.col("__cxy")
             + r * r * F.col("__vy")) \
        / (nd * F.col("__my") * F.col("__my"))
    se = F.when((F.col("n") >= 2) & var_r.isNotNull() & (var_r >= 0),
                F.sqrt(var_r))
    return rep.select(
        *groups, "n", r.alias("ratio"), se.alias("se"),
        (r - F.lit(float(z)) * se).alias("ci_lo"),
        (r + F.lit(float(z)) * se).alias("ci_hi"))


def quantile_treatment_effect(
    df: DataFrame,
    treatment_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects: the exact per-quantile gap between
    the treated and control outcome distributions, one row per
    quantile: ``(q, y_control, y_treatment, qte)``.  The
    "did the intervention move the median or just the mean" answer —
    means hide distributional effects (a heavy-tail gain with a median
    loss nets out), QTE shows where in the distribution the effect
    lives.  ``treatment_col`` is 0/1-coercible; null treatment or
    value rows drop.

    Scale shape: ONE aggregation computes BOTH arms' exact
    ``percentile`` arrays (conditional inputs, single pass, no
    split-join); the per-quantile rows are a free posexplode of two
    bounded arrays.
    """
    tr = F.col(treatment_col).cast("double")
    y = F.col(value_col).cast("double")
    qs = [float(q) for q in quantiles]
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0, 1], got {quantiles}")
    qlit = ", ".join(repr(q) for q in qs)
    base = df.filter(tr.isNotNull() & y.isNotNull() & ~F.isnan(y)) \
        .select(tr.alias("__tr"), y.alias("__y"))
    one = base.agg(
        F.expr(f"percentile(CASE WHEN __tr = 0 THEN __y END, "
               f"array({qlit}))").alias("__qc"),
        F.expr(f"percentile(CASE WHEN __tr <> 0 THEN __y END, "
               f"array({qlit}))").alias("__qt"))
    qarr = F.array(*[F.lit(q) for q in qs])
    out = one.select(
        F.posexplode(qarr).alias("__i", "q"),
        F.col("__qc"), F.col("__qt"))
    yc = F.col("__qc")[F.col("__i")]
    yt = F.col("__qt")[F.col("__i")]
    return out.select(
        "q", yc.alias("y_control"), yt.alias("y_treatment"),
        (yt - yc).alias("qte"))
