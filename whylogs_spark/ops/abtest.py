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

__all__ = ["ab_test_report", "with_ab_pvalues"]


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
