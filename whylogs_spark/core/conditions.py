"""Condition counts and row-level validators.

Replaces the reference's ConditionCountMetric
(python/whylogs/core/metrics/condition_count_metric.py:94) and
ConditionValidator (python/whylogs/core/validators/condition_validator.py:16):
named boolean predicates counted in a single aggregation pass, plus a
deterministic sample of failing rows (the reference keeps a var_opt
reservoir of failures; we take the top-k by a seeded hash — stable and
distributed, no driver loop).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def condition_counts(
    df: DataFrame, conditions: Dict[str, Column]
) -> DataFrame:
    """One aggregation pass -> long DataFrame (condition, matches, total).

    Each condition is any boolean Column (use the relations DSL or raw
    expressions). NULL evaluates as non-match, like the reference's
    failure-on-exception path.
    """
    total = F.count(F.lit(1))
    aggs = [total.alias("__total")]
    names = list(conditions)
    for i, name in enumerate(names):
        aggs.append(
            F.coalesce(
                F.sum(F.when(conditions[name], 1).otherwise(0)), F.lit(0)
            ).cast("long").alias(f"__c{i}")
        )
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(name).alias("condition"),
            F.col(f"__c{i}").alias("matches"),
            F.col("__total").alias("total"),
        )
        for i, name in enumerate(names)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def attach_condition_counts(
    view,
    df: DataFrame,
    column: str,
    conditions: Dict[str, Column],
):
    """Union condition-count rows into a profile: metric
    ``condition_count``, one component per condition plus ``total``.

    Mirrors the reference attaching ConditionCountMetric to a column's
    profile (condition_count_metric.py:94); here the counts become rows
    of the long-form profile table, so constraints (condition_meets /
    condition_never_meets / condition_count_below) read them exactly like
    any other component.
    """
    from .profiler import ProfileView

    counts = condition_counts(df, conditions)
    long = counts.select(
        F.lit("{}").alias("segment"),
        F.lit(column).alias("column"),
        F.lit("condition_count").alias("metric"),
        F.col("condition").alias("component"),
        F.col("matches").alias("n"),
        F.lit(None).cast("double").alias("d"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("binary").alias("b"),
    )
    total = counts.limit(1).select(
        F.lit("{}").alias("segment"),
        F.lit(column).alias("column"),
        F.lit("condition_count").alias("metric"),
        F.lit("total").alias("component"),
        F.col("total").alias("n"),
        F.lit(None).cast("double").alias("d"),
        F.lit(None).cast("string").alias("s"),
        F.lit(None).cast("binary").alias("b"),
    )
    rows = long.unionByName(total)
    if view is None:
        return ProfileView(rows)
    return ProfileView(view.df.unionByName(rows), view.config)


def validate(
    df: DataFrame,
    conditions: Dict[str, Column],
    id_col: Optional[str] = None,
    sample_size: int = 10,
    hash_fn: str = "xxhash64",
) -> "ValidationResult":
    """Row-level validation: counts + per-condition failing-row samples.

    hash_fn picks the sample's shuffle key: "xxhash64" (default, fastest,
    JVM codegen) or "md5" (slower but portable — the same ordering is
    reproducible in any engine with an md5 function, used by the oracle
    parity checks).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    counts = condition_counts(df, conditions)
    samples: Dict[str, DataFrame] = {}
    for name, cond in conditions.items():
        failed = df.filter(~F.coalesce(cond, F.lit(False)))
        if id_col is not None:
            # deterministic pseudo-random sample: stable across runs,
            # computed distributed via TakeOrderedAndProject
            key = (F.xxhash64(F.col(id_col)) if hash_fn == "xxhash64"
                   else F.md5(F.col(id_col).cast("string").cast("binary")))
            failed = failed.orderBy(key.asc()).limit(sample_size)
        else:
            failed = failed.limit(sample_size)
        samples[name] = failed
    return ValidationResult(counts, samples)


class ValidationResult:
    def __init__(self, counts: DataFrame, samples: Dict[str, DataFrame]):
        self.counts = counts
        self.failed_samples = samples

    def failures(self) -> DataFrame:
        return self.counts.withColumn(
            "failures", F.col("total") - F.col("matches"))
