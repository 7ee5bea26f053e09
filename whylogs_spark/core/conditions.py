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

    def to_summary_dict(self) -> Dict[str, int]:
        """{'total_evaluations': n, <condition>: failure_count, ...} —
        same shape as the reference's ConditionValidator.to_summary_dict
        (condition_validator.py:105-109)."""
        rows = self.failures().collect()
        out: Dict[str, int] = {
            "total_evaluations": int(rows[0]["total"]) if rows else 0}
        for r in rows:
            out[r["condition"]] = int(r["failures"])
        return out


def raise_error(validator_name: str, condition_name: str, value,
                row_id=None) -> None:
    """Prebuilt failure action: throw on the first reported failure
    (the reference's raise-on-failure semantic)."""
    suffix = f" (id={row_id!r})" if row_id is not None else ""
    raise ValueError(
        f"validator {validator_name!r}: condition {condition_name!r} "
        f"failed for value {value!r}{suffix}")


class ConditionValidator:
    """Named validator with failure actions (reference:
    python/whylogs/core/validators/condition_validator.py:16; action
    dispatch at :85-89 — signature
    ``action(validator_name, condition_name, value, row_id)``).

    Scale adaptation: failure COUNTS are exact and fully distributed
    (one aggregation pass); ACTIONS run driver-side over the bounded
    deterministic failing-row sample (<= sample_size invocations per
    condition), never as a per-row executor callback — at cluster scale
    a python hook per failing row would serialize the hot path and
    could fire billions of times. Pass ``raise_error`` as an action for
    throw-on-failure behavior.
    """

    def __init__(self, name: str, conditions: Dict[str, Column],
                 actions: Optional[List] = None, sample_size: int = 10):
        if not isinstance(sample_size, int):
            raise ValueError("sample_size must be an integer")
        self.name = name
        self.conditions = dict(conditions)
        self.actions = list(actions or [])
        self.sample_size = sample_size

    def validate(self, df: DataFrame, column: Optional[str] = None,
                 id_col: Optional[str] = None) -> ValidationResult:
        """Run conditions; fire actions for sampled failures. ``column``
        picks the value passed to actions (the reference validates one
        column at a time); defaults to ``id_col`` or the first df column.
        """
        result = validate(df, self.conditions, id_col=id_col,
                          sample_size=self.sample_size)
        if self.actions:
            value_col = column or id_col or df.columns[0]
            fail_counts = {
                r["condition"]: int(r["failures"])
                for r in result.failures().collect()
            }
            for cond_name, sdf in result.failed_samples.items():
                if not fail_counts.get(cond_name):
                    continue
                for r in sdf.collect():
                    value = r[value_col] if value_col in sdf.columns else None
                    rid = (r[id_col]
                           if id_col and id_col in sdf.columns else None)
                    for action in self.actions:
                        if rid is not None:
                            action(self.name, cond_name, value, rid)
                        else:
                            action(self.name, cond_name, value)
        return result
