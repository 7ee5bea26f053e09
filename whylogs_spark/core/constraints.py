"""Constraints: assertions over profile summaries.

Reference: MetricConstraint / DatasetConstraint machinery at
python/whylogs/core/constraints/metric_constraints.py:22-225 and the
factory set under python/whylogs/core/constraints/factories/ — each
factory is one comparison against profile components; the report is
(name, passed, failed) per constraint
(metric_constraints.py ConstraintsBuilder.build + Report).

Here a constraint is a named predicate over the wide summary row of one
column (a pandas Series of "metric/component" keys). Reports come back as
a DataFrame-friendly list and a Spark DataFrame when requested.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

import pandas as pd

from .profiler import ProfileView


@dataclass
class Constraint:
    name: str
    column: Optional[str]          # None => dataset-level
    check: Callable[[pd.Series], bool]


class Constraints:
    def __init__(self, view: ProfileView, constraints: List[Constraint]):
        self.view = view
        self.constraints = constraints

    def report(self) -> List[tuple]:
        wide = self.view.to_pandas()
        wide = wide[wide["segment"] == "{}"] if "segment" in wide else wide
        by_col = {r["column"]: r for _, r in wide.iterrows()}
        out = []
        for c in self.constraints:
            row = by_col.get(c.column) if c.column else None
            if c.column is not None and row is None:
                out.append((c.name, 0, 1))
                continue
            try:
                ok = bool(c.check(row))
            except Exception:
                ok = False
            out.append((c.name, 1 if ok else 0, 0 if ok else 1))
        return out

    def validate(self) -> bool:
        return all(p == 1 for _, p, _ in self.report())

    def report_df(self, spark):
        return spark.createDataFrame(
            self.report(), ["constraint", "passed", "failed"])


class ConstraintsBuilder:
    def __init__(self, view: ProfileView):
        self.view = view
        self._constraints: List[Constraint] = []

    def add(self, constraint: Constraint) -> "ConstraintsBuilder":
        self._constraints.append(constraint)
        return self

    def build(self) -> Constraints:
        return Constraints(self.view, self._constraints)


def _get(row: pd.Series, key: str, default=None):
    v = row.get(key)
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return default
    return v


# ---------------------------------------------------------------- factories
# (reference: python/whylogs/core/constraints/factories/count_metrics.py,
#  distribution_metrics.py, cardinality_metrics.py, frequent_items.py,
#  types_metrics.py, condition_counts.py)

def no_missing_values(column: str) -> Constraint:
    return Constraint(
        f"{column} has no missing values", column,
        lambda r: _get(r, "counts/null", 0) == 0)


def null_values_below_number(column: str, number: int) -> Constraint:
    return Constraint(
        f"{column} null values below {number}", column,
        lambda r: _get(r, "counts/null", 0) < number)


def null_percentage_below_number(column: str, number: float) -> Constraint:
    return Constraint(
        f"{column} null percentage below {number}", column,
        lambda r: _get(r, "counts/null", 0) / max(_get(r, "counts/n", 0), 1)
        < number)

def count_below_number(column: str, number: int) -> Constraint:
    return Constraint(
        f"{column} count below {number}", column,
        lambda r: _get(r, "counts/n", 0) < number)


def is_non_negative(column: str) -> Constraint:
    return Constraint(
        f"{column} is non negative", column,
        lambda r: _get(r, "distribution/min", 0.0) >= 0)


def is_in_range(column: str, lower: float, upper: float) -> Constraint:
    return Constraint(
        f"{column} is in range [{lower},{upper}]", column,
        lambda r: _get(r, "distribution/min", float("-inf")) >= lower
        and _get(r, "distribution/max", float("inf")) <= upper)


def greater_than_number(column: str, number: float) -> Constraint:
    return Constraint(
        f"{column} greater than number {number}", column,
        lambda r: _get(r, "distribution/min", float("-inf")) > number)


def smaller_than_number(column: str, number: float) -> Constraint:
    return Constraint(
        f"{column} smaller than number {number}", column,
        lambda r: _get(r, "distribution/max", float("inf")) < number)


def mean_between_range(column: str, lower: float, upper: float) -> Constraint:
    return Constraint(
        f"{column} mean between {lower} and {upper} (inclusive)", column,
        lambda r: lower <= _get(r, "distribution/mean", float("nan"))
        <= upper)


def stddev_between_range(column: str, lower: float, upper: float) -> Constraint:
    return Constraint(
        f"{column} stddev between {lower} and {upper} (inclusive)", column,
        lambda r: lower <= _get(r, "distribution/stddev", float("nan"))
        <= upper)


def quantile_between_range(
    column: str, quantile: float, lower: float, upper: float
) -> Constraint:
    from .planner import _q_name

    key = f"distribution/{_q_name(quantile)}"
    return Constraint(
        f"{column} {key} between {lower} and {upper} (inclusive)", column,
        lambda r: lower <= _get(r, key, float("nan")) <= upper)


def median_between_range(column: str, lower: float, upper: float) -> Constraint:
    return quantile_between_range(column, 0.5, lower, upper)


def distinct_number_in_range(
    column: str, lower: float, upper: float
) -> Constraint:
    return Constraint(
        f"{column} distinct count estimate in range [{lower},{upper}]",
        column,
        lambda r: lower <= _get(r, "cardinality/est", float("nan"))
        <= upper)


def column_is_probably_unique(column: str) -> Constraint:
    """Cardinality bounds bracket the non-null count (reference:
    cardinality_metrics.py:8)."""

    def check(r: pd.Series) -> bool:
        n = _get(r, "counts/n", 0) - _get(r, "counts/null", 0)
        return (_get(r, "cardinality/lower", 0) <= n
                <= _get(r, "cardinality/upper", float("inf")))

    return Constraint(f"{column} is probably unique", column, check)


def frequent_strings_in_reference_set(
    column: str, reference_set: Sequence[str]
) -> Constraint:
    ref = set(reference_set)

    def check(r: pd.Series) -> bool:
        items = json.loads(_get(r, "frequent_items/items", "[]"))
        return bool(items) and all(it["value"] in ref for it in items)

    return Constraint(
        f"{column} values in set {sorted(ref)}", column, check)


def n_most_common_items_in_set(
    column: str, n: int, reference_set: Sequence[str]
) -> Constraint:
    ref = set(reference_set)

    def check(r: pd.Series) -> bool:
        items = json.loads(_get(r, "frequent_items/items", "[]"))[:n]
        return bool(items) and all(it["value"] in ref for it in items)

    return Constraint(
        f"{column} {n}-most common items in set {sorted(ref)}", column,
        check)


def column_has_non_zero_types(
    column: str, types: Sequence[str]
) -> Constraint:
    def check(r: pd.Series) -> bool:
        return all(_get(r, f"types/{t}", 0) > 0 for t in types)

    return Constraint(
        f"{column} has non-zero types {sorted(types)}", column, check)


def column_is_nullable_integral(column: str) -> Constraint:
    return _nullable_type(column, "integral")


def column_is_nullable_fractional(column: str) -> Constraint:
    return _nullable_type(column, "fractional")


def column_is_nullable_string(column: str) -> Constraint:
    return _nullable_type(column, "string")


def column_is_nullable_boolean(column: str) -> Constraint:
    return _nullable_type(column, "boolean")


def _nullable_type(column: str, t: str) -> Constraint:
    def check(r: pd.Series) -> bool:
        n_typed = _get(r, f"types/{t}", 0)
        others = [
            _get(r, f"types/{o}", 0)
            for o in ("integral", "fractional", "boolean", "string",
                      "temporal", "tensor", "object")
            if o != t
        ]
        return n_typed > 0 and all(o == 0 for o in others)

    return Constraint(f"{column} is nullable {t}", column, check)


# ----- condition-count factories (reference: factories/condition_counts.py)
def condition_meets(column: str, condition_name: str) -> Constraint:
    """Every profiled row satisfied the named condition
    (reference condition_meets, condition_counts.py:4). Requires
    condition counts attached via
    ``conditions.attach_condition_counts``."""
    def check(r: pd.Series) -> bool:
        total = _get(r, "condition_count/total")
        matches = _get(r, f"condition_count/{condition_name}")
        return (total is not None and matches is not None
                and matches == total)

    return Constraint(
        f"{column} meets condition {condition_name}", column, check)


def condition_never_meets(column: str, condition_name: str) -> Constraint:
    """No profiled row satisfied the named condition
    (reference condition_never_meets, condition_counts.py:28)."""
    def check(r: pd.Series) -> bool:
        matches = _get(r, f"condition_count/{condition_name}")
        return matches is not None and matches == 0

    return Constraint(
        f"{column} never meets condition {condition_name}", column, check)


def condition_count_below(
    column: str, condition_name: str, max_count: int
) -> Constraint:
    """Matches of the named condition stay strictly below ``max_count``
    (reference condition_count_below, condition_counts.py:52)."""
    def check(r: pd.Series) -> bool:
        matches = _get(r, f"condition_count/{condition_name}")
        return matches is not None and matches < max_count

    return Constraint(
        f"{column} {condition_name} count below {max_count}", column, check)


# ------- constraint auto-generation from a reference profile
# (reference: python/whylogs/experimental/constraints_generation/__init__.py:85)
def generate_constraints(view: ProfileView) -> List[Constraint]:
    """Derive a constraint suite from an already-profiled reference
    dataset: columns with no nulls must stay null-free, numeric ranges
    must hold (with 10% slack), observed distinct counts bound the
    expected cardinality (2x slack)."""
    wide = view.to_pandas()
    wide = wide[wide["segment"] == "{}"] if "segment" in wide else wide
    out: List[Constraint] = []
    for _, row in wide.iterrows():
        col = row["column"]
        n = _get(row, "counts/n", 0)
        if not n:
            continue
        if _get(row, "counts/null", 0) == 0:
            out.append(no_missing_values(col))
        else:
            frac = _get(row, "counts/null", 0) / n
            out.append(null_percentage_below_number(
                col, min(100.0, frac * 100 * 1.5 + 1e-9)))
        vmin = _get(row, "distribution/min")
        vmax = _get(row, "distribution/max")
        if vmin is not None and vmax is not None and vmax >= vmin:
            slack = (vmax - vmin) * 0.1 or abs(vmax) * 0.1 or 1.0
            out.append(is_in_range(col, vmin - slack, vmax + slack))
            if vmin >= 0:
                out.append(is_non_negative(col))
        est = _get(row, "cardinality/est")
        if est is not None and est > 0:
            out.append(distinct_number_in_range(col, 0, est * 2))
    return out


# ------- dataset comparison constraints
# (reference: DatasetComparisonConstraint / DatasetConstraint,
#  python/whylogs/core/constraints/metric_constraints.py:203,225 —
#  predicates over a (reference profile, target profile) pair)
@dataclass
class ComparisonConstraint:
    name: str
    column: Optional[str]
    # check(ref_row, target_row) -> bool; rows are wide summary Series
    check: Callable[[pd.Series, pd.Series], bool]


class ComparisonConstraints:
    def __init__(self, reference: ProfileView, target: ProfileView,
                 constraints: List[ComparisonConstraint]):
        self.reference = reference
        self.target = target
        self.constraints = constraints

    def report(self) -> List[tuple]:
        def by_col(view):
            wide = view.to_pandas()
            if "segment" in wide:
                wide = wide[wide["segment"] == "{}"]
            return {r["column"]: r for _, r in wide.iterrows()}

        ref, tgt = by_col(self.reference), by_col(self.target)
        out = []
        for c in self.constraints:
            rrow = ref.get(c.column) if c.column else None
            trow = tgt.get(c.column) if c.column else None
            if c.column is not None and (rrow is None or trow is None):
                out.append((c.name, 0, 1))
                continue
            try:
                ok = bool(c.check(rrow, trow))
            except Exception:
                ok = False
            out.append((c.name, 1 if ok else 0, 0 if ok else 1))
        return out

    def validate(self) -> bool:
        return all(p == 1 for _, p, _ in self.report())


def mean_within_reference(column: str, rel_tol: float = 0.1
                          ) -> ComparisonConstraint:
    def check(ref: pd.Series, tgt: pd.Series) -> bool:
        rm = _get(ref, "distribution/mean")
        tm = _get(tgt, "distribution/mean")
        if rm is None or tm is None:
            return False
        scale = max(abs(rm), 1e-12)
        return abs(tm - rm) / scale <= rel_tol

    return ComparisonConstraint(
        f"{column} mean within {rel_tol} of reference", column, check)


def null_ratio_not_above_reference(column: str, slack: float = 0.0
                                   ) -> ComparisonConstraint:
    def check(ref: pd.Series, tgt: pd.Series) -> bool:
        def ratio(r):
            return _get(r, "counts/null", 0) / max(_get(r, "counts/n", 0), 1)
        return ratio(tgt) <= ratio(ref) + slack

    return ComparisonConstraint(
        f"{column} null ratio not above reference (+{slack})", column, check)


def distinct_est_within_reference(column: str, rel_tol: float = 0.5
                                  ) -> ComparisonConstraint:
    def check(ref: pd.Series, tgt: pd.Series) -> bool:
        re_ = _get(ref, "cardinality/est")
        te = _get(tgt, "cardinality/est")
        if re_ is None or te is None:
            return False
        scale = max(abs(re_), 1.0)
        return abs(te - re_) / scale <= rel_tol

    return ComparisonConstraint(
        f"{column} distinct estimate within {rel_tol} of reference",
        column, check)


def range_within_reference(column: str, slack_frac: float = 0.1
                           ) -> ComparisonConstraint:
    def check(ref: pd.Series, tgt: pd.Series) -> bool:
        rmin, rmax = _get(ref, "distribution/min"), _get(ref, "distribution/max")
        tmin, tmax = _get(tgt, "distribution/min"), _get(tgt, "distribution/max")
        if None in (rmin, rmax, tmin, tmax):
            return False
        slack = (rmax - rmin) * slack_frac
        return tmin >= rmin - slack and tmax <= rmax + slack

    return ComparisonConstraint(
        f"{column} range within reference (+/-{slack_frac})", column, check)
