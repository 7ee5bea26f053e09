"""Declarative data-contract checks over a DataFrame — the
dbt-tests / expectation-suite surface, compiled into as few passes as
Spark allows.

The reference's constraint system runs over PROFILE rows (one metric
bundle per column — ``python/whylogs/core/constraints``), which cannot
see cross-column facts (correlations, functional dependencies,
row-level predicates). This module checks the DATA directly with the
same declarative spirit: a spec list in, a (check, passed, observed,
expected) report out.

Check types::

    {"check": "row_count_between", "min": 1, "max": 10**12}
    {"check": "no_nulls", "column": "id"}
    {"check": "null_rate_below", "column": "email", "rate": 0.05}
    {"check": "unique", "column": "id"}
    {"check": "accepted_values", "column": "status",
     "values": ["A", "B"]}           # nulls don't violate
    {"check": "expression", "name": "price sane",
     "expr": "price >= 0 AND price < 1e9", "max_violations": 0}
    {"check": "min_at_least", "column": "qty", "value": 0}
    {"check": "max_at_most", "column": "qty", "value": 100}
    {"check": "mean_between", "column": "x", "min": 0, "max": 1}
    {"check": "corr_abs_below", "x": "feat", "y": "label",
     "limit": 0.95}                  # leakage guard
    {"check": "distinct_count_between", "column": "country",
     "min": 1, "max": 300}
    {"check": "matches_regex", "column": "email",
     "pattern": "^[^@]+@[^@]+$"}     # nulls don't violate
    {"check": "stddev_below", "column": "score", "value": 10}
    {"check": "fd_holds", "determinants": ["order_id"],
     "dependents": ["order_date"]}   # own bounded aggregation branch

Plan shape: every check except ``fd_holds`` becomes aggregate
expressions in ONE shared ``agg`` pass (partial-aggregated map-side —
a 40-check contract costs one scan); each ``fd_holds`` adds one
bounded two-level aggregation branch; the report is a union of the
exploded 1-row frames. Nothing is collected, no UDFs.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_dataframe"]

_REPORT_COLS = ("check", "passed", "observed", "expected")


def _require(spec: dict, *keys: str) -> None:
    missing = [k for k in keys if k not in spec]
    if missing:
        raise ValueError(
            f"check {spec.get('check')!r} missing keys: {missing}")


def _col_exists(df: DataFrame, spec: dict, key: str) -> str:
    _require(spec, key)  # a ValueError, not a bare KeyError
    c = spec[key]
    if c not in df.columns:
        raise ValueError(
            f"check {spec.get('check')!r}: column not found: {c!r}")
    return c


def check_dataframe(df: DataFrame, checks: Sequence[dict]) -> DataFrame:
    """Evaluate the contract and return one row per check:
    ``(check, passed, observed, expected)`` — ``observed`` is the
    measured number (count, rate, correlation, …) as a double,
    ``expected`` the human-readable bound. Validation errors (unknown
    check names, missing params, missing columns) raise BEFORE any
    job runs.

    Use ``.filter("NOT passed")`` as the CI gate; the full frame is
    the audit record.
    """
    checks = list(checks)
    if not checks:
        raise ValueError("checks must be non-empty")
    agg_exprs: List[Column] = []
    rows: List[Column] = []
    fd_branches = []
    n_all = F.count(F.lit(1))

    def report(name: str, passed: Column, observed: Column,
               expected: str, tag: str) -> None:
        agg_exprs.append(observed.cast("double").alias(f"__o_{tag}"))
        agg_exprs.append(passed.alias(f"__p_{tag}"))
        rows.append(F.struct(
            F.lit(name).alias("check"),
            F.coalesce(F.col(f"__p_{tag}"), F.lit(False))
            .alias("passed"),
            F.col(f"__o_{tag}").alias("observed"),
            F.lit(expected).alias("expected")))

    for i, spec in enumerate(checks):
        kind = spec.get("check")
        tag = str(i)
        if kind == "row_count_between":
            lo = int(spec.get("min", 0))
            hi = spec.get("max")
            ok = n_all >= lo
            exp = f">= {lo}"
            if hi is not None:
                ok = ok & (n_all <= int(hi))
                exp = f"in [{lo}, {hi}]"
            report(f"row count {exp}", ok, n_all, exp, tag)
        elif kind == "no_nulls":
            c = _col_exists(df, spec, "column")
            nulls = F.count(F.when(F.col(c).isNull(), F.lit(1)))
            report(f"{c} has no nulls", nulls == 0, nulls, "0 nulls",
                   tag)
        elif kind == "null_rate_below":
            _require(spec, "column", "rate")
            c = _col_exists(df, spec, "column")
            rate = float(spec["rate"])
            nulls = F.count(F.when(F.col(c).isNull(), F.lit(1)))
            obs = F.when(n_all > 0, nulls / n_all)
            report(f"{c} null rate below {rate}",
                   F.coalesce(obs, F.lit(0.0)) < rate, obs,
                   f"< {rate}", tag)
        elif kind == "unique":
            c = _col_exists(df, spec, "column")
            nn = F.count(F.col(c))
            dupes = nn - F.countDistinct(F.col(c))
            report(f"{c} is unique", dupes == 0, dupes,
                   "0 duplicate values", tag)
        elif kind == "accepted_values":
            _require(spec, "column", "values")
            c = _col_exists(df, spec, "column")
            vals = list(spec["values"])
            bad = F.count(F.when(
                F.col(c).isNotNull() & ~F.col(c).isin(vals),
                F.lit(1)))
            report(f"{c} in accepted set", bad == 0, bad,
                   f"values in {vals}", tag)
        elif kind == "expression":
            _require(spec, "expr")
            name = spec.get("name", spec["expr"])
            max_v = int(spec.get("max_violations", 0))
            viol = F.count(F.when(
                ~F.coalesce(F.expr(spec["expr"]), F.lit(False)),
                F.lit(1)))
            report(f"expression: {name}", viol <= max_v, viol,
                   f"<= {max_v} violations", tag)
        elif kind in ("min_at_least", "max_at_most"):
            _require(spec, "column", "value")
            c = _col_exists(df, spec, "column")
            v = float(spec["value"])
            if kind == "min_at_least":
                obs = F.min(F.col(c).cast("double"))
                ok = F.coalesce(obs >= v, F.lit(True))  # empty passes
                report(f"{c} min >= {v}", ok, obs, f">= {v}", tag)
            else:
                obs = F.max(F.col(c).cast("double"))
                ok = F.coalesce(obs <= v, F.lit(True))
                report(f"{c} max <= {v}", ok, obs, f"<= {v}", tag)
        elif kind == "mean_between":
            _require(spec, "column", "min", "max")
            c = _col_exists(df, spec, "column")
            lo, hi = float(spec["min"]), float(spec["max"])
            obs = F.avg(F.col(c).cast("double"))
            ok = F.coalesce((obs >= lo) & (obs <= hi), F.lit(False))
            report(f"{c} mean in [{lo}, {hi}]", ok, obs,
                   f"in [{lo}, {hi}]", tag)
        elif kind == "corr_abs_below":
            _require(spec, "x", "y", "limit")
            x = _col_exists(df, spec, "x")
            y = _col_exists(df, spec, "y")
            limit = float(spec["limit"])
            from whylogs_spark.ops.stats import _pearson
            xc = F.col(x).cast("double")
            yc = F.col(y).cast("double")
            xc = F.when(~F.isnan(xc), xc)
            yc = F.when(~F.isnan(yc), yc)
            obs = F.abs(_pearson(xc, yc))
            # a constant side (null corr) cannot leak — passes
            ok = F.coalesce(obs < limit, F.lit(True))
            report(f"|corr({x}, {y})| below {limit}", ok, obs,
                   f"< {limit}", tag)
        elif kind == "distinct_count_between":
            _require(spec, "column", "min", "max")
            c = _col_exists(df, spec, "column")
            lo, hi = int(spec["min"]), int(spec["max"])
            obs = F.countDistinct(F.col(c))
            ok = (obs >= lo) & (obs <= hi)
            report(f"{c} distinct count in [{lo}, {hi}]", ok, obs,
                   f"in [{lo}, {hi}]", tag)
        elif kind == "matches_regex":
            _require(spec, "column", "pattern")
            c = _col_exists(df, spec, "column")
            pat = str(spec["pattern"])
            max_v = int(spec.get("max_violations", 0))
            bad = F.count(F.when(
                F.col(c).isNotNull()
                & ~F.col(c).cast("string").rlike(pat), F.lit(1)))
            report(f"{c} matches regex", bad <= max_v, bad,
                   f"<= {max_v} non-matching", tag)
        elif kind == "stddev_below":
            _require(spec, "column", "value")
            c = _col_exists(df, spec, "column")
            v = float(spec["value"])
            obs = F.stddev_samp(F.col(c).cast("double"))
            ok = F.coalesce(obs < v, F.lit(True))  # constant passes
            report(f"{c} stddev below {v}", ok, obs, f"< {v}", tag)
        elif kind == "fd_holds":
            _require(spec, "determinants", "dependents")
            fd_branches.append((tag, spec))
        else:
            raise ValueError(
                f"unknown check: {kind!r} (see ops/expect.py for the "
                "supported set)")

    parts = []
    if rows:
        one = df.agg(*agg_exprs)
        parts.append(
            one.select(F.explode(F.array(*rows)).alias("r"))
            .select(*[F.col(f"r.{c}") for c in _REPORT_COLS]))
    for tag, spec in fd_branches:
        from whylogs_spark.ops.integrity import \
            functional_dependency_report
        det = list(spec["determinants"])
        dep = list(spec["dependents"])
        fd = functional_dependency_report(df, det, dep)
        parts.append(fd.select(
            F.lit(f"fd: {','.join(det)} -> {','.join(dep)}")
            .alias("check"),
            F.col("holds").alias("passed"),
            F.col("violating_rows").cast("double").alias("observed"),
            F.lit("0 violating rows").alias("expected")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
