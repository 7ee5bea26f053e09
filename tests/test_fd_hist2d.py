"""Tests for winsorize, histogram2d (core.summaries) and the
functional-dependency checks (ops.integrity)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.core.summaries import histogram2d, winsorize
from whylogs_spark.ops.integrity import (
    fd_violation_examples,
    functional_dependency_report,
)


# ------------------------------------------------------- winsorize

def test_winsorize_matches_numpy_order_stats(spark):
    rng = np.random.RandomState(9)
    vals = rng.normal(size=500) * 100
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, x double")
    out = winsorize(df, "x", lower=0.05, upper=0.95).collect()
    # lower interpolation == order statistic at ceil(q*n)-1 (0-based)
    s = np.sort(vals)
    lo = s[max(int(math.ceil(0.05 * len(s))) - 1, 0)]
    hi = s[max(int(math.ceil(0.95 * len(s))) - 1, 0)]
    for r in out:
        expect = min(max(vals[r.id], lo), hi)
        assert r.x_winsorized == pytest.approx(expect, abs=0)
    clipped = [r for r in out if r.x_winsorized != vals[r.id]]
    assert len(clipped) > 0  # tails actually got capped
    # clipped values are existing data values, not interpolations
    assert {r.x_winsorized for r in clipped} <= {lo, hi}


def test_winsorize_null_nan_and_validation(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (float("nan"),)],
        "x double")
    out = winsorize(df, "x", lower=0.0, upper=1.0).collect()
    got = {r.x if r.x is None or not math.isnan(r.x) else "nan":
           r.x_winsorized for r in out}
    assert got[1.0] == 1.0 and got[3.0] == 3.0
    assert got[None] is None and got["nan"] is None
    with pytest.raises(ValueError, match="lower < upper"):
        winsorize(df, "x", lower=0.9, upper=0.1)


# ------------------------------------------------------- histogram2d

def test_histogram2d_matches_numpy(spark):
    rng = np.random.RandomState(4)
    xs = rng.uniform(0, 10, size=400)
    ys = rng.uniform(-5, 5, size=400)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)],
        "x double, y double")
    out = histogram2d(df, "x", "y", n_bins_x=5, n_bins_y=4).collect()
    assert len(out) == 20
    h, xe, ye = np.histogram2d(
        xs, ys, bins=[5, 4],
        range=[[xs.min(), xs.max()], [ys.min(), ys.max()]])
    for r in out:
        assert r.n == int(h[r.bin_x, r.bin_y])
        assert r.x_start == pytest.approx(xe[r.bin_x], abs=1e-6)
        assert r.y_end == pytest.approx(ye[r.bin_y + 1], abs=1e-6)
    assert sum(r.n for r in out) == 400


def test_histogram2d_pairwise_complete_and_constant(spark):
    rows = [(1.0, 2.0), (2.0, 2.0), (None, 3.0), (4.0, None),
            (float("nan"), 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = histogram2d(df, "x", "y", n_bins_x=2, n_bins_y=2).collect()
    assert sum(r.n for r in out) == 2  # only fully-present rows
    # constant y collapses to bin_y 0
    assert all(r.n == 0 or r.bin_y == 0 for r in out)
    with pytest.raises(ValueError, match="n_bins"):
        histogram2d(df, "x", "y", n_bins_x=0)


# ------------------------------------------------ functional deps

def test_fd_report_holds_and_violations(spark):
    rows = [
        ("o1", "2024-01-01", 10),
        ("o1", "2024-01-01", 11),
        ("o2", "2024-01-02", 12),
        ("o3", "2024-01-03", 13),
        ("o3", "2024-01-04", 14),  # o3 maps to two dates: violation
        ("o3", "2024-01-04", 15),
    ]
    df = spark.createDataFrame(rows, "ok string, dt string, x long")
    r = functional_dependency_report(df, ["ok"], ["dt"]).collect()[0]
    assert (r.n_rows, r.n_groups) == (6, 3)
    assert r.violating_groups == 1 and r.violating_rows == 3
    assert r.max_variants == 2 and not r.holds
    assert r.strength == pytest.approx(0.5)
    ok = functional_dependency_report(df, ["ok", "dt"], ["x"])
    assert not ok.collect()[0].holds  # x varies within (o1, date)
    holds = functional_dependency_report(df, ["x"], ["ok"]).collect()[0]
    assert holds.holds and holds.strength == 1.0


def test_fd_nulls_are_values(spark):
    rows = [("k", None), ("k", "a"), ("j", None), ("j", None)]
    df = spark.createDataFrame(rows, "d string, v string")
    r = functional_dependency_report(df, ["d"], ["v"]).collect()[0]
    # k -> {NULL, 'a'} is a violation (2 variants); j -> {NULL} holds
    assert r.violating_groups == 1 and r.max_variants == 2


def test_fd_empty_and_validation(spark):
    df = spark.createDataFrame([], "d string, v string")
    r = functional_dependency_report(df, ["d"], ["v"]).collect()[0]
    assert (r.n_rows, r.n_groups, r.violating_groups) == (0, 0, 0)
    assert r.holds and r.strength is None
    with pytest.raises(ValueError, match="overlap"):
        functional_dependency_report(df, ["d"], ["d"])
    with pytest.raises(ValueError, match="required"):
        functional_dependency_report(df, [], ["v"])


def test_fd_violation_examples_validation(spark):
    df = spark.createDataFrame([("a", "x")], "d string, v string")
    with pytest.raises(ValueError, match="overlap"):
        fd_violation_examples(df, ["d"], ["d"])
    with pytest.raises(ValueError, match="required"):
        fd_violation_examples(df, [], ["v"])


def test_fd_violation_examples_ranked(spark):
    rows = ([("a", str(i)) for i in range(5)]      # 5 variants
            + [("b", str(i)) for i in range(3)]    # 3 variants
            + [("c", "x"), ("c", "x")])            # holds
    df = spark.createDataFrame(rows, "d string, v string")
    out = fd_violation_examples(df, ["d"], ["v"], k=10).collect()
    assert [r.d for r in out] == ["a", "b"]
    assert out[0].n_variants == 5 and out[1].n_variants == 3
