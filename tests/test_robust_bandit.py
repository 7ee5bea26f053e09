"""Huber regression vs numpy IRLS reference; bandit posteriors vs
closed-form Beta math and simulation-free dominance checks."""

import math

import numpy as np
import pytest

from whylogs_spark.ops.bandit import bandit_report
from whylogs_spark.ops.robust import huber_regression

RNG = np.random.RandomState(53)


def _huber_ref(X, y, delta=1.345, iters=50):
    Xd = np.column_stack([np.ones(len(y)), X])
    beta = np.linalg.solve(Xd.T @ Xd, Xd.T @ y)
    for _ in range(iters):
        r = y - Xd @ beta
        sigma = np.median(np.abs(r)) / 0.6745
        if sigma <= 0:
            break
        cut = delta * sigma
        w = np.where(np.abs(r) <= cut, 1.0, cut / np.abs(r))
        Aw = Xd.T @ (Xd * w[:, None])
        bw = Xd.T @ (w * y)
        nb = np.linalg.solve(Aw, bw)
        if np.max(np.abs(nb - beta)) < 1e-10 * (1 + np.max(np.abs(beta))):
            beta = nb
            break
        beta = nb
    return beta


class TestHuber:
    def test_matches_numpy_irls(self, spark):
        n = 2000
        X = RNG.normal(0, 1, (n, 2))
        y = 3.0 + 2.0 * X[:, 0] - 1.5 * X[:, 1] + RNG.normal(0, 0.5, n)
        # 5% gross outliers CORRELATED with x1 (one-sided, only where
        # x1 is large) so they genuinely bias the OLS slope — random-
        # sign outliers would only inflate variance
        cand = np.where(X[:, 0] > 0.5)[0]
        idx = RNG.choice(cand, 100, replace=False)
        y[idx] += 50.0
        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for (a, b), c in zip(X, y)],
            "x1 double, x2 double, y double")
        got = {r["term"]: r for r in huber_regression(
            df, "y", ["x1", "x2"]).collect()}
        ref = _huber_ref(X, y)
        assert got["intercept"]["beta"] == pytest.approx(ref[0],
                                                         abs=1e-6)
        assert got["x1"]["beta"] == pytest.approx(ref[1], abs=1e-6)
        assert got["x2"]["beta"] == pytest.approx(ref[2], abs=1e-6)
        assert got["x1"]["converged"]
        # robustness: close to the TRUE coefficients despite outliers
        assert abs(got["x1"]["beta"] - 2.0) < 0.1
        assert abs(got["x2"]["beta"] + 1.5) < 0.1
        # plain OLS would be badly biased — check the contrast
        Xd = np.column_stack([np.ones(n), X])
        ols = np.linalg.solve(Xd.T @ Xd, Xd.T @ y)
        assert abs(ols[1] - 2.0) > abs(got["x1"]["beta"] - 2.0)

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "x1 double, y double")
        with pytest.raises(ValueError):
            huber_regression(df, "y", ["x1"], delta=0.0)
        with pytest.raises(ValueError, match="rows"):
            huber_regression(df, "y", ["x1"])


class TestBandit:
    def test_posterior_closed_form(self, spark):
        rows = ([("a", 1.0)] * 60 + [("a", 0.0)] * 40
                + [("b", 1.0)] * 45 + [("b", 0.0)] * 55)
        df = spark.createDataFrame(rows, "arm string, r double")
        got = {r["arm"]: r for r in bandit_report(df, "arm",
                                                  "r").collect()}
        a, b = 1 + 60, 1 + 40
        assert got["a"]["n"] == 100 and got["a"]["successes"] == 60
        assert got["a"]["posterior_mean"] == pytest.approx(
            a / (a + b), rel=1e-12)
        assert got["a"]["posterior_var"] == pytest.approx(
            a * b / ((a + b) ** 2 * (a + b + 1)), rel=1e-12)
        # arm a dominates arm b; p_best must reflect it and sum to 1
        assert got["a"]["p_best"] > 0.9
        assert got["a"]["p_best"] + got["b"]["p_best"] == \
            pytest.approx(1.0, abs=1e-9)
        # central interval brackets the mean and is inside [0, 1]
        r = got["a"]
        assert 0 <= r["ci_lo"] < r["posterior_mean"] < r["ci_hi"] <= 1

    def test_p_best_symmetry(self, spark):
        rows = ([("x", 1.0)] * 30 + [("x", 0.0)] * 70
                + [("y", 1.0)] * 30 + [("y", 0.0)] * 70)
        df = spark.createDataFrame(rows, "arm string, r double")
        got = {r["arm"]: r["p_best"]
               for r in bandit_report(df, "arm", "r").collect()}
        assert got["x"] == pytest.approx(0.5, abs=1e-6)
        assert got["y"] == pytest.approx(0.5, abs=1e-6)

    def test_three_arms_ordering(self, spark):
        rows = []
        for arm, p, n in (("lo", 0.2, 300), ("mid", 0.3, 300),
                          ("hi", 0.4, 300)):
            k = int(p * n)
            rows += [(arm, 1.0)] * k + [(arm, 0.0)] * (n - k)
        df = spark.createDataFrame(rows, "arm string, r double")
        got = {r["arm"]: r["p_best"]
               for r in bandit_report(df, "arm", "r").collect()}
        assert got["hi"] > got["mid"] > got["lo"]
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_validation(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "arm string, r double")
        with pytest.raises(ValueError):
            bandit_report(df, "arm", "r", prior_alpha=0.0)
        with pytest.raises(ValueError):
            bandit_report(df, "arm", "r", grid_points=10)
        empty = spark.createDataFrame([], "arm string, r double")
        with pytest.raises(ValueError, match="no usable"):
            bandit_report(empty, "arm", "r")
