"""quantile_regression: cross-implementation IRLS parity against an
independent numpy twin, quantile ordering sanity, and validation."""

import numpy as np
import pytest

from whylogs_spark.ops.robust import quantile_regression


def _numpy_qreg(X, y, tau, max_iter=50, tol=1e-8, eps=1e-6):
    """Independent replay of the same smoothed-IRLS scheme."""
    n = len(y)
    Xd = np.column_stack([np.ones(n), X])

    def solve(w):
        A = Xd.T @ (Xd * w[:, None])
        b = Xd.T @ (y * w)
        return np.linalg.solve(A, b)

    beta = solve(np.ones(n))
    for _ in range(1, max_iter + 1):
        r = y - Xd @ beta
        w = np.abs(tau - (r < 0).astype(float)) / np.maximum(
            np.abs(r), eps)
        nb = solve(w)
        if np.max(np.abs(nb - beta)) < tol * (1 + np.max(np.abs(beta))):
            beta = nb
            break
        beta = nb
    return beta


@pytest.mark.parametrize("tau", [0.25, 0.5, 0.9])
def test_qreg_matches_numpy_twin(spark, tau):
    rng = np.random.RandomState(7)
    n = 400
    x0 = rng.uniform(0, 10, n)
    x1 = rng.uniform(-2, 2, n)
    y = 1.5 + 2.0 * x0 - 0.7 * x1 + rng.standard_t(4, n) * (
        1.0 + 0.3 * x0)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x0, x1, y)],
        "x0 double, x1 double, y double")
    got = {r["term"]: r for r in quantile_regression(
        df, "y", ["x0", "x1"], tau=tau).collect()}
    want = _numpy_qreg(np.column_stack([x0, x1]), y, tau)
    assert got["intercept"]["beta"] == pytest.approx(want[0], abs=1e-6)
    assert got["x0"]["beta"] == pytest.approx(want[1], abs=1e-6)
    assert got["x1"]["beta"] == pytest.approx(want[2], abs=1e-6)
    assert got["x0"]["n"] == n
    assert got["x0"]["tau"] == tau


def test_qreg_quantile_ordering(spark):
    """Fitted conditional quantiles must be ordered in tau at the
    covariate mean (heteroskedastic noise makes them distinct)."""
    rng = np.random.RandomState(11)
    n = 600
    x = rng.uniform(0, 10, n)
    y = 3.0 + 1.0 * x + rng.normal(0, 1 + 0.5 * x, n)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)],
        "x double, y double")
    levels = {}
    for tau in (0.1, 0.5, 0.9):
        b = {r["term"]: r["beta"] for r in quantile_regression(
            df, "y", ["x"], tau=tau).collect()}
        levels[tau] = b["intercept"] + b["x"] * 5.0
    assert levels[0.1] < levels[0.5] < levels[0.9]
    # median fit should sit near the true central line at x=5
    assert levels[0.5] == pytest.approx(8.0, abs=0.6)


def test_qreg_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
    with pytest.raises(ValueError, match="tau"):
        quantile_regression(df, "y", ["x"], tau=1.5)
    with pytest.raises(ValueError, match="eps"):
        quantile_regression(df, "y", ["x"], eps=0.0)
    with pytest.raises(ValueError, match="rows"):
        quantile_regression(df, "y", ["x"])
