"""Cox proportional hazards vs an independent numpy Newton."""

import numpy as np
import pytest

from whylogs_spark.ops.survival import cox_ph, cox_report

RNG = np.random.RandomState(31)


def _ref_cox(t, e, x, iters=50, ridge=1e-9):
    """Plain numpy Breslow-ties Newton on the partial likelihood,
    written independently (dense risk-set masks, no prefix trick)."""
    t = np.asarray(t, float)
    e = np.asarray(e, float)
    x = np.asarray(x, float)
    if x.ndim == 1:
        x = x[:, None]
    x = x - x.mean(axis=0)
    p = x.shape[1]
    beta = np.zeros(p)
    times = np.unique(t[e == 1])
    for _ in range(iters):
        eta = np.clip(x @ beta, -30, 30)
        w = np.exp(eta)
        grad = np.zeros(p)
        hess = np.zeros((p, p))
        ll = 0.0
        for tt in times:
            risk = t >= tt
            ev = (t == tt) & (e == 1)
            d = ev.sum()
            s0 = w[risk].sum()
            s1 = (x[risk] * w[risk, None]).sum(axis=0)
            s2 = (x[risk].T * w[risk]) @ x[risk]
            ll += eta[ev].sum() - d * np.log(s0)
            grad += x[ev].sum(axis=0) - d * s1 / s0
            hess += d * (s2 / s0 - np.outer(s1 / s0, s1 / s0))
        step = np.linalg.solve(hess + ridge * np.eye(p), grad)
        beta += step
        if np.abs(step).max() < 1e-10:
            break
    cov = np.linalg.inv(hess + ridge * np.eye(p))
    return beta, np.sqrt(np.diag(cov)), ll


def _sim(n=300, p=2):
    x = RNG.normal(0, 1, (n, p))
    true_beta = np.array([0.8, -0.5])[:p]
    u = RNG.uniform(size=n)
    t = -np.log(u) / (0.1 * np.exp(x @ true_beta))
    cens = RNG.uniform(0, np.percentile(t, 80), n)
    e = (t <= cens).astype(float)
    obs = np.minimum(t, cens)
    # discretize to force Breslow ties onto both implementations
    obs = np.round(obs, 1)
    return obs, e, x


class TestCox:
    def test_matches_numpy_newton_with_ties(self, spark):
        t, e, x = _sim()
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(d))
             for a, b, (c, d) in zip(t, e, x)],
            "t double, e double, x1 double, x2 double")
        m = cox_ph(df, "t", "e", ["x1", "x2"])
        beta, ses, ll = _ref_cox(t, e, x)
        assert m["converged"]
        assert m["n"] == len(t) and m["n_events"] == int(e.sum())
        assert abs(m["coef"]["x1"] - beta[0]) < 1e-6
        assert abs(m["coef"]["x2"] - beta[1]) < 1e-6
        assert abs(m["se"]["x1"] - ses[0]) < 1e-6
        assert abs(m["se"]["x2"] - ses[1]) < 1e-6
        assert abs(m["log_likelihood"] - ll) < 1e-6
        assert abs(m["hazard_ratio"]["x1"]
                   - np.exp(beta[0])) < 1e-6

    def test_recovers_simulated_effect_direction(self, spark):
        t, e, x = _sim(n=500)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(d))
             for a, b, (c, d) in zip(t, e, x)],
            "t double, e double, x1 double, x2 double")
        m = cox_ph(df, "t", "e", ["x1", "x2"])
        # true betas 0.8 / -0.5; 500 samples -> generous tolerance
        assert 0.4 < m["coef"]["x1"] < 1.3
        assert -1.0 < m["coef"]["x2"] < -0.1

    def test_report_shape(self, spark):
        t, e, x = _sim(n=120)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(d))
             for a, b, (c, d) in zip(t, e, x)],
            "t double, e double, x1 double, x2 double")
        rep = {r["term"]: r for r in
               cox_report(df, "t", "e", ["x1", "x2"]).collect()}
        assert set(rep) == {"x1", "x2", "__model__"}
        assert rep["__model__"]["beta"] == 120.0
        assert rep["x1"]["z"] is not None
        assert abs(rep["x1"]["hazard_ratio"]
                   - np.exp(rep["x1"]["beta"])) < 1e-9

    def test_validations(self, spark):
        df = spark.createDataFrame([(1.0, 1.0, 1.0)],
                                   "t double, e double, x double")
        with pytest.raises(ValueError):
            cox_ph(df, "t", "e", [])
        with pytest.raises(ValueError):
            cox_ph(df, "t", "e", ["x"], max_iter=0)
