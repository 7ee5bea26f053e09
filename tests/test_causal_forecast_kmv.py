"""causal / forecast / setsketch operators vs numpy references."""

import math

import numpy as np
import pytest

from whylogs_spark.ops.causal import (
    did_estimator, fit_logistic, ipw_att, logistic_score_col,
    _norm_ppf,
)
from whylogs_spark.ops.forecast import ses_forecast
from whylogs_spark.ops.setsketch import kmv_distinct, kmv_pairwise_overlap

RNG = np.random.RandomState(11)


class TestDiD:
    def test_matches_numpy(self, spark):
        rows = []
        cells = {("t", "post"): (5.0, 200), ("t", "pre"): (2.0, 180),
                 ("c", "post"): (3.5, 220), ("c", "pre"): (1.5, 190)}
        ref = {}
        for (g, p), (mu, n) in cells.items():
            vals = RNG.normal(mu, 1.0, n)
            ref[(g, p)] = vals
            rows += [(g, p, float(v)) for v in vals]
        df = spark.createDataFrame(rows, "g string, p string, v double")
        row = did_estimator(df, "g", "p", "v", "t", "post").collect()[0]
        m = {k: v.mean() for k, v in ref.items()}
        did = (m[("t", "post")] - m[("t", "pre")]) \
            - (m[("c", "post")] - m[("c", "pre")])
        se = math.sqrt(sum(v.var(ddof=1) / len(v) for v in ref.values()))
        assert abs(row["did"] - did) < 1e-9
        assert abs(row["se"] - se) < 1e-9
        assert row["ci_lo"] < did < row["ci_hi"]
        assert abs(row["mean_t_post"] - m[("t", "post")]) < 1e-9
        # true DiD is (5-2)-(3.5-1.5)=1.0; CI should cover it
        assert row["ci_lo"] < 1.0 < row["ci_hi"]

    def test_alpha_validation(self, spark):
        df = spark.createDataFrame([("t", "post", 1.0)],
                                   "g string, p string, v double")
        with pytest.raises(ValueError):
            did_estimator(df, "g", "p", "v", "t", "post", alpha=1.5)


def test_norm_ppf_reference_values():
    assert abs(_norm_ppf(0.975) - 1.959963985) < 1e-8
    assert abs(_norm_ppf(0.95) - 1.644853627) < 1e-8
    assert abs(_norm_ppf(0.5)) < 1e-12
    assert abs(_norm_ppf(0.01) + 2.326347874) < 1e-8


def _ref_logistic(x, y, iters=50, ridge=1e-8):
    """Plain numpy Newton IRLS with intercept."""
    xb = np.hstack([np.ones((len(y), 1)), x])
    beta = np.zeros(xb.shape[1])
    for _ in range(iters):
        eta = np.clip(xb @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1 - mu)
        grad = xb.T @ (y - mu)
        hess = (xb * w[:, None]).T @ xb + ridge * np.eye(xb.shape[1])
        step = np.linalg.solve(hess, grad)
        beta += step
        if np.abs(step).max() < 1e-10:
            break
    return beta


class TestLogisticIPW:
    def test_fit_matches_numpy_irls(self, spark):
        n = 500
        x = RNG.normal(0, 1, (n, 2))
        eta = -0.4 + 1.2 * x[:, 0] - 0.7 * x[:, 1]
        y = (RNG.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(t))
             for (a, b), t in zip(x, y)], "x1 double, x2 double, y double")
        m = fit_logistic(df, "y", ["x1", "x2"])
        ref = _ref_logistic(x, y)
        assert m["converged"] and m["n"] == n
        assert abs(m["intercept"] - ref[0]) < 1e-6
        assert abs(m["coef"]["x1"] - ref[1]) < 1e-6
        assert abs(m["coef"]["x2"] - ref[2]) < 1e-6
        # scoring expression reproduces sigmoid(x @ beta)
        scored = df.withColumn(
            "s", logistic_score_col(m)).agg(
            {"s": "avg"}).collect()[0][0]
        mu = 1 / (1 + np.exp(-np.clip(
            ref[0] + x @ ref[1:], -30, 30)))
        assert abs(scored - mu.mean()) < 1e-6

    def test_ipw_att_recovers_effect(self, spark):
        # confounded treatment: x drives both assignment and outcome;
        # true ATT = 2.0
        n = 4000
        x = RNG.normal(0, 1, n)
        p = 1 / (1 + np.exp(-(0.8 * x)))
        t = (RNG.uniform(size=n) < p).astype(float)
        y = 1.5 * x + 2.0 * t + RNG.normal(0, 0.4, n)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for a, b, c in zip(x, t, y)],
            "x double, t double, y double")
        row = ipw_att(df, "t", "y", ["x"]).collect()[0]
        naive = y[t == 1].mean() - y[t == 0].mean()
        assert abs(naive - 2.0) > 0.5       # confounding is real
        assert abs(row["att"] - 2.0) < 0.25  # IPW removes it
        assert row["model_converged"]
        assert 0 < row["ess_ctrl"] <= row["n_ctrl"]

    def test_validations(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
        with pytest.raises(ValueError):
            fit_logistic(df, "y", [])
        with pytest.raises(ValueError):
            ipw_att(df, "y", "x", ["x"], clip=1.5)


def _ref_ses(xs, alpha):
    lev = xs[0]
    prev = None
    for x in xs[1:]:
        prev = lev
        lev = alpha * x + (1 - alpha) * lev
    return lev, prev


class TestSES:
    def test_matches_recursive_reference(self, spark):
        series = {"a": list(RNG.normal(10, 2, 40)),
                  "b": list(RNG.normal(-3, 1, 7)),
                  "c": [4.2]}
        rows = [(g, i, float(v)) for g, vs in series.items()
                for i, v in enumerate(vs)]
        df = spark.createDataFrame(rows, "g string, t int, v double")
        out = {r["g"]: r for r in
               ses_forecast(df, "t", "v", ["g"], alpha=0.3).collect()}
        for g, vs in series.items():
            lev, prev = _ref_ses(vs, 0.3)
            assert out[g]["n"] == len(vs)
            assert abs(out[g]["level"] - lev) < 1e-9, g
            assert out[g]["forecast"] == out[g]["level"]
            if len(vs) >= 2:
                assert abs(out[g]["one_step_error"]
                           - (vs[-1] - prev)) < 1e-9, g
            else:
                assert out[g]["one_step_error"] is None

    def test_alpha_one_is_naive(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 5.0), ("a", 1, 9.0)], "g string, t int, v double")
        row = ses_forecast(df, "t", "v", ["g"], alpha=1.0).collect()[0]
        assert row["level"] == 9.0
        assert abs(row["one_step_error"] - 4.0) < 1e-12

    def test_duplicate_timestamps_mean_collapse(self, spark):
        df = spark.createDataFrame(
            [("a", 0, 2.0), ("a", 0, 4.0), ("a", 1, 6.0)],
            "g string, t int, v double")
        row = ses_forecast(df, "t", "v", ["g"], alpha=0.5).collect()[0]
        assert row["n"] == 2
        assert abs(row["level"] - (0.5 * 6.0 + 0.5 * 3.0)) < 1e-12

    def test_max_points_guard(self, spark):
        df = spark.createDataFrame(
            [("a", i, float(i)) for i in range(30)],
            "g string, t int, v double")
        with pytest.raises(ValueError, match="max_points"):
            ses_forecast(df, "t", "v", ["g"], max_points=10)

    def test_global_series_no_groups(self, spark):
        df = spark.createDataFrame(
            [(0, 1.0), (1, 2.0), (2, 3.0)], "t int, v double")
        row = ses_forecast(df, "t", "v", alpha=0.5).collect()[0]
        lev, _ = _ref_ses([1.0, 2.0, 3.0], 0.5)
        assert abs(row["level"] - lev) < 1e-12


class TestKMV:
    def test_distinct_exact_below_k(self, spark):
        df = spark.createDataFrame(
            [("s1", i % 40) for i in range(400)]
            + [("s2", i % 25) for i in range(100)],
            "seg string, key int")
        out = {r["segment"]: r for r in
               kmv_distinct(df, "seg", ["key"], k=64).collect()}
        assert out["s1"]["distinct_est"] == 40.0
        assert out["s2"]["distinct_est"] == 25.0

    def test_distinct_estimate_above_k(self, spark):
        true_d = 5000
        df = spark.createDataFrame(
            [("s", i) for i in range(true_d)], "seg string, key int")
        row = kmv_distinct(df, "seg", ["key"], k=512).collect()[0]
        assert row["sketch_size"] == 512
        # ~1/sqrt(k) relative error -> 4.4% at k=512; allow 4 sigma
        assert abs(row["distinct_est"] - true_d) / true_d < 0.18

    def test_pairwise_overlap(self, spark):
        # s1 = 0..3999, s2 = 2000..5999 -> |∩|=2000, |∪|=6000, J=1/3
        rows = ([("s1", i) for i in range(4000)]
                + [("s2", i) for i in range(2000, 6000)])
        df = spark.createDataFrame(rows, "seg string, key int")
        row = kmv_pairwise_overlap(df, "seg", ["key"], k=512) \
            .collect()[0]
        assert row["segment_a"] == "s1" and row["segment_b"] == "s2"
        assert abs(row["jaccard_est"] - 1 / 3) < 0.09
        assert abs(row["union_est"] - 6000) / 6000 < 0.18
        assert abs(row["intersection_est"] - 2000) / 2000 < 0.3

    def test_pairwise_exact_when_small(self, spark):
        rows = ([("a", i) for i in range(30)]
                + [("b", i) for i in range(20, 50)]
                + [("c", i) for i in range(100, 110)])
        df = spark.createDataFrame(rows, "seg string, key int")
        out = {(r["segment_a"], r["segment_b"]): r for r in
               kmv_pairwise_overlap(df, "seg", ["key"], k=256)
               .collect()}
        assert len(out) == 3
        ab = out[("a", "b")]
        # a ∪ b = {0..49} (50), a ∩ b = {20..29} (10) -> J = 0.2
        assert ab["k_union"] == 50 and ab["matches"] == 10
        assert abs(ab["jaccard_est"] - 0.2) < 1e-12
        assert ab["union_est"] == 50.0
        assert abs(ab["intersection_est"] - 10.0) < 1e-9
        ac = out[("a", "c")]
        assert ac["matches"] == 0 and ac["jaccard_est"] == 0.0

    def test_validations(self, spark):
        df = spark.createDataFrame([("a", 1)], "seg string, key int")
        with pytest.raises(ValueError):
            kmv_distinct(df, "seg", ["key"], k=1)
        with pytest.raises(ValueError):
            kmv_distinct(df, "seg", [], k=16)


class TestOLS:
    def test_matches_numpy_lstsq(self, spark):
        from whylogs_spark.ops.glm import (fit_ols, ols_report,
                                           ols_score_col)
        n = 300
        x = RNG.normal(0, 1, (n, 2))
        y = 3.0 + 1.5 * x[:, 0] - 2.0 * x[:, 1] + RNG.normal(0, 0.5, n)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for (a, b), c in zip(x, y)],
            "x1 double, x2 double, y double")
        m = fit_ols(df, "y", ["x1", "x2"])
        xb = np.hstack([np.ones((n, 1)), x])
        beta, res, _, _ = np.linalg.lstsq(xb, y, rcond=None)
        assert abs(m["intercept"] - beta[0]) < 1e-9
        assert abs(m["coef"]["x1"] - beta[1]) < 1e-9
        assert abs(m["coef"]["x2"] - beta[2]) < 1e-9
        rss = float(((y - xb @ beta) ** 2).sum())
        sigma2 = rss / (n - 3)
        cov = sigma2 * np.linalg.inv(xb.T @ xb)
        ses = np.sqrt(np.diag(cov))
        assert abs(m["se"]["intercept"] - ses[0]) < 1e-9
        assert abs(m["se"]["x2"] - ses[2]) < 1e-9
        tss = float(((y - y.mean()) ** 2).sum())
        assert abs(m["r2"] - (1 - rss / tss)) < 1e-10

        rep = {r["term"]: r for r in
               ols_report(df, "y", ["x1", "x2"]).collect()}
        assert abs(rep["x1"]["beta"] - beta[1]) < 1e-9
        assert abs(rep["x1"]["t_stat"]
                   - beta[1] / ses[1]) < 1e-6
        assert rep["__model__"]["beta"] == float(n)
        # scoring expression = xb @ beta
        got = df.select(ols_score_col(m).alias("p")) \
            .agg({"p": "avg"}).collect()[0][0]
        assert abs(got - float((xb @ beta).mean())) < 1e-9

    def test_validations(self, spark):
        from whylogs_spark.ops.glm import fit_ols
        df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        with pytest.raises(ValueError):
            fit_ols(df, "y", [])
        with pytest.raises(ValueError):
            fit_ols(df, "y", ["x"])  # n <= terms
