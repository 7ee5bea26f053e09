"""Round-11 batch 9: JS divergence + ZCA whitening vs numpy."""

import numpy as np
import pytest

from whylogs_spark.core.drift import js_divergence
from whylogs_spark.core.embeddings import zca_project, zca_whitening_fit

RNG = np.random.RandomState(67)


def _ref_js(a, b):
    cats = sorted(set(a) | set(b))
    p = np.array([a.count(c) for c in cats], float) / len(a)
    q = np.array([b.count(c) for c in cats], float) / len(b)
    m = (p + q) / 2
    js = 0.0
    for pi, qi, mi in zip(p, q, m):
        if pi > 0:
            js += 0.5 * pi * np.log(pi / mi)
        if qi > 0:
            js += 0.5 * qi * np.log(qi / mi)
    return js


class TestJSDivergence:
    def test_matches_numpy(self, spark):
        a = [RNG.choice(list("abcd"), p=[.4, .3, .2, .1])
             for _ in range(400)]
        b = [RNG.choice(list("bcde"), p=[.1, .2, .3, .4])
             for _ in range(300)]
        dfa = spark.createDataFrame([(x,) for x in a], "c string")
        dfb = spark.createDataFrame([(x,) for x in b], "c string")
        row = js_divergence(dfa, dfb, "c").collect()[0]
        want = _ref_js(a, b)
        assert row["n_target"] == 400 and row["n_reference"] == 300
        assert abs(row["statistic"] - want) < 1e-12
        assert abs(row["js_distance"] - np.sqrt(want)) < 1e-12
        assert row["algorithm"] == "js" and row["col_name"] == "c"

    def test_identical_zero_and_disjoint_ln2(self, spark):
        a = spark.createDataFrame([("x",)] * 50, "c string")
        b = spark.createDataFrame([("x",)] * 80, "c string")
        assert abs(js_divergence(a, b, "c").collect()[0]["statistic"]
                   ) < 1e-15
        c = spark.createDataFrame([("y",)] * 30, "c string")
        row = js_divergence(a, c, "c").collect()[0]
        assert abs(row["statistic"] - np.log(2)) < 1e-12


class TestZCA:
    def test_whitened_covariance_is_identity(self, spark):
        n, d = 500, 5
        chol = np.linalg.cholesky(
            np.eye(d) * 0.5 + 0.5)  # correlated covariance
        x = RNG.normal(0, 1, (n, d)) @ chol.T + [1, -2, 0, 3, 5]
        df = spark.createDataFrame([(row.tolist(),) for row in x],
                                   "embedding array<double>")
        m = zca_whitening_fit(df, eps=1e-9)
        assert m["n"] == n
        out = zca_project(df, m).collect()
        w = np.array([r["whitened"] for r in out])
        cov = np.cov(w.T)
        assert np.abs(cov - np.eye(d)).max() < 0.05
        assert np.abs(w.mean(axis=0)).max() < 1e-9
        # ZCA whitener is symmetric (the property PCA whitening lacks)
        wm = np.array(m["whitener"])
        assert np.abs(wm - wm.T).max() < 1e-9

    def test_matches_numpy_whitener(self, spark):
        n, d = 300, 4
        x = RNG.normal(0, 2, (n, d))
        df = spark.createDataFrame([(row.tolist(),) for row in x],
                                   "embedding array<double>")
        m = zca_whitening_fit(df, eps=1e-6)
        cov = np.cov(x.T)
        vals, vecs = np.linalg.eigh(cov)
        want = vecs @ np.diag(1 / np.sqrt(vals + 1e-6)) @ vecs.T
        assert np.abs(np.array(m["whitener"]) - want).max() < 1e-9
