"""Round-11 batch 6: Fellegi-Sunter EM, Procrustes alignment,
binary segmentation, Platt scaling — vs numpy references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.core.embeddings import (procrustes_align,
                                           procrustes_project)
from whylogs_spark.core.model_perf import platt_scaling, platt_score_col
from whylogs_spark.ops.linkage import (fellegi_sunter,
                                       fellegi_sunter_report)
from whylogs_spark.ops.trend import binary_segmentation

RNG = np.random.RandomState(53)


def _ref_fs_em(gamma, cnt, iters=100, prior=0.1):
    """Independent numpy EM on the pattern table."""
    k = gamma.shape[1]
    p, m, u = prior, np.full(k, 0.9), np.full(k, 0.1)
    eps = 1e-12
    for _ in range(iters):
        lm = (gamma * np.log(m) + (1 - gamma) * np.log(1 - m)).sum(1)
        lu = (gamma * np.log(u) + (1 - gamma) * np.log(1 - u)).sum(1)
        a, b = p * np.exp(lm), (1 - p) * np.exp(lu)
        r = a / np.clip(a + b, eps, None)
        w, wn = cnt * r, cnt * (1 - r)
        p = w.sum() / cnt.sum()
        m = np.clip((w @ gamma) / w.sum(), eps, 1 - eps)
        u = np.clip((wn @ gamma) / wn.sum(), eps, 1 - eps)
    return p, m, u


class TestFellegiSunter:
    def _sim_pairs(self, n=6000, p_match=0.2,
                   m=(0.95, 0.9, 0.8), u=(0.2, 0.1, 0.05)):
        is_m = RNG.uniform(size=n) < p_match
        cols = []
        for mi, ui in zip(m, u):
            pr = np.where(is_m, mi, ui)
            cols.append((RNG.uniform(size=n) < pr).astype(int))
        return np.column_stack(cols)

    def test_em_recovers_parameters(self, spark):
        g = self._sim_pairs()
        df = spark.createDataFrame(
            [tuple(int(x) for x in row) for row in g],
            "name_eq int, city_eq int, phone_eq int")
        model = fellegi_sunter(df, ["name_eq", "city_eq", "phone_eq"])
        assert model["n_pairs"] == len(g)
        assert abs(model["p_match"] - 0.2) < 0.06
        assert abs(model["m"]["name_eq"] - 0.95) < 0.08
        assert abs(model["u"]["phone_eq"] - 0.05) < 0.05
        # exact agreement with the independent EM on the same table
        pats, idx, cnt = np.unique(g, axis=0, return_inverse=True,
                                   return_counts=True)
        p, m, u = _ref_fs_em(pats.astype(float), cnt.astype(float))
        # same fixed point; stopping rules differ slightly -> 1e-4
        assert abs(model["p_match"] - p) < 1e-4
        for i, c in enumerate(["name_eq", "city_eq", "phone_eq"]):
            assert abs(model["m"][c] - m[i]) < 1e-4
            assert abs(model["u"][c] - u[i]) < 1e-4

    def test_report_weights_ordered(self, spark):
        g = self._sim_pairs(n=4000)
        df = spark.createDataFrame(
            [tuple(int(x) for x in row) for row in g],
            "a int, b int, c int")
        rep = {r["pattern"]: r for r in
               fellegi_sunter_report(df, ["a", "b", "c"]).collect()}
        assert sum(r["n_pairs"] for r in rep.values()) == 4000
        # all-agree must outweigh all-disagree
        assert rep["111"]["match_weight"] > rep["000"]["match_weight"]
        assert rep["111"]["posterior"] > rep["000"]["posterior"]

    def test_validations(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        with pytest.raises(ValueError):
            fellegi_sunter(df, [])
        with pytest.raises(ValueError):
            fellegi_sunter(df, [f"c{i}" for i in range(17)])


class TestProcrustes:
    def test_recovers_known_rotation(self, spark):
        d, n = 6, 300
        theta = 0.7
        rot = np.eye(d)
        rot[0, 0] = rot[1, 1] = np.cos(theta)
        rot[0, 1], rot[1, 0] = -np.sin(theta), np.sin(theta)
        a = RNG.normal(0, 1, (n, d))
        b = a @ rot.T + RNG.normal(0, 0.01, (n, d))
        df = spark.createDataFrame(
            [(row_a.tolist(), row_b.tolist()) for row_a, row_b
             in zip(a, b)],
            "va array<double>, vb array<double>")
        m = procrustes_align(df, "va", "vb")
        got = np.array(m["rotation"])
        assert m["n"] == n
        assert np.abs(got - rot).max() < 0.02
        # rotation is orthogonal
        assert np.abs(got @ got.T - np.eye(d)).max() < 1e-9
        assert m["disparity"] < 0.001
        # projection applies R to va
        out = procrustes_project(df, m, "va").collect()
        first = np.array(out[0]["aligned"])
        want = got @ a[0]
        assert np.abs(first - want).max() < 1e-9

    def test_matches_scipy_style_reference(self, spark):
        d, n = 4, 200
        a = RNG.normal(0, 1, (n, d))
        b = RNG.normal(0, 1, (n, d))
        df = spark.createDataFrame(
            [(x.tolist(), y.tolist()) for x, y in zip(a, b)],
            "va array<double>, vb array<double>")
        m = procrustes_align(df, "va", "vb")
        uu, sv, vt = np.linalg.svd(b.T @ a)
        want_rot = uu @ vt
        assert np.abs(np.array(m["rotation"]) - want_rot).max() < 1e-9
        resid = ((a @ want_rot.T - b) ** 2).sum()
        assert abs(m["residual"] - resid) < 1e-6


class TestBinarySegmentation:
    def test_finds_two_shifts_in_order(self, spark):
        # three regimes: mean 0 (t<40), 5 (40..79), -3 (>=80)
        vals = np.concatenate([RNG.normal(0, 0.5, 40),
                               RNG.normal(5, 0.5, 40),
                               RNG.normal(-3, 0.5, 40)])
        df = spark.createDataFrame(
            [(float(i), float(v)) for i, v in enumerate(vals)],
            "t double, v double")
        out = binary_segmentation(df, "t", "v",
                                  max_changepoints=3).collect()
        cps = sorted(r["cp_time"] for r in out)
        assert len(out) >= 2
        assert any(abs(c - 39) <= 2 for c in cps)
        assert any(abs(c - 79) <= 2 for c in cps)
        # strongest shift found first
        assert out[0]["order_found"] == 1
        assert all(r["p_value"] <= 0.05 for r in out)

    def test_flat_series_finds_nothing(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(RNG.normal(0, 1))) for i in range(60)],
            "t double, v double")
        out = binary_segmentation(df, "t", "v", alpha=0.001).collect()
        assert len(out) == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(0.0, 1.0)], "t double, v double")
        with pytest.raises(ValueError):
            binary_segmentation(df, "t", "v", max_changepoints=0)


class TestPlatt:
    def test_matches_logistic_on_score(self, spark):
        n = 800
        s = RNG.uniform(-2, 2, n)
        y = (RNG.uniform(size=n) < 1 / (1 + np.exp(-(1.7 * s - 0.3)))
             ).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(s, y)],
            "score double, y double")
        m = platt_scaling(df, "score", "y")
        assert m["converged"] and m["n"] == n
        assert abs(m["a"] - 1.7) < 0.4
        assert abs(m["b"] + 0.3) < 0.3
        cal = df.select(
            platt_score_col(m, "score").alias("p")).agg(
            {"p": "avg"}).collect()[0][0]
        assert abs(cal - y.mean()) < 0.02  # calibrated mean ≈ base rate
