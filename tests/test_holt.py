"""Holt linear/damped trend forecast vs a sequential numpy reference."""

import numpy as np
import pytest

from whylogs_spark.ops.forecast import holt_forecast

RNG = np.random.RandomState(7)


def _holt_ref(xs, a, b, p):
    l, t = xs[1], xs[1] - xs[0]
    e = None
    for x in xs[2:]:
        e = x - (l + p * t)
        l_new = a * x + (1 - a) * (l + p * t)
        t = b * (l_new - l) + (1 - b) * p * t
        l = l_new
    return l, t, e


def _fc(l, t, p, h):
    s = sum(p ** i for i in range(1, h + 1))
    return l + s * t


class TestHolt:
    def test_matches_sequential_reference(self, spark):
        series = {
            "up": (10.0 + 2.0 * np.arange(40)
                   + RNG.normal(0, 0.5, 40)),
            "down": (100.0 - 1.5 * np.arange(25)
                     + RNG.normal(0, 0.3, 25)),
            "flat": 5.0 + RNG.normal(0, 0.1, 12),
        }
        rows = [(g, int(i), float(v))
                for g, xs in series.items() for i, v in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, v double")
        for phi in (1.0, 0.8):
            got = {r["g"]: r for r in holt_forecast(
                df, "t", "v", ["g"], alpha=0.4, beta=0.2, phi=phi,
                horizon=3).collect()}
            for g, xs in series.items():
                l, t, e = _holt_ref(list(xs), 0.4, 0.2, phi)
                r = got[g]
                assert r["n"] == len(xs)
                assert r["level"] == pytest.approx(l, rel=1e-12), (g, phi)
                assert r["trend"] == pytest.approx(t, rel=1e-12), (g, phi)
                assert r["one_step_error"] == pytest.approx(
                    e, rel=1e-9), (g, phi)
                for h in (1, 2, 3):
                    assert r[f"fc_{h}"] == pytest.approx(
                        _fc(l, t, phi, h), rel=1e-12), (g, phi, h)

    def test_recovers_linear_trend(self, spark):
        xs = [3.0 + 2.0 * i for i in range(30)]
        df = spark.createDataFrame(
            [("g", i, x) for i, x in enumerate(xs)],
            "g string, t int, v double")
        r = holt_forecast(df, "t", "v", ["g"], alpha=0.5,
                          beta=0.3).collect()[0]
        # a perfectly linear series is tracked exactly: trend=2, e=0
        assert r["trend"] == pytest.approx(2.0, abs=1e-9)
        assert r["one_step_error"] == pytest.approx(0.0, abs=1e-9)
        assert r["fc_1"] == pytest.approx(xs[-1] + 2.0, abs=1e-8)
        assert r["fc_3"] == pytest.approx(xs[-1] + 6.0, abs=1e-8)

    def test_damping_flattens_horizon(self, spark):
        xs = [float(2 * i) for i in range(20)]
        df = spark.createDataFrame(
            [("g", i, x) for i, x in enumerate(xs)],
            "g string, t int, v double")
        damped = holt_forecast(df, "t", "v", ["g"], phi=0.7,
                               horizon=5).collect()[0]
        linear = holt_forecast(df, "t", "v", ["g"], phi=1.0,
                               horizon=5).collect()[0]
        assert damped["fc_5"] < linear["fc_5"]
        # damped increments shrink: fc_5-fc_4 < fc_2-fc_1
        assert (damped["fc_5"] - damped["fc_4"]) < \
            (damped["fc_2"] - damped["fc_1"])

    def test_short_series(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 4.0), ("a", 2, 7.0), ("b", 1, 9.0)],
            "g string, t int, v double")
        got = {r["g"]: r for r in
               holt_forecast(df, "t", "v", ["g"]).collect()}
        # n=2: level=x2, trend=x2-x1, no error yet
        assert got["a"]["level"] == 7.0
        assert got["a"]["trend"] == 3.0
        assert got["a"]["one_step_error"] is None
        assert got["a"]["fc_1"] == pytest.approx(10.0)
        # n=1: nothing estimable
        assert got["b"]["level"] is None
        assert got["b"]["trend"] is None
        assert got["b"]["fc_1"] is None

    def test_duplicate_ts_collapse_and_guards(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 2.0), ("g", 1, 4.0), ("g", 2, 5.0)],
            "g string, t int, v double")
        r = holt_forecast(df, "t", "v", ["g"]).collect()[0]
        assert r["n"] == 2 and r["level"] == 5.0 and r["trend"] == 2.0
        with pytest.raises(ValueError):
            holt_forecast(df, "t", "v", ["g"], alpha=0.0)
        with pytest.raises(ValueError):
            holt_forecast(df, "t", "v", ["g"], phi=1.5)
        with pytest.raises(ValueError):
            holt_forecast(df, "t", "v", ["g"], horizon=0)
        big = spark.range(30).selectExpr("'g' AS g", "id AS t",
                                         "id * 1.0 AS v")
        with pytest.raises(ValueError, match="max_points"):
            holt_forecast(big, "t", "v", ["g"], max_points=10)
