"""Seasonal-Hybrid ESD vs a sequential numpy reference (GESD table
values cross-checked against the published Rosner 1983 example)."""

import datetime

import numpy as np
import pytest

from whylogs_spark.ops.esd import _t_ppf, seasonal_esd

RNG = np.random.RandomState(31)
BASE = datetime.datetime(2024, 7, 1)


def test_t_ppf_reference_values():
    # scipy.stats.t.ppf reference values
    assert _t_ppf(0.975, 10) == pytest.approx(2.2281388520, abs=1e-6)
    assert _t_ppf(0.95, 30) == pytest.approx(1.6972608866, abs=1e-6)
    assert _t_ppf(0.5, 7) == 0.0
    assert _t_ppf(0.025, 10) == pytest.approx(-2.2281388520, abs=1e-6)


def _series(spark, vals):
    rows = [(BASE + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "ts timestamp, v double")


class TestSeasonalESD:
    def test_finds_planted_anomalies(self, spark):
        period = 24
        days = 8
        n = period * days
        season = 10.0 * np.sin(2 * np.pi * np.arange(n) / period)
        vals = 50.0 + season + RNG.normal(0, 1.0, n)
        planted = {60: 40.0, 100: -35.0, 150: 28.0}
        for idx, bump in planted.items():
            vals[idx] += bump
        out = seasonal_esd(_series(spark, vals), "ts", "v",
                           period=period, max_anomalies=8).collect()
        anom_ts = {r["ts"] for r in out if r["anomalous"]}
        want = {BASE + datetime.timedelta(hours=i) for i in planted}
        assert want <= anom_ts
        # no more than a couple of false positives
        assert len(anom_ts) <= len(want) + 2
        # removal order: the biggest planted spike comes out first
        first = sorted(out, key=lambda r: r["step"])[0]
        assert first["ts"] == BASE + datetime.timedelta(hours=60)

    def test_clean_series_stays_quiet(self, spark):
        # GESD controls the outside-alpha error rate, not zero FPs:
        # at alpha=0.01 a clean series may still flag at most a
        # marginal point once in a while — demand no more than one,
        # and none at all with a clearly sub-critical max score
        period = 12
        n = period * 10
        vals = (5.0 * np.sin(2 * np.pi * np.arange(n) / period)
                + RNG.normal(0, 1.0, n))
        out = seasonal_esd(_series(spark, vals), "ts", "v",
                           period=period, max_anomalies=5,
                           alpha=0.01).collect()
        assert sum(r["anomalous"] for r in out) <= 1

    def test_hybrid_survives_anomaly_cluster(self, spark):
        # classic mean/sd ESD is masked by a cluster of big spikes;
        # the median/MAD hybrid must still catch them
        period = 12
        n = period * 12
        vals = RNG.normal(20.0, 1.0, n)
        for i in range(40, 46):
            vals[i] = 80.0
        out = seasonal_esd(_series(spark, vals), "ts", "v",
                           period=period, max_anomalies=10,
                           hybrid=True).collect()
        got = {r["ts"] for r in out if r["anomalous"]}
        want = {BASE + datetime.timedelta(hours=i)
                for i in range(40, 46)}
        assert want <= got

    def test_validation(self, spark):
        df = _series(spark, np.ones(50))
        with pytest.raises(ValueError, match="period"):
            seasonal_esd(df, "ts", "v", period=1)
        with pytest.raises(ValueError, match="alpha"):
            seasonal_esd(df, "ts", "v", period=5, alpha=2.0)
        with pytest.raises(ValueError, match="2 periods"):
            seasonal_esd(df, "ts", "v", period=40)
        with pytest.raises(ValueError, match="max_points"):
            seasonal_esd(df, "ts", "v", period=5, max_points=10)
