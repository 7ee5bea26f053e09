"""Round-10 sixth-batch survival extensions vs numpy references:
restricted mean survival time and Aalen-Johansen cumulative incidence."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _km(ts, es):
    uniq = np.unique(ts)
    nrisk = np.array([(ts >= u).sum() for u in uniq], float)
    d = np.array([((ts == u) & (es == 1)).sum() for u in uniq], float)
    return uniq, nrisk, d, np.cumprod(1 - d / nrisk)


def _np_rmst(ts, es, tau):
    uniq, _, _, S = _km(ts, es)
    area = min(uniq[0], tau)
    for i, u in enumerate(uniq):
        if u >= tau:
            break
        nxt = uniq[i + 1] if i + 1 < len(uniq) else tau
        area += S[i] * (min(nxt, tau) - u)
    km_tau = S[uniq <= tau][-1] if (uniq <= tau).any() else 1.0
    return area, km_tau


def test_rmst_matches_numpy(events):
    from whylogs_spark.ops.survival import rmst

    d = events.select(
        F.col("value").alias("dur"),
        (F.col("event_type") != "error").cast("int").alias("e"))
    pdf = d.toPandas().dropna(subset=["dur"])
    ts = pdf.dur.to_numpy(float)
    es = pdf.e.to_numpy(int)
    for tau in (10.0, 50.0, 1e9):
        r = rmst(d, "dur", "e", tau=tau).collect()[0]
        area, km_tau = _np_rmst(ts, es, tau)
        assert r.n == len(ts)
        assert r.rmst == pytest.approx(area, abs=1e-6)
        assert r.km_at_tau == pytest.approx(km_tau, abs=1e-9)


def test_rmst_no_events_equals_tau(spark):
    from whylogs_spark.ops.survival import rmst

    # all censored: S stays 1, RMST(tau) == tau
    d = spark.createDataFrame(
        [(float(i), 0) for i in range(1, 30)], "dur double, e int")
    r = rmst(d, "dur", "e", tau=12.0).collect()[0]
    assert r.rmst == pytest.approx(12.0)
    assert r.km_at_tau == pytest.approx(1.0)


def test_rmst_tau_before_first_time(spark):
    from whylogs_spark.ops.survival import rmst

    d = spark.createDataFrame(
        [(10.0, 1), (20.0, 1)], "dur double, e int")
    r = rmst(d, "dur", "e", tau=5.0).collect()[0]
    assert r.rmst == pytest.approx(5.0)  # S = 1 on [0, 5)
    assert r.km_at_tau == pytest.approx(1.0)


def test_cumulative_incidence_matches_numpy(events):
    from whylogs_spark.ops.survival import cumulative_incidence

    d = events.select(
        F.col("value").alias("dur"),
        (F.when(F.col("event_type") == "error", 0)
         .when(F.col("event_type") == "purchase", 1)
         .when(F.col("event_type") == "signup", 2)
         .otherwise(3)).alias("cause"))
    rows = {(r.cause, round(r.t, 6)): r for r in
            cumulative_incidence(d, "dur", "cause").collect()}

    pdf = d.toPandas().dropna(subset=["dur"])
    ts = pdf.dur.to_numpy(float)
    cs = pdf.cause.to_numpy(int)
    order = np.argsort(ts)
    ts, cs = ts[order], cs[order]
    uniq = np.unique(ts)
    nrisk = np.array([(ts >= u).sum() for u in uniq], float)
    dall = np.array([((ts == u) & (cs != 0)).sum() for u in uniq],
                    float)
    s_prev = np.concatenate([[1.0], np.cumprod(1 - dall / nrisk)[:-1]])
    checked = 0
    for k in (1, 2, 3):
        dk = np.array([((ts == u) & (cs == k)).sum() for u in uniq],
                      float)
        cif = np.cumsum(s_prev * dk / nrisk)
        for i, u in enumerate(uniq):
            if dk[i] > 0:
                r = rows[(k, round(u, 6))]
                assert r.cif == pytest.approx(cif[i], abs=1e-12)
                assert r.n_risk == nrisk[i]
                assert r.n_events == dk[i]
                checked += 1
    assert checked > 100


def test_cif_sums_to_one_minus_km(spark):
    """With NO censoring, sum_k CIF_k(t_max) == 1 (everyone fails)."""
    from whylogs_spark.ops.survival import cumulative_incidence

    rows = [(float(i % 37) + 1.0, 1 + i % 3) for i in range(300)]
    d = spark.createDataFrame(rows, "dur double, cause int")
    out = cumulative_incidence(d, "dur", "cause").collect()
    last = {}
    for r in out:
        if r.cause not in last or r.t > last[r.cause][0]:
            last[r.cause] = (r.t, r.cif)
    assert sum(v for _, v in last.values()) == pytest.approx(1.0)


def test_cif_single_cause_equals_one_minus_km(spark):
    """One cause + censoring: CIF_1 == 1 - KM exactly."""
    from whylogs_spark.ops.survival import (cumulative_incidence,
                                            km_survival)

    rows = [(float(1 + i % 23), i % 3 != 0) for i in range(200)]
    d = spark.createDataFrame(rows, "dur double, ev boolean")
    dc = d.select("dur", F.col("ev").cast("int").alias("cause"))
    cif = {round(r.t, 6): r.cif for r in
           cumulative_incidence(dc, "dur", "cause").collect()}
    km = {round(r.t, 6): r.survival for r in
          km_survival(d, "dur", "ev").collect()}
    for t, v in cif.items():
        assert v == pytest.approx(1.0 - km[t], abs=1e-12)
