"""Tests for km_survival (ops.survival) and gini_coefficient /
lorenz_curve (core.summaries) — each checked against an independent
in-test reference implementation."""

import math

import numpy as np
import pytest

from whylogs_spark.core.summaries import gini_coefficient, lorenz_curve
from whylogs_spark.ops.survival import km_survival


# ------------------------------------------------- Kaplan-Meier

def _km_reference(pairs):
    """Textbook KM over (duration, event) pairs."""
    times = sorted({t for t, _ in pairs})
    out = {}
    s = 1.0
    var_sum = 0.0
    dead = False
    for t in times:
        n = sum(1 for d, _ in pairs if d >= t)
        d_t = sum(1 for d, e in pairs if d == t and e)
        c_t = sum(1 for d, e in pairs if d == t and not e)
        if dead or d_t >= n:
            if d_t >= n and not dead:
                s = 0.0
                dead = True
            se = None if dead else s * math.sqrt(var_sum)
            out[t] = (n, d_t, c_t, 0.0 if dead else s, se)
            continue
        s *= 1 - d_t / n
        if d_t > 0:
            var_sum += d_t / (n * (n - d_t))
        out[t] = (n, d_t, c_t, s, s * math.sqrt(var_sum))
    return out


def test_km_matches_reference(spark):
    rng = np.random.RandomState(13)
    pairs = [(float(rng.randint(1, 30)), bool(rng.rand() < 0.7))
             for _ in range(400)]
    df = spark.createDataFrame(pairs, "dur double, ev boolean")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    ref = _km_reference(pairs)
    assert set(out) == set(ref)
    for t, (n, d, c, s, se) in ref.items():
        r = out[t]
        assert (r.n_risk, r.n_events, r.n_censored) == (n, d, c)
        assert r.survival == pytest.approx(s, abs=1e-12)
        if se is None:
            assert r.se is None
        else:
            assert r.se == pytest.approx(se, abs=1e-12)


def test_km_total_death_zeroes_curve(spark):
    # everyone dies at t=5: survival 0 from there, se null
    pairs = [(1.0, True), (5.0, True), (5.0, True)]
    df = spark.createDataFrame(pairs, "dur double, ev boolean")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    assert out[1.0].survival == pytest.approx(2 / 3)
    assert out[5.0].survival == 0.0 and out[5.0].se is None


def test_km_censoring_and_nulls(spark):
    # censored-only times keep the curve flat
    pairs = [(1.0, True), (2.0, False), (3.0, True), (None, True)]
    df = spark.createDataFrame(pairs, "dur double, ev boolean")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    assert set(out) == {1.0, 2.0, 3.0}
    assert out[2.0].survival == out[1.0].survival  # flat at censor
    # t=3: n_risk 1 after the censor at 2 left
    assert out[3.0].n_risk == 1 and out[3.0].survival == 0.0


# ---------------------------------------------------------- Gini

def _gini_brute(vals):
    n = len(vals)
    mu = sum(vals) / n
    return sum(abs(a - b) for a in vals for b in vals) / (2 * n * n * mu)


def test_gini_matches_brute_force(spark):
    rng = np.random.RandomState(2)
    vals = [float(v) for v in rng.lognormal(0, 1.2, size=150)]
    vals += [vals[0]] * 5  # ties
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = gini_coefficient(df, "x").collect()[0]
    assert r.n == len(vals)
    assert r.gini == pytest.approx(_gini_brute(vals), abs=1e-10)
    assert r.mean == pytest.approx(np.mean(vals))


def test_gini_edges(spark):
    # perfectly even -> 0
    even = spark.createDataFrame([(5.0,)] * 10, "x double")
    assert gini_coefficient(even, "x").collect()[0].gini == \
        pytest.approx(0.0, abs=1e-12)
    # negative values -> null (undefined)
    neg = spark.createDataFrame([(-1.0,), (3.0,)], "x double")
    assert gini_coefficient(neg, "x").collect()[0].gini is None
    # all zero -> null
    z = spark.createDataFrame([(0.0,), (0.0,)], "x double")
    assert gini_coefficient(z, "x").collect()[0].gini is None


def test_lorenz_curve_shares(spark):
    # 4 rows: values 1,1,1,7 -> bottom 75% hold 30% of the mass
    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,), (7.0,)],
                               "x double")
    out = {r.bucket: r for r in lorenz_curve(df, "x",
                                             n_points=4).collect()}
    assert out[3].pop_share == pytest.approx(0.75)
    assert out[3].value_share == pytest.approx(0.3)
    assert out[4].pop_share == pytest.approx(1.0)
    assert out[4].value_share == pytest.approx(1.0)
    with pytest.raises(ValueError, match="n_points"):
        lorenz_curve(df, "x", n_points=0)


def test_lorenz_curve_all_zero_nulls_value_share(spark):
    """A non-empty all-zero column has total mass 0: value_share must
    be null (matching gini_coefficient's degenerate case), not NaN."""
    z = spark.createDataFrame([(0.0,)] * 4, "x double")
    rows = lorenz_curve(z, "x", n_points=2).collect()
    assert rows  # pop_share still well-defined
    assert all(r.value_share is None for r in rows)
    assert rows[-1].pop_share == pytest.approx(1.0)


# ------------------------------------------------- log-rank test

def _logrank_ref(rows, arm_a):
    """Pure-python log-rank reference: rows = (dur, event, arm)."""
    times = sorted({t for t, e, _ in rows if e})
    oa = ea = sv = 0.0
    for t in times:
        na = sum(1 for d, _, g in rows if d >= t and g == arm_a)
        nb = sum(1 for d, _, g in rows if d >= t and g != arm_a)
        n = na + nb
        d = sum(1 for dd, e, _ in rows if dd == t and e)
        da = sum(1 for dd, e, g in rows if dd == t and e and g == arm_a)
        oa += da
        ea += d * na / n
        if n > 1:
            sv += d * (na / n) * (1 - na / n) * (n - d) / (n - 1)
    return oa, ea, (oa - ea) ** 2 / sv if sv > 0 else None


def test_logrank_matches_reference_with_censoring_and_ties(spark):
    from whylogs_spark.ops.survival import logrank_test

    rng = np.random.RandomState(19)
    rows = []
    for _ in range(120):   # arm a: faster events
        rows.append((float(rng.randint(1, 30)), rng.rand() < 0.8, "a"))
    for _ in range(130):   # arm b: slower
        rows.append((float(rng.randint(10, 60)), rng.rand() < 0.6, "b"))
    rows.append((5.0, True, "other"))     # excluded arm
    df = spark.createDataFrame(
        [(d, bool(e), g) for d, e, g in rows],
        "dur double, ev boolean, arm string")
    r = logrank_test(df, "dur", "ev", "arm", "a", "b").collect()[0]
    kept = [(d, e, g) for d, e, g in rows if g in ("a", "b")]
    oa, ea, chi2 = _logrank_ref(kept, "a")
    assert (r.n_a, r.n_b) == (120, 130)
    assert r.events_a == sum(1 for d, e, g in kept
                             if e and g == "a")
    assert r.observed_a == pytest.approx(oa)
    assert r.expected_a == pytest.approx(ea, abs=1e-9)
    assert r.chi2 == pytest.approx(chi2, abs=1e-9)
    # the planted separation is decisively significant
    from whylogs_spark.core.drift import chi2_sf
    assert chi2_sf(r.chi2, r.dof) < 1e-6


def test_logrank_identical_arms_and_degenerate(spark):
    from whylogs_spark.ops.survival import logrank_test

    # identical survival in both arms: chi2 ~ 0
    rows = [(float(t), True, g) for t in range(1, 40)
            for g in ("a", "b")]
    df = spark.createDataFrame(rows, "dur double, ev boolean, arm string")
    r = logrank_test(df, "dur", "ev", "arm", "a", "b").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-12)
    # all events tie at one time: every variance term 0 -> null chi2
    z = spark.createDataFrame(
        [(1.0, True, "a"), (1.0, True, "b")],
        "dur double, ev boolean, arm string")
    rz = logrank_test(z, "dur", "ev", "arm", "a", "b").collect()[0]
    assert rz.chi2 is None and rz.observed_a == 1.0
