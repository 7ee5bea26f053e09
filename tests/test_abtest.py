"""Tests for ops.abtest (Welch t + exact Mann-Whitney U) and the
Student-t / normal survival functions behind its p-values."""

import math

import numpy as np
import pandas as pd
import pytest

from whylogs_spark.core.drift import normal_sf, student_t_sf
from whylogs_spark.ops.abtest import ab_test_report, with_ab_pvalues


def _reference(c, t):
    """numpy/pandas reference for one segment (scipy-free)."""
    c, t = np.asarray(c, float), np.asarray(t, float)
    nc, nt = len(c), len(t)
    vc, vt = c.var(ddof=1), t.var(ddof=1)
    se2 = vc / nc + vt / nt
    wt = (t.mean() - c.mean()) / math.sqrt(se2)
    wdf = se2 ** 2 / ((vc / nc) ** 2 / (nc - 1)
                      + (vt / nt) ** 2 / (nt - 1))
    allv = np.concatenate([c, t])
    ranks = pd.Series(allv).rank(method="average").values
    u = ranks[nc:].sum() - nt * (nt + 1) / 2
    n = nc + nt
    _, cnt = np.unique(allv, return_counts=True)
    ties = (cnt.astype(float) ** 3 - cnt).sum()
    s2 = nc * nt / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - nc * nt / 2) / math.sqrt(s2)
    return wt, wdf, u, z


def test_ab_report_matches_numpy_reference(spark):
    rng = np.random.RandomState(41)
    rows = []
    data = {}
    for seg in ("a", "b"):
        c = [float(v) for v in np.round(rng.normal(50, 5, 200), 2)]
        t = [float(v) for v in np.round(rng.normal(51, 7, 180), 2)]
        if seg == "a":           # plant heavy ties
            c += [42.0] * 15
            t += [42.0] * 9
        data[seg] = (c, t)
        rows += [(seg, "ctl", v) for v in c]
        rows += [(seg, "trt", v) for v in t]
    df = spark.createDataFrame(rows, "seg string, grp string, m double")
    out = {r.seg: r for r in ab_test_report(
        df, "grp", "m", "ctl", "trt", ["seg"]).collect()}
    for seg, (c, t) in data.items():
        wt, wdf, u, z = _reference(c, t)
        r = out[seg]
        assert (r.n_c, r.n_t) == (len(c), len(t))
        assert r.mean_c == pytest.approx(np.mean(c))
        assert r.mean_t == pytest.approx(np.mean(t))
        assert r.var_c == pytest.approx(np.var(c, ddof=1))
        assert r.welch_t == pytest.approx(wt)
        assert r.welch_df == pytest.approx(wdf)
        assert r.u_stat == pytest.approx(u, abs=1e-9)  # FP-exact
        assert r.mw_z == pytest.approx(z)
        assert r.diff == pytest.approx(np.mean(t) - np.mean(c))
        assert r.lift == pytest.approx(
            (np.mean(t) - np.mean(c)) / np.mean(c))


def test_ab_report_global_and_filters(spark):
    # no segments -> one row; null/NaN metric and other groups excluded
    rows = [("ctl", 1.0), ("ctl", 2.0), ("ctl", 3.0),
            ("trt", 2.0), ("trt", 3.0), ("trt", 4.0),
            ("other", 100.0), ("ctl", None), ("trt", float("nan"))]
    df = spark.createDataFrame(rows, "grp string, m double")
    out = ab_test_report(df, "grp", "m", "ctl", "trt").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_c, r.n_t) == (3, 3)
    wt, wdf, u, z = _reference([1, 2, 3], [2, 3, 4])
    assert r.welch_t == pytest.approx(wt)
    assert r.u_stat == pytest.approx(u)
    with pytest.raises(ValueError, match="must differ"):
        ab_test_report(df, "grp", "m", "ctl", "ctl")


def test_ab_report_degenerate_nulls(spark):
    # all values identical: sigma2_u == 0 and se2 == 0 -> null stats
    rows = [("ctl", 5.0)] * 4 + [("trt", 5.0)] * 4
    df = spark.createDataFrame(rows, "grp string, m double")
    r = ab_test_report(df, "grp", "m", "ctl", "trt").collect()[0]
    assert r.welch_t is None and r.mw_z is None
    assert r.var_c == 0.0 and r.diff == 0.0
    # n=1 sides: variance undefined -> null welch
    one = spark.createDataFrame(
        [("ctl", 1.0), ("trt", 2.0)], "grp string, m double")
    r1 = ab_test_report(one, "grp", "m", "ctl", "trt").collect()[0]
    assert r1.var_c is None and r1.welch_t is None


def test_ab_pvalues(spark):
    rng = np.random.RandomState(3)
    rows = [("ctl", float(v)) for v in rng.normal(0, 1, 150)]
    rows += [("trt", float(v)) for v in rng.normal(0.6, 1, 150)]
    df = spark.createDataFrame(rows, "grp string, m double")
    rep = with_ab_pvalues(
        ab_test_report(df, "grp", "m", "ctl", "trt"))
    r = rep.collect()[0]
    # a 0.6-sigma shift at n=150/150 is decisively significant
    assert r.p_welch < 1e-4 and r.p_mw < 1e-4
    assert 0.0 <= r.p_welch <= 1.0 and 0.0 <= r.p_mw <= 1.0
    # degenerate report rows keep null p-values
    z = spark.createDataFrame(
        [("ctl", 5.0)] * 3 + [("trt", 5.0)] * 3, "grp string, m double")
    rz = with_ab_pvalues(
        ab_test_report(z, "grp", "m", "ctl", "trt")).collect()[0]
    assert rz.p_welch is None and rz.p_mw is None


def test_cuped_reduces_variance_and_preserves_effect(spark):
    from whylogs_spark.ops.abtest import ab_test_report, cuped_adjust

    rng = np.random.RandomState(31)
    rows = []
    for _ in range(400):
        x = float(rng.normal(100, 20))        # pre-period covariate
        eps = float(rng.normal(0, 5))
        rows.append(("ctl", x, x * 0.8 + eps))
        x = float(rng.normal(100, 20))
        eps = float(rng.normal(0, 5))
        rows.append(("trt", x, x * 0.8 + eps + 3.0))  # true effect +3
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    adj = cuped_adjust(df, "y", "x")
    raw = ab_test_report(df, "grp", "y", "ctl", "trt").collect()[0]
    cup = ab_test_report(adj, "grp", "y_cuped",
                         "ctl", "trt").collect()[0]
    # same (unbiased) effect estimate, far less variance, larger |t|
    assert cup.diff == pytest.approx(raw.diff, abs=1.5)
    assert cup.var_c < raw.var_c * 0.25
    assert abs(cup.welch_t) > abs(raw.welch_t) * 2
    # theta estimation: cross-check against the numpy OLS slope
    pdf = pd.DataFrame(rows, columns=["grp", "x", "y"])
    theta = np.cov(pdf.x, pdf.y, ddof=0)[0, 1] / pdf.x.var(ddof=0)
    got = adj.select("y_cuped").toPandas()["y_cuped"].values
    want = pdf.y.values - theta * (pdf.x.values - pdf.x.mean())
    assert np.allclose(np.sort(got), np.sort(want))


def test_cuped_null_covariate_and_degenerate(spark):
    from whylogs_spark.ops.abtest import cuped_adjust

    rows = [("a", 1.0, 10.0), ("a", 2.0, 12.0), ("a", 3.0, 14.0),
            ("a", None, 99.0), ("a", float("nan"), 98.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.y: r.y_cuped for r in cuped_adjust(df, "y", "x").collect()}
    # null/NaN covariate rows keep the raw metric
    assert out[99.0] == 99.0 and out[98.0] == 98.0
    # perfectly linear: adjusted values collapse to the mean
    assert all(abs(out[v] - 12.0) < 1e-9 for v in (10.0, 12.0, 14.0))
    # constant covariate -> no adjustment
    const = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 2.0)], "g string, x double, y double")
    got = {r.y: r.y_cuped for r in
           cuped_adjust(const, "y", "x").collect()}
    assert got == {1.0: 1.0, 2.0: 2.0}


def test_srm_check(spark):
    from whylogs_spark.core.drift import chi2_sf
    from whylogs_spark.ops.abtest import srm_check

    # balanced 500/500 -> tiny chi2; broken 600/400 -> big chi2
    ok = [("c",)] * 500 + [("t",)] * 500
    bad = [("c",)] * 600 + [("t",)] * 400 + [("other",)] * 50
    for rows, broken in [(ok, False), (bad, True)]:
        df = spark.createDataFrame(rows, "grp string")
        r = srm_check(df, "grp", {"c": 0.5, "t": 0.5}).collect()[0]
        assert r.n_total == 1000      # 'other' ignored
        assert r.dof == 1
        p = chi2_sf(r.chi2, r.dof)
        assert (p < 1e-9) == broken
    # expected chi2 for 600/400 at 50/50: (100^2/500)*2 = 40
    df = spark.createDataFrame(bad, "grp string")
    r = srm_check(df, "grp", {"c": 0.5, "t": 0.5}).collect()[0]
    assert r.chi2 == pytest.approx(40.0)
    assert (r.n_c, r.n_t) == (600, 400)
    with pytest.raises(ValueError, match="at least 2"):
        srm_check(df, "grp", {"c": 1.0})
    with pytest.raises(ValueError, match="> 0"):
        srm_check(df, "grp", {"c": 0.5, "t": 0.0})


def test_srm_check_dotted_arm_names_and_collisions(spark):
    from whylogs_spark.ops.abtest import srm_check

    rows = [("variant.a",)] * 300 + [("variant.b",)] * 300
    df = spark.createDataFrame(rows, "grp string")
    r = srm_check(df, "grp",
                  {"variant.a": 0.5, "variant.b": 0.5}).collect()[0]
    assert r["n_variant.a"] == 300 and r["n_variant.b"] == 300
    assert r.chi2 == pytest.approx(0.0)
    with pytest.raises(ValueError, match="collide"):
        srm_check(df, "grp", {1: 0.5, "1": 0.5})


def test_poisson_bootstrap_diff(spark):
    from whylogs_spark.ops.abtest import poisson_bootstrap_diff

    rng = np.random.RandomState(13)
    rows = [(i, "ctl", float(v))
            for i, v in enumerate(rng.normal(10, 2, 400))]
    rows += [(10_000 + i, "trt", float(v))
             for i, v in enumerate(rng.normal(11, 2, 400))]
    df = spark.createDataFrame(rows, "rid long, grp string, m double")
    r = poisson_bootstrap_diff(
        df, "grp", "m", "ctl", "trt", "rid", n_boot=100).collect()[0]
    truth = (np.mean([v for _, g, v in rows if g == "trt"])
             - np.mean([v for _, g, v in rows if g == "ctl"]))
    assert r.diff_obs == pytest.approx(truth)
    assert r.n_boot == 100
    # the CI brackets the observed effect and has sane width
    assert r.ci_lo < r.diff_obs < r.ci_hi
    assert 0.05 < (r.ci_hi - r.ci_lo) < 2.0
    # fully deterministic: a second run is bit-identical
    r2 = poisson_bootstrap_diff(
        df, "grp", "m", "ctl", "trt", "rid", n_boot=100).collect()[0]
    assert (r.ci_lo, r.ci_hi) == (r2.ci_lo, r2.ci_hi)
    # a different seed moves the replicate draws
    r3 = poisson_bootstrap_diff(
        df, "grp", "m", "ctl", "trt", "rid", n_boot=100,
        seed=7).collect()[0]
    assert (r3.ci_lo, r3.ci_hi) != (r.ci_lo, r.ci_hi)
    with pytest.raises(ValueError, match="n_boot"):
        poisson_bootstrap_diff(df, "grp", "m", "ctl", "trt", "rid",
                               n_boot=1)
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_diff(df, "grp", "m", "ctl", "trt", "rid",
                               alpha=1.5)


def test_student_t_sf_against_tables():
    # textbook two-sided critical values: sf(t, df) == alpha/2
    for t, df, tail in [
        (12.706, 1, 0.025), (2.228, 10, 0.025), (1.812, 10, 0.05),
        (2.086, 20, 0.025), (2.845, 20, 0.005), (1.96, 10**7, 0.025),
    ]:
        assert student_t_sf(t, df) == pytest.approx(tail, rel=5e-3)
    # symmetry and edges
    assert student_t_sf(0.0, 5) == pytest.approx(0.5)
    assert student_t_sf(-2.228, 10) == pytest.approx(1 - 0.025,
                                                     rel=5e-3)
    assert math.isnan(student_t_sf(1.0, 0))


def test_normal_sf_matches_erfc():
    for z, tail in [(1.6449, 0.05), (1.9600, 0.025),
                    (2.5758, 0.005), (0.0, 0.5)]:
        assert normal_sf(z) == pytest.approx(tail, rel=1e-3)
    assert normal_sf(-1.96) == pytest.approx(0.975, rel=1e-3)
