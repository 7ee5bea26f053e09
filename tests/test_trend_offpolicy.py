import math

import numpy as np
import pytest

from whylogs_spark.ops.abtest import msprt_scan
from whylogs_spark.ops.offpolicy import offpolicy_value
from whylogs_spark.ops.trend import mann_kendall, with_trend_pvalues


def _ref_mk(ts, vs):
    """Independent Mann-Kendall + Theil-Sen reference."""
    n = len(ts)
    order = np.argsort(ts)
    t = np.asarray(ts, dtype=float)[order]
    v = np.asarray(vs, dtype=float)[order]
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(v[j] - v[i]))
            slopes.append((v[j] - v[i]) / (t[j] - t[i]))
    _, counts = np.unique(v, return_counts=True)
    ties = sum(c * (c - 1) * (2 * c + 5) for c in counts)
    var_s = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    sen = _median(slopes)
    if var_s > 0:
        z = ((s - 1) / math.sqrt(var_s) if s > 0
             else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    else:
        z = None
    inter = _median(list(v - sen * t))
    return s, var_s, z, sen, inter


def _median(xs):
    """Linear-interpolation median matching percentile(x, 0.5)."""
    xs = sorted(xs)
    n = len(xs)
    if n % 2:
        return xs[n // 2]
    return (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def test_mann_kendall_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    series = {}
    for grp, drift in (("up", 0.4), ("down", -0.3), ("flat", 0.0)):
        ts = list(range(30))
        vs = [drift * t + float(rng.randn()) for t in ts]
        series[grp] = (ts, vs)
        rows += [(grp, float(t), v) for t, v in zip(ts, vs)]
    # duplicate timestamps average before the walk
    rows.append(("up", 0.0, series["up"][1][0]))
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {r.g: r for r in
           mann_kendall(df, "t", "v", ["g"]).collect()}
    for grp, (ts, vs) in series.items():
        s, var_s, z, sen, inter = _ref_mk(ts, vs)
        r = got[grp]
        assert r.n == 30
        assert r.s_stat == s
        assert r.var_s == pytest.approx(var_s, abs=1e-9)
        assert r.z == pytest.approx(z, abs=1e-12)
        assert r.sen_slope == pytest.approx(sen, abs=1e-12)
        assert r.sen_intercept == pytest.approx(inter, abs=1e-12)
    assert got["up"].z > 2 and got["down"].z < -2
    # p-values attach; the planted trends are significant
    ps = {r.g: r.p_value for r in with_trend_pvalues(
        mann_kendall(df, "t", "v", ["g"])).collect()}
    assert ps["up"] < 0.01 and ps["down"] < 0.01 and ps["flat"] > 0.05


def test_mann_kendall_constant_and_global(spark):
    df = spark.createDataFrame(
        [(float(t), 5.0) for t in range(10)], "t double, v double")
    r = mann_kendall(df, "t", "v").collect()[0]
    assert r.s_stat == 0 and r.var_s == 0.0 and r.z is None
    assert r.sen_slope == 0.0


def test_msprt_matches_numpy(spark):
    rng = np.random.RandomState(11)
    rows = []
    for day in range(8):
        for _ in range(40):
            rows.append((f"2024-01-{day+1:02d} 03:00:00", "c",
                         float(rng.randn())))
            rows.append((f"2024-01-{day+1:02d} 09:00:00", "t",
                         float(rng.randn()) + 0.6))
    df = spark.createDataFrame(rows, "ts string, arm string, v double") \
        .selectExpr("cast(ts as timestamp) ts", "arm", "v")
    out = msprt_scan(df, "ts", "arm", "v", "c", "t", tau2=0.5,
                     grain="day")
    got = sorted(out.collect(), key=lambda r: r.bucket)
    assert len(got) == 8
    # numpy replay
    by_day = {}
    for ts, arm, v in rows:
        by_day.setdefault(ts[:10], []).append((arm, v))
    cum_c, cum_t = [], []
    for i, day in enumerate(sorted(by_day)):
        for arm, v in by_day[day]:
            (cum_c if arm == "c" else cum_t).append(v)
        nc, nt = len(cum_c), len(cum_t)
        mc, mt = np.mean(cum_c), np.mean(cum_t)
        ss = (np.sum((np.array(cum_c) - mc) ** 2)
              + np.sum((np.array(cum_t) - mt) ** 2))
        pooled = ss / (nc + nt - 2)
        vt = pooled * (1 / nc + 1 / nt)
        d = mt - mc
        lam = math.sqrt(vt / (vt + 0.5)) * math.exp(
            d * d * 0.5 / (2 * vt * (vt + 0.5)))
        r = got[i]
        assert (r.n_c, r.n_t) == (nc, nt)
        assert r.diff == pytest.approx(d, abs=1e-12)
        assert r.v_t == pytest.approx(vt, rel=1e-12)
        assert r["lambda"] == pytest.approx(lam, rel=1e-9)
        assert r.p_always_valid == pytest.approx(
            min(1.0, 1.0 / lam), rel=1e-9)
    # a 0.6-sigma lift should be detected well before day 8
    assert got[-1].p_always_valid < 0.01
    with pytest.raises(ValueError, match="tau2"):
        msprt_scan(df, "ts", "arm", "v", "c", "t", tau2=0.0)


def test_offpolicy_matches_numpy(spark):
    rng = np.random.RandomState(3)
    actions = ["a", "b", "c"]
    behavior = {"a": 0.5, "b": 0.3, "c": 0.2}
    target = {"a": 0.2, "b": 0.2, "c": 0.6}
    true_mean = {"a": 0.2, "b": 0.5, "c": 0.8}
    rows = []
    for _ in range(3000):
        act = rng.choice(actions, p=[behavior[x] for x in actions])
        rew = float(rng.rand() < true_mean[act])
        rows.append((act, rew, behavior[act]))
    df = spark.createDataFrame(rows, "a string, r double, p double")
    out = offpolicy_value(df, "a", "r", "p", target_policy=target,
                          clip=3.0).collect()[0]

    # numpy replay
    arr = rows
    w = np.array([target[a] / p for a, _, p in arr])
    r = np.array([x[1] for x in arr])
    qhat = {a: np.mean([x[1] for x in arr if x[0] == a])
            for a in actions}
    q = np.array([qhat[a] for a, _, _ in arr])
    direct = sum(target[a] * qhat[a] for a in actions)
    assert out.n == 3000
    assert out.behavior_value == pytest.approx(r.mean(), abs=1e-12)
    assert out.ips == pytest.approx((w * r).mean(), abs=1e-12)
    assert out.ips_clipped == pytest.approx(
        (np.minimum(w, 3.0) * r).mean(), abs=1e-12)
    assert out.snips == pytest.approx((w * r).sum() / w.sum(),
                                      abs=1e-12)
    assert out.ess == pytest.approx(w.sum() ** 2 / (w * w).sum(),
                                    rel=1e-12)
    assert out.direct == pytest.approx(direct, abs=1e-12)
    assert out.dr == pytest.approx(direct + (w * (r - q)).mean(),
                                   abs=1e-12)
    # sanity: the target policy favors the best arm, so every
    # estimator should beat the behavior value
    truth = sum(target[a] * true_mean[a] for a in actions)
    for est in (out.ips, out.snips, out.dr):
        assert abs(est - truth) < 0.1
        assert est > out.behavior_value


def test_offpolicy_validation_and_prob_col(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 0.5, 0.9), ("b", 0.0, 0.5, 0.1),
         ("a", 1.0, 0.5, 0.9), ("x", 1.0, 0.0, 0.5)],
        "a string, r double, p double, pi double")
    with pytest.raises(ValueError, match="exactly one"):
        offpolicy_value(df, "a", "r", "p")
    with pytest.raises(ValueError, match="exactly one"):
        offpolicy_value(df, "a", "r", "p", target_policy={"a": 1.0},
                        target_prob_col="pi")
    # propensity <= 0 rows drop; column-form pi works
    out = offpolicy_value(df, "a", "r", "p",
                          target_prob_col="pi").collect()[0]
    assert out.n == 3
    w = [0.9 / 0.5, 0.1 / 0.5, 0.9 / 0.5]
    r = [1.0, 0.0, 1.0]
    assert out.ips == pytest.approx(
        sum(wi * ri for wi, ri in zip(w, r)) / 3, abs=1e-12)
    # unseen action under dict policy -> weight 0
    out2 = offpolicy_value(df, "a", "r", "p",
                           target_policy={"b": 1.0}).collect()[0]
    assert out2.ips == 0.0
