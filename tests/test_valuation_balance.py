"""knn_shapley (hand-computed + numpy brute force) and
covariate_balance (numpy moment parity, weighted path)."""

import numpy as np
import pytest

from whylogs_spark.ops.causal import covariate_balance
from whylogs_spark.ops.valuation import knn_shapley


def test_knn_shapley_hand_computed(spark):
    train = spark.createDataFrame(
        [(0, [0.0], 0), (1, [1.0], 0), (2, [2.0], 1)],
        "id long, emb array<double>, y int")
    test = spark.createDataFrame(
        [(100, [0.0], 0)], "id long, emb array<double>, y int")
    out = {r["id"]: r["shapley_value"] for r in knn_shapley(
        train, test, "id", "emb", "y", k=1).collect()}
    # N=3, K=1, ranks (0,1,2) matched flags (1,1,0):
    # s3=0, s2=0+ (1-0)/1 * 1/2 = .5, s1=.5
    assert out[0] == pytest.approx(0.5)
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.0)


def _numpy_knn_shapley(Xtr, ytr, Xte, yte, k):
    n = len(ytr)
    vals = np.zeros(n)
    for q in range(len(yte)):
        d = ((Xtr - Xte[q]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(n), d))  # dist asc, id asc
        m = (ytr[order] == yte[q]).astype(float)
        s = np.zeros(n)
        s[n - 1] = m[n - 1] / n
        for i in range(n - 2, -1, -1):
            s[i] = s[i + 1] + (m[i] - m[i + 1]) / k * min(
                k, i + 1) / (i + 1)
        vals[order] += s
    return vals / len(yte)


def test_knn_shapley_matches_numpy_bruteforce(spark):
    rng = np.random.RandomState(3)
    n, t, dim, k = 40, 5, 4, 3
    Xtr = rng.uniform(size=(n, dim))
    ytr = rng.randint(0, 2, n)
    Xte = rng.uniform(size=(t, dim))
    yte = rng.randint(0, 2, t)
    train = spark.createDataFrame(
        [(i, [float(v) for v in Xtr[i]], int(ytr[i]))
         for i in range(n)],
        "id long, emb array<double>, y int")
    test = spark.createDataFrame(
        [(1000 + i, [float(v) for v in Xte[i]], int(yte[i]))
         for i in range(t)],
        "id long, emb array<double>, y int")
    got = {r["id"]: r["shapley_value"] for r in knn_shapley(
        train, test, "id", "emb", "y", k=k).collect()}
    want = _numpy_knn_shapley(Xtr, ytr, Xte, yte, k)
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-9), i
    # efficiency-style sanity: total value = mean accuracy-ish sum
    assert sum(got.values()) == pytest.approx(want.sum(), abs=1e-9)


def test_knn_shapley_guards(spark):
    df = spark.createDataFrame(
        [(0, [0.0], 0)], "id long, emb array<double>, y int")
    with pytest.raises(ValueError, match="max_test"):
        knn_shapley(df, df, "id", "emb", "y", max_test=0)
    with pytest.raises(ValueError, match="k must"):
        knn_shapley(df, df, "id", "emb", "y", k=0)
    with pytest.raises(ValueError, match="max_train"):
        knn_shapley(df, df, "id", "emb", "y", max_train=0)


def test_covariate_balance_matches_numpy(spark):
    rng = np.random.RandomState(5)
    n = 300
    t = rng.randint(0, 2, n)
    x1 = rng.normal(0, 1, n) + 0.8 * t      # imbalanced
    x2 = rng.normal(5, 2, n)                # balanced
    w = 1.0 + rng.randint(0, 5, n) / 10.0
    df = spark.createDataFrame(
        [(int(a), float(b), float(c), float(d))
         for a, b, c, d in zip(t, x1, x2, w)],
        "t int, x1 double, x2 double, w double")
    out = {r["covariate"]: r for r in covariate_balance(
        df, "t", ["x1", "x2"], weight_col="w").collect()}

    for name, x in (("x1", x1), ("x2", x2)):
        xt, xc = x[t == 1], x[t == 0]
        mt, mc = xt.mean(), xc.mean()
        vt, vc = xt.var(ddof=1), xc.var(ddof=1)
        pooled = np.sqrt((vt + vc) / 2)
        r = out[name]
        assert r["n_t"] == len(xt) and r["n_c"] == len(xc)
        assert r["mean_t"] == pytest.approx(mt)
        assert r["sd_c"] == pytest.approx(np.sqrt(vc))
        assert r["smd"] == pytest.approx((mt - mc) / pooled)
        wt, wc = w[t == 1], w[t == 0]
        wmt = (wt * xt).sum() / wt.sum()
        wmc = (wc * xc).sum() / wc.sum()
        assert r["wmean_t"] == pytest.approx(wmt)
        assert r["wsmd"] == pytest.approx((wmt - wmc) / pooled)
    assert abs(out["x1"]["smd"]) > 0.5 > abs(out["x2"]["smd"])


def test_covariate_balance_unit_weights_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (0, 1.0), (1, 3.0), (0, 2.0)], "t int, x double")
    r = covariate_balance(df, "t", ["x"]).collect()[0]
    assert r["wmean_t"] == pytest.approx(r["mean_t"])
    assert r["wsmd"] == pytest.approx(r["smd"])
    with pytest.raises(ValueError, match="x_cols"):
        covariate_balance(df, "t", [])
    with pytest.raises(ValueError, match="not in df"):
        covariate_balance(df, "t", ["nope"])
