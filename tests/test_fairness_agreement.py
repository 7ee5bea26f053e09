import numpy as np
import pytest

from whylogs_spark.ops.agreement import cohens_kappa, krippendorff_alpha
from whylogs_spark.ops.fairness import fairness_report


def _ref_kappa(a, b, weights=None):
    """Independent numpy reference for (weighted) Cohen's kappa."""
    a = np.asarray(a)
    b = np.asarray(b)
    cats = sorted(set(a) | set(b))
    k = len(cats)
    idx = {c: i for i, c in enumerate(cats)}
    obs = np.zeros((k, k))
    for x, y in zip(a, b):
        obs[idx[x], idx[y]] += 1
    n = obs.sum()
    pa = obs.sum(axis=1) / n
    pb = obs.sum(axis=0) / n
    if weights is None:
        po = np.trace(obs) / n
        pe = float(pa @ pb)
        return po, pe, (po - pe) / (1 - pe)
    vals = np.asarray(cats, dtype=float)
    span = vals.max() - vals.min()
    d = np.abs(vals[:, None] - vals[None, :]) / span
    w = d if weights == "linear" else d * d
    wo = float((w * obs).sum() / n)
    we = float((w * np.outer(pa, pb)).sum())
    return 1 - wo, 1 - we, 1 - wo / we


def _ref_alpha(items):
    """Independent numpy reference: nominal Krippendorff via the
    coincidence matrix (items = list of per-item rating lists)."""
    pairable = [r for r in items if len(r) >= 2]
    cats = sorted({c for r in pairable for c in r})
    idx = {c: i for i, c in enumerate(cats)}
    k = len(cats)
    o = np.zeros((k, k))
    for r in pairable:
        m = len(r)
        counts = np.zeros(k)
        for c in r:
            counts[idx[c]] += 1
        o += (np.outer(counts, counts) - np.diag(counts)) / (m - 1)
    n = o.sum()
    nc = o.sum(axis=1)
    do = 1 - np.trace(o) / n
    de = 1 - float((nc * (nc - 1)).sum()) / (n * (n - 1))
    return do, de, 1 - do / de


def test_cohens_kappa_matches_numpy(spark):
    rng = np.random.RandomState(11)
    a = rng.randint(0, 4, 200)
    # b agrees ~70% of the time
    b = np.where(rng.rand(200) < 0.7, a, rng.randint(0, 4, 200))
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a long, b long")
    for weights in (None, "linear", "quadratic"):
        row = cohens_kappa(df, "a", "b", weights=weights).collect()[0]
        po, pe, kap = _ref_kappa(a, b, weights)
        assert row.n_items == 200
        assert abs(row.po - po) < 1e-12
        assert abs(row.pe - pe) < 1e-12
        assert abs(row.kappa - kap) < 1e-12
    # nulls are pairwise-excluded
    df2 = df.unionByName(spark.createDataFrame(
        [(None, 1), (2, None)], "a long, b long"))
    assert cohens_kappa(df2, "a", "b").collect()[0].n_items == 200
    with pytest.raises(ValueError, match="weights"):
        cohens_kappa(df, "a", "b", weights="cubic")


def test_cohens_kappa_edges(spark):
    # perfect agreement -> kappa 1; only one category -> pe = 1,
    # kappa null (undefined)
    df = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "a int, b int")
    row = cohens_kappa(df, "a", "b").collect()[0]
    assert row.kappa == pytest.approx(1.0)
    one = spark.createDataFrame([(1, 1), (1, 1)], "a int, b int")
    assert cohens_kappa(one, "a", "b").collect()[0].kappa is None


def test_krippendorff_alpha_matches_numpy(spark):
    rng = np.random.RandomState(5)
    rows = []
    items = []
    for i in range(80):
        m = rng.randint(1, 5)          # 1..4 raters; singletons drop
        true = rng.randint(0, 3)
        ratings = [int(true if rng.rand() < 0.75
                       else rng.randint(0, 3)) for _ in range(m)]
        items.append([str(c) for c in ratings])
        rows += [(i, str(c)) for c in ratings]
    df = spark.createDataFrame(rows, "item long, rating string")
    row = krippendorff_alpha(df, "item", "rating").collect()[0]
    do, de, alpha = _ref_alpha(items)
    assert abs(row.do - do) < 1e-12
    assert abs(row.de - de) < 1e-12
    assert abs(row.alpha - alpha) < 1e-12
    assert row.n_items == sum(1 for r in items if len(r) >= 2)


def test_fairness_report_reference_and_gaps(spark):
    rows = []
    rng = np.random.RandomState(3)
    for g, sel_p, base_p, n in (("x", 0.6, 0.5, 300),
                                ("y", 0.3, 0.5, 200),
                                ("z", 0.6, 0.4, 100)):
        for _ in range(n):
            rows.append((g, int(rng.rand() < base_p),
                         int(rng.rand() < sel_p)))
    df = spark.createDataFrame(rows, "g string, y int, p int")
    out = {r.group: r for r in
           fairness_report(df, "y", "p", "g").collect()}
    assert set(out) == {"x", "y", "z"}
    # default reference = largest group (x)
    assert all(r.reference_group == "x" for r in out.values())
    assert out["x"].demographic_parity_diff == pytest.approx(0.0)
    assert out["x"].disparate_impact == pytest.approx(1.0)
    assert out["x"].equalized_odds_gap == pytest.approx(0.0)
    # hand check one group's confusion-derived rates
    ys = np.array([r[1] for r in rows if r[0] == "y"])
    ps = np.array([r[2] for r in rows if r[0] == "y"])
    tpr = ((ys == 1) & (ps == 1)).sum() / (ys == 1).sum()
    assert out["y"].tpr == pytest.approx(tpr)
    assert out["y"].selection_rate == pytest.approx(ps.mean())
    # explicit reference group
    out2 = {r.group: r for r in
            fairness_report(df, "y", "p", "g",
                            reference_group="y").collect()}
    assert all(r.reference_group == "y" for r in out2.values())
    assert out2["y"].disparate_impact == pytest.approx(1.0)
    di = out2["x"].selection_rate / out2["y"].selection_rate
    assert out2["x"].disparate_impact == pytest.approx(di)


def test_fairness_zero_selection_reference(spark):
    # reference group selects nobody -> disparate_impact null, DP diff
    # still defined
    rows = [("a", 1, 0)] * 5 + [("b", 1, 1)] * 3
    df = spark.createDataFrame(rows, "g string, y int, p int")
    out = {r.group: r for r in
           fairness_report(df, "y", "p", "g",
                           reference_group="a").collect()}
    assert out["b"].disparate_impact is None
    assert out["b"].demographic_parity_diff == pytest.approx(1.0)
