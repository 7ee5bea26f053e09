"""Round-10 fourth-batch operators vs independent numpy references:
exact two-sample CvM + Anderson-Darling, chi-square goodness-of-fit,
quantile treatment effects."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _np_cvm_ad(x, y):
    """Independent replay: CvM via the dH_N integral; AD via the
    Scholz-Stephens A2akN midrank form for k=2."""
    n, m = len(x), len(y)
    nn = n + m
    vals = np.unique(np.concatenate([x, y]))
    fct = np.array([(x == v).sum() for v in vals], float)
    fcr = np.array([(y == v).sum() for v in vals], float)
    sct, scr = np.cumsum(fct), np.cumsum(fcr)
    l_k = fct + fcr
    ft, fr = sct / n, scr / m
    cvm = (n * m / nn ** 2) * np.sum(l_k * (ft - fr) ** 2)

    mt = sct - fct / 2.0
    mr = scr - fcr / 2.0
    bb = sct + scr - l_k / 2.0
    denom = bb * (nn - bb) - nn * l_k / 4.0
    inner = ((nn * mt - n * bb) ** 2 / n
             + (nn * mr - m * bb) ** 2 / m)
    ok = denom > 0
    ad = (nn - 1) / nn * np.sum((l_k[ok] / nn) * inner[ok] / denom[ok])
    return cvm, ad


def _np_cvm_rank_untied(x, y):
    """Second independent cross-check for untied data: the classic
    rank formula T = U/(nmN) - (4nm-1)/(6N) (Anderson 1962)."""
    n, m = len(x), len(y)
    nn = n + m
    pooled = np.concatenate([x, y])
    order = np.argsort(pooled)
    ranks = np.empty(nn)
    ranks[order] = np.arange(1, nn + 1)
    r = np.sort(ranks[:n])
    s = np.sort(ranks[n:])
    u = (n * np.sum((r - np.arange(1, n + 1)) ** 2)
         + m * np.sum((s - np.arange(1, m + 1)) ** 2))
    return u / (n * m * nn) - (4 * n * m - 1) / (6 * nn)


def test_cvm_ad_matches_numpy_with_ties(lineitem, spark):
    from whylogs_spark.core.drift import cvm_ad_exact

    t = lineitem.filter(F.col("l_returnflag") == "A")
    r = lineitem.filter(F.col("l_returnflag") == "R")
    got = {row.algorithm: row.statistic for row in
           cvm_ad_exact(t, r, "l_quantity").collect()}
    x = t.select("l_quantity").toPandas().l_quantity.to_numpy(float)
    y = r.select("l_quantity").toPandas().l_quantity.to_numpy(float)
    cvm, ad = _np_cvm_ad(x, y)
    assert got["cvm"] == pytest.approx(cvm, abs=1e-9)
    assert got["anderson_darling"] == pytest.approx(ad, abs=1e-9)


def test_cvm_integral_equals_rank_form_untied(spark):
    # untied planted data: the dH_N integral must equal the classic
    # rank formula (the identity the docstring claims)
    x = np.array([0.7 * i + 0.013 for i in range(40)])
    y = np.array([0.9 * i + 0.5117 for i in range(30)])
    cvm_int, _ = _np_cvm_ad(x, y)
    cvm_rank = _np_cvm_rank_untied(x, y)
    assert cvm_int == pytest.approx(cvm_rank, abs=1e-12)

    from whylogs_spark.core.drift import cvm_ad_exact

    t = spark.createDataFrame([(float(v),) for v in x], "v double")
    r = spark.createDataFrame([(float(v),) for v in y], "v double")
    got = {row.algorithm: row.statistic for row in
           cvm_ad_exact(t, r, "v").collect()}
    assert got["cvm"] == pytest.approx(cvm_rank, abs=1e-12)


def test_cvm_ad_identical_samples_near_zero(spark):
    from whylogs_spark.core.drift import cvm_ad_exact

    d = spark.createDataFrame(
        [(float(i % 17),) for i in range(200)], "v double")
    got = {row.algorithm: row.statistic for row in
           cvm_ad_exact(d, d, "v").collect()}
    # identical distributions: integral term is exactly 0
    assert got["cvm"] == pytest.approx(0.0, abs=1e-12)
    assert got["anderson_darling"] == pytest.approx(0.0, abs=1e-9)


def test_cvm_ad_empty_side_null(spark, lineitem):
    from whylogs_spark.core.drift import cvm_ad_exact

    empty = lineitem.filter(F.lit(False))
    got = {row.algorithm: row.statistic for row in
           cvm_ad_exact(lineitem, empty, "l_quantity").collect()}
    assert got["cvm"] is None and got["anderson_darling"] is None


def test_chi2_gof_matches_numpy(orders):
    from whylogs_spark.ops.integrity import chi2_gof

    pdf = orders.select("o_orderpriority").toPandas()
    obs = pdf.o_orderpriority.value_counts()
    cats = sorted(obs.index)
    # deliberately non-uniform expected shares + one never-observed
    # expected category
    raw = {c: i + 1.0 for i, c in enumerate(cats)}
    raw["9-PHANTOM"] = 1.0
    r = chi2_gof(orders, "o_orderpriority", raw).collect()[0]

    tot = sum(raw.values())
    n = obs.sum()
    stat = 0.0
    for c, w in raw.items():
        o = obs.get(c, 0)
        e = n * w / tot
        stat += (o - e) ** 2 / e
    assert r.n == n
    assert r.dof == len(raw) - 1
    assert r.unexpected_n == 0
    assert r.statistic == pytest.approx(stat, rel=1e-9)


def test_chi2_gof_unexpected_categories(spark):
    from whylogs_spark.ops.integrity import chi2_gof

    d = spark.createDataFrame(
        [("a",)] * 30 + [("b",)] * 20 + [("zz",)] * 7, "c string")
    r = chi2_gof(d, "c", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r.n == 50 and r.unexpected_n == 7
    assert r.statistic == pytest.approx(
        (30 - 25) ** 2 / 25 + (20 - 25) ** 2 / 25)


def test_chi2_gof_validation(orders):
    from whylogs_spark.ops.integrity import chi2_gof

    with pytest.raises(ValueError):
        chi2_gof(orders, "o_orderpriority", {})


def test_qte_matches_numpy(orders):
    from whylogs_spark.ops.abtest import quantile_treatment_effect

    d = orders.select(
        (F.col("o_custkey") % 2).cast("double").alias("tr"),
        F.col("o_totalprice").alias("y"))
    got = {round(r.q, 4): r for r in quantile_treatment_effect(
        d, "tr", "y").collect()}
    pdf = d.toPandas()
    yc = pdf[pdf.tr == 0].y.to_numpy(float)
    yt = pdf[pdf.tr == 1].y.to_numpy(float)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        r = got[q]
        c = np.quantile(yc, q, method="linear")
        t = np.quantile(yt, q, method="linear")
        assert r.y_control == pytest.approx(c, abs=1e-9)
        assert r.y_treatment == pytest.approx(t, abs=1e-9)
        assert r.qte == pytest.approx(t - c, abs=1e-9)


def test_qte_validation(orders):
    from whylogs_spark.ops.abtest import quantile_treatment_effect

    with pytest.raises(ValueError):
        quantile_treatment_effect(orders, "o_custkey", "o_totalprice",
                                  quantiles=[1.5])
