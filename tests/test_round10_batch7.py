"""Round-10 final-batch operator: exact two-sample effect sizes vs a
numpy reference (Cohen's d, Hedges' g, Cliff's delta, CLES)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _np_effects(x, y):
    nt, nr = len(x), len(y)
    d = (x.mean() - y.mean()) / np.sqrt(
        ((nt - 1) * x.var(ddof=1) + (nr - 1) * y.var(ddof=1))
        / (nt + nr - 2))
    g = d * (1 - 3 / (4 * (nt + nr) - 9))
    gt = sum((xi > y).sum() for xi in x)
    lt = sum((xi < y).sum() for xi in x)
    eq = nt * nr - gt - lt
    return d, g, (gt - lt) / (nt * nr), (gt + 0.5 * eq) / (nt * nr)


def test_effect_sizes_matches_numpy(lineitem):
    from whylogs_spark.core.drift import effect_sizes

    t = lineitem.filter(F.col("l_returnflag") == "A")
    r = lineitem.filter(F.col("l_returnflag") == "R")
    got = effect_sizes(t, r, "l_quantity").collect()[0]
    x = t.select("l_quantity").toPandas().l_quantity.to_numpy(float)
    y = r.select("l_quantity").toPandas().l_quantity.to_numpy(float)
    d, g, delta, cles = _np_effects(x, y)
    assert got.n_t == len(x) and got.n_r == len(y)
    assert got.mean_t == pytest.approx(x.mean(), abs=1e-9)
    assert got.cohens_d == pytest.approx(d, abs=1e-12)
    assert got.hedges_g == pytest.approx(g, abs=1e-12)
    assert got.cliffs_delta == pytest.approx(delta, abs=1e-12)
    assert got.cles == pytest.approx(cles, abs=1e-12)


def test_effect_sizes_known_shift(spark):
    from whylogs_spark.core.drift import effect_sizes

    # complete separation: delta == 1, cles == 1
    t = spark.createDataFrame([(float(i + 100),) for i in range(50)],
                              "v double")
    r = spark.createDataFrame([(float(i),) for i in range(50)],
                              "v double")
    got = effect_sizes(t, r, "v").collect()[0]
    assert got.cliffs_delta == pytest.approx(1.0)
    assert got.cles == pytest.approx(1.0)
    # identical samples: everything 0 / cles 0.5
    same = effect_sizes(r, r, "v").collect()[0]
    assert same.cohens_d == pytest.approx(0.0, abs=1e-12)
    assert same.cliffs_delta == pytest.approx(0.0, abs=1e-12)
    assert same.cles == pytest.approx(0.5, abs=1e-12)


def test_effect_sizes_empty_and_constant(spark, lineitem):
    from whylogs_spark.core.drift import effect_sizes

    empty = lineitem.filter(F.lit(False))
    got = effect_sizes(lineitem, empty, "l_quantity").collect()[0]
    assert got.cliffs_delta is None and got.cles is None
    const = spark.createDataFrame([(1.0,)] * 20, "v double")
    c = effect_sizes(const, const, "v").collect()[0]
    assert c.cohens_d is None  # zero pooled variance
    assert c.cles == pytest.approx(0.5)
