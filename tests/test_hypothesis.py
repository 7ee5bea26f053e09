"""Hypothesis-test operators vs independent numpy references."""

import math

import numpy as np
import pytest

from whylogs_spark.ops.hypothesis import (
    anova_oneway, brown_forsythe, cochrans_q, f_sf, kruskal_wallis,
    mcnemar_test, randomization_test_means,
)

RNG = np.random.RandomState(7)


def _groups_df(spark, data):
    rows = [(g, float(v)) for g, vs in data.items() for v in vs]
    return spark.createDataFrame(rows, "g string, v double")


def _ref_anova(data):
    groups = [np.asarray(v, dtype=float) for v in data.values()]
    all_v = np.concatenate(groups)
    gm = all_v.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    df1 = len(groups) - 1
    df2 = len(all_v) - len(groups)
    return ssb, ssw, (ssb / df1) / (ssw / df2), df1, df2


def _ref_kw(data):
    """Tie-corrected H via midranks."""
    all_v = np.concatenate([np.asarray(v, float) for v in data.values()])
    order = np.sort(all_v)
    # midrank per unique value
    uniq, counts = np.unique(order, return_counts=True)
    cum = np.cumsum(counts)
    midrank = {u: c - cnt + (cnt + 1) / 2.0
               for u, c, cnt in zip(uniq, cum, counts)}
    n = len(all_v)
    h = 0.0
    for vs in data.values():
        r = sum(midrank[x] for x in np.asarray(vs, float))
        h += r * r / len(vs)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    tie = 1.0 - sum(c ** 3 - c for c in counts) / (n ** 3 - n)
    return h, tie, h / tie


class TestAnova:
    def test_matches_numpy(self, spark):
        data = {"a": RNG.normal(0, 1, 40),
                "b": RNG.normal(0.6, 1, 35),
                "c": RNG.normal(0.2, 1.4, 50)}
        row = anova_oneway(_groups_df(spark, data), "g", "v") \
            .collect()[0]
        ssb, ssw, f, df1, df2 = _ref_anova(data)
        assert row["n"] == 125 and row["n_groups"] == 3
        assert row["df_between"] == df1 and row["df_within"] == df2
        assert abs(row["ss_between"] - ssb) < 1e-8
        assert abs(row["ss_within"] - ssw) < 1e-8
        assert abs(row["statistic"] - f) < 1e-10
        assert 0.0 < row["p_value"] < 1.0

    def test_identical_groups_small_f(self, spark):
        vals = list(RNG.normal(0, 1, 30))
        data = {"a": vals, "b": vals}
        row = anova_oneway(_groups_df(spark, data), "g", "v") \
            .collect()[0]
        assert abs(row["statistic"]) < 1e-12
        assert row["p_value"] > 0.99


class TestKruskalWallis:
    def test_matches_numpy_with_ties(self, spark):
        data = {"a": list(RNG.randint(0, 8, 45).astype(float)),
                "b": list(RNG.randint(2, 10, 40).astype(float)),
                "c": list(RNG.randint(0, 9, 30).astype(float))}
        row = kruskal_wallis(_groups_df(spark, data), "g", "v") \
            .collect()[0]
        h, tie, stat = _ref_kw(data)
        assert row["n"] == 115 and row["dof"] == 2
        assert abs(row["h"] - h) < 1e-9
        assert abs(row["tie_correction"] - tie) < 1e-12
        assert abs(row["statistic"] - stat) < 1e-9
        assert 0.0 <= row["p_value"] <= 1.0

    def test_known_textbook_value(self, spark):
        # scipy.stats.kruskal([1,2,3],[4,5,6],[7,8,9]) = 7.2, p≈0.0273
        data = {"a": [1, 2, 3], "b": [4, 5, 6], "c": [7, 8, 9]}
        row = kruskal_wallis(_groups_df(spark, data), "g", "v") \
            .collect()[0]
        assert abs(row["statistic"] - 7.2) < 1e-12
        assert abs(row["p_value"] - 0.02732372) < 1e-6


class TestBrownForsythe:
    def test_matches_numpy(self, spark):
        data = {"a": RNG.normal(0, 1, 40),
                "b": RNG.normal(0, 2.5, 45)}
        row = brown_forsythe(_groups_df(spark, data), "g", "v") \
            .collect()[0]
        zs = {g: np.abs(np.asarray(v) - np.median(v))
              for g, v in data.items()}
        _, _, f, df1, df2 = _ref_anova(zs)
        assert row["df_between"] == df1 and row["df_within"] == df2
        assert abs(row["statistic"] - f) < 1e-9
        assert row["p_value"] < 0.05  # real variance difference

    def test_mean_center_is_levene(self, spark):
        data = {"a": RNG.normal(0, 1, 30), "b": RNG.normal(0, 1, 30)}
        row = brown_forsythe(_groups_df(spark, data), "g", "v",
                             center="mean").collect()[0]
        zs = {g: np.abs(np.asarray(v) - np.mean(v))
              for g, v in data.items()}
        _, _, f, _, _ = _ref_anova(zs)
        assert abs(row["statistic"] - f) < 1e-9

    def test_bad_center(self, spark):
        with pytest.raises(ValueError):
            brown_forsythe(_groups_df(spark, {"a": [1.0]}), "g", "v",
                           center="mode")


class TestMcNemar:
    def test_known_value(self, spark):
        # classic 2x2: n01=5, n10=15 -> stat=(|5-15|-1)^2/20=4.05
        rows = ([(0, 1)] * 5 + [(1, 0)] * 15 + [(1, 1)] * 30
                + [(0, 0) if True else (0, 0)] * 10)
        df = spark.createDataFrame(rows, "a int, b int")
        row = mcnemar_test(df, "a", "b").collect()[0]
        assert row["n01"] == 5 and row["n10"] == 15
        assert abs(row["statistic"] - 4.05) < 1e-12
        # chi2_sf(4.05, 1) ≈ 0.044171
        assert abs(row["p_value"] - 0.0441711) < 1e-5

    def test_null_pairs_dropped_and_booleans(self, spark):
        df = spark.createDataFrame(
            [(True, False), (False, True), (None, True), (True, None),
             (True, True)], "a boolean, b boolean")
        row = mcnemar_test(df, "a", "b").collect()[0]
        assert row["n"] == 3 and row["n01"] == 1 and row["n10"] == 1


class TestCochransQ:
    def test_matches_numpy(self, spark):
        x = RNG.randint(0, 2, (60, 3))
        x[:, 2] |= RNG.randint(0, 2, 60)  # make col 2 better
        df = spark.createDataFrame(
            [tuple(int(v) for v in r) for r in x],
            "c0 int, c1 int, c2 int")
        row = cochrans_q(df, ["c0", "c1", "c2"]).collect()[0]
        k = 3
        cj = x.sum(axis=0).astype(float)
        ri = x.sum(axis=1).astype(float)
        q = (k - 1) * (k * (cj ** 2).sum() - ri.sum() ** 2) \
            / (k * ri.sum() - (ri ** 2).sum())
        assert row["n"] == 60 and row["dof"] == 2
        assert abs(row["statistic"] - q) < 1e-9

    def test_needs_two_columns(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        with pytest.raises(ValueError):
            cochrans_q(df, ["a"])


class TestRandomization:
    def test_null_is_uniformish_and_signal_detected(self, spark):
        n = 400
        rows = [(i, "t" if i % 2 else "c",
                 float(RNG.normal(1.0 if i % 2 else 0.0, 1.0)))
                for i in range(n)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        row = randomization_test_means(
            df, "g", "v", "t", "id", reps=99).collect()[0]
        assert row["n"] == n and row["n_treat"] == n // 2
        assert row["reps"] == 99
        assert row["p_value"] <= 0.05  # strong true effect
        assert row["diff_obs"] > 0.5

        # deterministic: identical re-run gives the identical p
        row2 = randomization_test_means(
            df, "g", "v", "t", "id", reps=99).collect()[0]
        assert row2["p_value"] == row["p_value"]

    def test_no_effect_high_p(self, spark):
        rows = [(i, "t" if i % 2 else "c", float(i % 7))
                for i in range(280)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        row = randomization_test_means(
            df, "g", "v", "t", "id", reps=199).collect()[0]
        # diff_obs is exactly 0 by construction -> p must be ~1
        assert row["p_value"] > 0.5

    def test_reps_validation(self, spark):
        df = spark.createDataFrame([(1, "t", 1.0)],
                                   "id long, g string, v double")
        with pytest.raises(ValueError):
            randomization_test_means(df, "g", "v", "t", "id", reps=0)


def test_f_sf_reference_values():
    # public F-table 5% critical values
    assert abs(f_sf(4.103, 2, 10) - 0.05) < 5e-4
    assert abs(f_sf(3.326, 5, 10) - 0.05) < 5e-4
    assert f_sf(0.0, 3, 7) == 1.0
    assert f_sf(1e9, 3, 7) < 1e-9
    assert not math.isnan(f_sf(1.0, 1, 1))
