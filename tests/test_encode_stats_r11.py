"""Round-11 batch 2: OOF target encoding, Spearman, partial corr."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.encode import target_encode_oof
from whylogs_spark.ops.stats import (partial_correlation,
                                     spearman_correlation)

RNG = np.random.RandomState(23)


def _fold(key, k=5):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % k


class TestTargetEncodeOOF:
    def test_matches_numpy_oof_means(self, spark):
        n, m = 400, 20.0
        cats = [RNG.choice(["a", "b", "c"]) for _ in range(n)]
        ys = [float(RNG.randint(0, 2)) for _ in range(n)]
        df = spark.createDataFrame(
            [(i, c, y) for i, (c, y) in enumerate(zip(cats, ys))],
            "id long, cat string, y double")
        out = target_encode_oof(
            df, "cat", "y", ["id"], n_folds=5, smoothing=m,
            out_col="te", fold_col="fold").collect()
        folds = {i: _fold(i) for i in range(n)}
        for r in out:
            f = folds[r["id"]]
            assert r["fold"] == f
            in_s = sum(y for i, (c, y) in
                       enumerate(zip(cats, ys))
                       if c == r["cat"] and folds[i] != f)
            in_c = sum(1 for i, c in enumerate(cats)
                       if c == r["cat"] and folds[i] != f)
            pr_s = sum(y for i, y in enumerate(ys) if folds[i] != f)
            pr_c = sum(1 for i in range(n) if folds[i] != f)
            want = (in_s + m * (pr_s / pr_c)) / (in_c + m)
            assert abs(r["te"] - want) < 1e-12, (r["cat"], f)

    def test_no_self_leakage_single_row_category(self, spark):
        # a category with ONE row: its own fold sees zero in-category
        # evidence, so the encoding must be exactly the OOF prior
        df = spark.createDataFrame(
            [(0, "solo", 1.0)] + [(i, "bulk", 0.0)
                                  for i in range(1, 60)],
            "id long, cat string, y double")
        out = {r["id"]: r for r in target_encode_oof(
            df, "cat", "y", ["id"], n_folds=5, smoothing=10.0,
            out_col="te").collect()}
        solo = out[0]
        f = _fold(0)
        pr_s = sum(1.0 if i == 0 else 0.0 for i in range(60)
                   if _fold(i) != f)
        pr_c = sum(1 for i in range(60) if _fold(i) != f)
        prior = pr_s / pr_c  # own row is IN fold f -> excluded
        want = (0.0 + 10.0 * prior) / (0.0 + 10.0)
        assert abs(solo["te"] - want) < 1e-12
        # own label (1.0) must NOT inflate it: encoding stays at the
        # prior-only value, well below the leaky in-fold mean
        assert solo["te"] < 0.05

    def test_null_label_rows_still_encoded(self, spark):
        df = spark.createDataFrame(
            [(1, "a", None), (2, "a", 1.0), (3, "a", 0.0),
             (4, "b", 1.0)], "id long, cat string, y double")
        out = target_encode_oof(df, "cat", "y", ["id"], n_folds=2,
                                out_col="te")
        rows = {r["id"]: r["te"] for r in out.collect()}
        assert rows[1] is not None

    def test_validations(self, spark):
        df = spark.createDataFrame([(1, "a", 1.0)],
                                   "id long, cat string, y double")
        with pytest.raises(ValueError):
            target_encode_oof(df, "cat", "y", [], n_folds=5)
        with pytest.raises(ValueError):
            target_encode_oof(df, "cat", "y", ["id"], n_folds=1)
        with pytest.raises(ValueError):
            target_encode_oof(df, "cat", "y", ["id"], smoothing=-1)


class TestSpearman:
    def test_matches_numpy_with_ties(self, spark):
        x = RNG.randint(0, 30, 300).astype(float)
        y = 2.0 * x + RNG.normal(0, 10, 300)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)],
            "x double, y double")
        row = spearman_correlation(df, "x", "y").collect()[0]

        def midrank(v):
            order = np.argsort(v, kind="mergesort")
            r = np.empty(len(v))
            sv = v[order]
            i = 0
            while i < len(v):
                j = i
                while j < len(v) and sv[j] == sv[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0
                i = j
            return r
        rx, ry = midrank(x), midrank(y)
        want = np.corrcoef(rx, ry)[0, 1]
        assert row["n"] == 300
        assert abs(row["rho"] - want) < 1e-9

    def test_monotone_transform_invariance(self, spark):
        x = RNG.uniform(1, 10, 200)
        df = spark.createDataFrame(
            [(float(a), float(np.exp(a))) for a in x],
            "x double, y double")
        row = spearman_correlation(df, "x", "y").collect()[0]
        assert abs(row["rho"] - 1.0) < 1e-12


class TestPartialCorrelation:
    def test_matches_textbook_formula(self, spark):
        n = 500
        z = RNG.normal(0, 1, n)
        x = z + RNG.normal(0, 0.5, n)
        y = z + RNG.normal(0, 0.5, n)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for a, b, c in zip(x, y, z)],
            "x double, y double, z double")
        row = partial_correlation(df, "x", "y", ["z"]).collect()[0]
        rxy = np.corrcoef(x, y)[0, 1]
        rxz = np.corrcoef(x, z)[0, 1]
        ryz = np.corrcoef(y, z)[0, 1]
        want = (rxy - rxz * ryz) / np.sqrt(
            (1 - rxz ** 2) * (1 - ryz ** 2))
        assert row["n"] == n
        assert abs(row["r_xy"] - rxy) < 1e-9
        assert abs(row["partial_r"] - want) < 1e-9
        # x,y correlate only through z: partial must collapse
        assert abs(row["partial_r"]) < 0.2 < abs(rxy)

    def test_two_controls_via_precision_matrix(self, spark):
        n = 400
        z1 = RNG.normal(0, 1, n)
        z2 = RNG.normal(0, 1, n)
        x = z1 + 0.5 * z2 + RNG.normal(0, 0.4, n)
        y = z1 - 0.5 * z2 + RNG.normal(0, 0.4, n)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(d))
             for a, b, c, d in zip(x, y, z1, z2)],
            "x double, y double, z1 double, z2 double")
        row = partial_correlation(df, "x", "y",
                                  ["z1", "z2"]).collect()[0]
        mat = np.corrcoef(np.vstack([x, y, z1, z2]))
        prec = np.linalg.inv(mat)
        want = -prec[0, 1] / np.sqrt(prec[0, 0] * prec[1, 1])
        assert abs(row["partial_r"] - want) < 1e-9

    def test_needs_controls(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        with pytest.raises(ValueError):
            partial_correlation(df, "x", "y", [])
