"""quantile_normalize vs an independent numpy reference."""

import numpy as np
import pytest

from whylogs_spark.ops.encode import quantile_normalize

RNG = np.random.RandomState(41)


def _ref_qn(mat):
    """Classic Bolstad QN with midrank tie handling."""
    mat = np.asarray(mat, float)
    n, k = mat.shape
    order = np.argsort(mat, axis=0, kind="mergesort")
    sorted_cols = np.take_along_axis(mat, order, axis=0)
    ref = sorted_cols.mean(axis=1)
    out = np.empty_like(mat)
    for j in range(k):
        col = mat[:, j]
        sv = np.sort(col)
        # for each value: mean of ref over its tied position range
        uniq = np.unique(col)
        val_map = {}
        for v in uniq:
            lo = np.searchsorted(sv, v, "left")
            hi = np.searchsorted(sv, v, "right")
            val_map[v] = ref[lo:hi].mean()
        out[:, j] = [val_map[v] for v in col]
    return out


class TestQuantileNormalize:
    def test_matches_numpy_with_ties(self, spark):
        n = 120
        mat = np.column_stack([
            RNG.randint(0, 25, n).astype(float),     # heavy ties
            RNG.normal(50, 10, n),
            RNG.exponential(5.0, n),
        ])
        df = spark.createDataFrame(
            [(i, float(a), float(b), float(c))
             for i, (a, b, c) in enumerate(mat)],
            "id long, a double, b double, c double")
        out = quantile_normalize(df, ["a", "b", "c"]).collect()
        want = _ref_qn(mat)
        for r in out:
            i = r["id"]
            assert abs(r["a_qn"] - want[i, 0]) < 1e-9, i
            assert abs(r["b_qn"] - want[i, 1]) < 1e-9, i
            assert abs(r["c_qn"] - want[i, 2]) < 1e-9, i

    def test_identical_marginals_after(self, spark):
        n = 200
        a = RNG.normal(0, 1, n)
        b = RNG.exponential(3.0, n)
        df = spark.createDataFrame(
            [(float(x), float(y)) for x, y in zip(a, b)],
            "a double, b double")
        out = quantile_normalize(df, ["a", "b"]).toPandas()
        # both normalized columns must have the SAME sorted values
        sa = np.sort(out["a_qn"].to_numpy())
        sb = np.sort(out["b_qn"].to_numpy())
        assert np.allclose(sa, sb, atol=1e-9)

    def test_rows_with_nulls_drop(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (None, 3.0), (4.0, None), (5.0, 6.0)],
            "a double, b double")
        out = quantile_normalize(df, ["a", "b"])
        assert out.count() == 2

    def test_needs_two_columns(self, spark):
        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError):
            quantile_normalize(df, ["a"])
