"""Tests for frequency/target encoding (ops.encode), standardize
(core.summaries), and join_skew_report (ops.layout)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.core.summaries import standardize
from whylogs_spark.ops.encode import frequency_encode, target_encode
from whylogs_spark.ops.layout import join_skew_report


# ------------------------------------------------- frequency encode

def test_frequency_encode_relative_and_counts(spark):
    rows = [("a",), ("a",), ("a",), ("b",), (None,)]
    df = spark.createDataFrame(rows, "c string")
    out = frequency_encode(df, "c").collect()
    got = {(r.c, round(r.c_freq, 6)) for r in out}
    assert got == {("a", 0.6), ("b", 0.2), (None, 0.2)}
    cnt = frequency_encode(df, "c", relative=False).collect()
    assert {(r.c, r.c_freq) for r in cnt} == {
        ("a", 3.0), ("b", 1.0), (None, 1.0)}
    assert len(out) == 5  # row count preserved


def test_target_encode_m_estimate(spark):
    rows = ([("a", 1.0)] * 8 + [("a", 0.0)] * 2    # mean .8, n 10
            + [("b", 0.0)] * 1                      # rare: shrinks
            + [("c", None), ("c", float("nan")), ("c", 1.0)])
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.c: r.c_te for r in
           target_encode(df, "c", "y", smoothing=10.0)
           .select("c", "c_te").distinct().collect()}
    gm = 9.0 / 12.0  # labels: 8 ones + 2 zeros + 1 zero + 1 one
    assert out["a"] == pytest.approx((8 + 10 * gm) / (10 + 10))
    assert out["b"] == pytest.approx((0 + 10 * gm) / (1 + 10))
    # c: only ONE non-null label contributes
    assert out["c"] == pytest.approx((1 + 10 * gm) / (1 + 10))
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(df, "c", "y", smoothing=-1)


def test_target_encode_all_null_labels(spark):
    df = spark.createDataFrame([("a", None), ("b", None)],
                               "c string, y double")
    out = target_encode(df, "c", "y").collect()
    assert all(r.c_te is None for r in out)  # no global mean exists


# ------------------------------------------------------ standardize

def test_standardize_zscore_minmax_robust(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([(v, v) for v in vals],
                               "x double, y double")
    z = {r.x: r.x_scaled for r in
         standardize(df, ["x"], method="zscore").collect()}
    mu, sd = np.mean(vals), np.std(vals, ddof=1)
    for v in vals:
        assert z[v] == pytest.approx((v - mu) / sd)
    mm = {r.x: r.x_scaled for r in
          standardize(df, ["x"], method="minmax").collect()}
    assert mm[1.0] == 0.0 and mm[100.0] == 1.0
    rb = {r.x: r.x_scaled for r in
          standardize(df, ["x", "y"], method="robust").collect()}
    # exact order stats: q25=2, median=3, q75=4 -> IQR 2
    assert rb[1.0] == pytest.approx((1 - 3) / 2)
    assert rb[100.0] == pytest.approx((100 - 3) / 2)


def test_standardize_keeps_caller_dunder_columns(spark):
    df = spark.createDataFrame([(1.0, "t"), (2.0, "u")],
                               "x double, __tag string")
    out = standardize(df, ["x"], method="zscore")
    assert "__tag" in out.columns
    rb = standardize(df, ["x"], method="robust")
    assert "__tag" in rb.columns


def test_standardize_constant_null_nan_validation(spark):
    df = spark.createDataFrame(
        [(5.0, 1.0), (5.0, None), (5.0, float("nan"))],
        "c double, x double")
    out = standardize(df, ["c", "x"], method="zscore").collect()
    assert all(r.c_scaled is None for r in out)  # constant -> null
    for r in out:
        if r.x is None or math.isnan(r.x):
            assert r.x_scaled is None
    with pytest.raises(ValueError, match="method"):
        standardize(df, ["x"], method="rank")
    with pytest.raises(ValueError, match="non-empty"):
        standardize(df, [])


# ------------------------------------------------ join skew report

def test_join_skew_report_fanout(spark):
    left = spark.createDataFrame(
        [(k,) for k in ["hot"] * 100 + ["warm"] * 10 + ["cold"]],
        "k string")
    right = spark.createDataFrame(
        [(k,) for k in ["hot"] * 50 + ["cold"] * 2 + ["right_only"]],
        "k string")
    out = join_skew_report(left, right, ["k"]).collect()
    assert (out[0].k, out[0].fanout) == ("hot", 5000)
    rows = {r.k: r for r in out}
    assert rows["warm"].right_rows == 0 and rows["warm"].fanout == 0
    assert rows["cold"].fanout == 2
    assert rows["right_only"].left_rows == 0


def test_join_skew_report_nulls_topk_and_keymap(spark):
    left = spark.createDataFrame([(None, 1), (1, 1), (1, 2)],
                                 "a int, b int")
    right = spark.createDataFrame([(1, 5), (2, 5)], "x int, y int")
    out = join_skew_report(left, right, ["a"], ["x"], top_k=1).collect()
    assert len(out) == 1
    assert out[0].a == 1 and out[0].fanout == 2  # nulls excluded
    with pytest.raises(ValueError, match="arity"):
        join_skew_report(left, right, ["a", "b"], ["x"])
