"""Tests for the declarative data-contract checker (ops.expect)."""

import pytest

from whylogs_spark.ops.expect import check_dataframe


def _df(spark):
    rows = [
        (1, "A", 10.0, 1.0),
        (2, "A", 20.0, 2.0),
        (3, "B", -5.0, 3.0),
        (4, None, 40.0, 4.0),
        (4, "C", 50.0, 5.0),  # duplicate id, off-set status
    ]
    return spark.createDataFrame(rows, "id long, status string, "
                                       "price double, label double")


def test_check_dataframe_suite(spark):
    df = _df(spark)
    out = {r.check: r for r in check_dataframe(df, [
        {"check": "row_count_between", "min": 1, "max": 100},
        {"check": "no_nulls", "column": "id"},
        {"check": "no_nulls", "column": "status"},
        {"check": "unique", "column": "id"},
        {"check": "accepted_values", "column": "status",
         "values": ["A", "B"]},
        {"check": "expression", "name": "price non-negative",
         "expr": "price >= 0", "max_violations": 0},
        {"check": "min_at_least", "column": "price", "value": -10},
        {"check": "max_at_most", "column": "price", "value": 100},
        {"check": "mean_between", "column": "price", "min": 0,
         "max": 100},
    ]).collect()}
    assert out["row count in [1, 100]"].passed
    assert out["id has no nulls"].passed
    r = out["status has no nulls"]
    assert not r.passed and r.observed == 1.0
    r = out["id is unique"]
    assert not r.passed and r.observed == 1.0  # one duplicate
    r = out["status in accepted set"]
    assert not r.passed and r.observed == 1.0  # 'C'; null ignored
    r = out["expression: price non-negative"]
    assert not r.passed and r.observed == 1.0  # the -5 row
    assert out["price min >= -10.0"].passed
    assert out["price max <= 100.0"].passed
    assert out["price mean in [0.0, 100.0]"].passed


def test_check_corr_and_fd(spark):
    rows = [(1, "x", 1.0, 1.0, 2.0), (1, "x", 2.0, 2.0, 4.0),
            (2, "y", 3.0, 3.0, 6.0), (2, "z", 4.0, 4.0, 8.0)]
    df = spark.createDataFrame(
        rows, "k long, v string, price double, label double, "
              "leak double")
    out = {r.check: r for r in check_dataframe(df, [
        {"check": "corr_abs_below", "x": "leak", "y": "label",
         "limit": 0.95},
        {"check": "corr_abs_below", "x": "price", "y": "k",
         "limit": 2.0},
        {"check": "fd_holds", "determinants": ["k"],
         "dependents": ["v"]},
        {"check": "fd_holds", "determinants": ["v"],
         "dependents": ["k"]},
    ]).collect()}
    r = out["|corr(leak, label)| below 0.95"]
    assert not r.passed and r.observed == pytest.approx(1.0)
    assert out["|corr(price, k)| below 2.0"].passed
    r = out["fd: k -> v"]
    assert not r.passed and r.observed == 2.0  # k=2 has two v's
    assert out["fd: v -> k"].passed


def test_check_distinct_regex_stddev(spark):
    df = _df(spark)
    out = {r.check: r for r in check_dataframe(df, [
        {"check": "distinct_count_between", "column": "status",
         "min": 1, "max": 2},
        {"check": "matches_regex", "column": "status",
         "pattern": "^[A-B]$"},
        {"check": "stddev_below", "column": "price", "value": 1000},
    ]).collect()}
    r = out["status distinct count in [1, 2]"]
    assert not r.passed and r.observed == 3.0  # A, B, C (null skipped)
    r = out["status matches regex"]
    assert not r.passed and r.observed == 1.0  # 'C'; null ignored
    assert out["price stddev below 1000.0"].passed
    # constant column: stddev 0 -> passes
    const = spark.createDataFrame([(1.0,), (1.0,)], "x double")
    ok = check_dataframe(const, [
        {"check": "stddev_below", "column": "x", "value": 0.1},
    ]).collect()[0]
    assert ok.passed and ok.observed == 0.0


def test_check_dataframe_empty_input_and_validation(spark):
    df = _df(spark).filter("id < 0")
    out = {r.check: r for r in check_dataframe(df, [
        {"check": "row_count_between", "min": 1},
        {"check": "no_nulls", "column": "id"},
        {"check": "min_at_least", "column": "price", "value": 0},
    ]).collect()}
    assert not out["row count >= 1"].passed
    assert out["id has no nulls"].passed
    assert out["price min >= 0.0"].passed  # vacuously
    with pytest.raises(ValueError, match="unknown check"):
        check_dataframe(df, [{"check": "is_pretty"}])
    with pytest.raises(ValueError, match="missing keys"):
        check_dataframe(df, [{"check": "null_rate_below",
                              "column": "id"}])
    with pytest.raises(ValueError, match="column not found"):
        check_dataframe(df, [{"check": "no_nulls", "column": "zz"}])
    # a spec missing its column key is a ValueError, not a KeyError
    with pytest.raises(ValueError, match="missing keys"):
        check_dataframe(df, [{"check": "no_nulls"}])
    with pytest.raises(ValueError, match="missing keys"):
        check_dataframe(df, [{"check": "unique"}])
    with pytest.raises(ValueError, match="non-empty"):
        check_dataframe(df, [])
