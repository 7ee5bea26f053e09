"""Tests for weighted_sample (ops.sampling), adjust_pvalues and
qq_table (core.drift)."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.core.drift import adjust_pvalues, qq_table
from whylogs_spark.ops.sampling import weighted_sample


# ------------------------------------------------- weighted sample

def _es_key(key: str, w: float, salt: str = "") -> float:
    s = f"{key}|{salt}" if salt else key
    h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    u = (h + 1) / 16 ** 8
    return math.log(u) / w


def test_weighted_sample_matches_reference_keys(spark):
    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sorted(r.id for r in
                 weighted_sample(df, 25, "w", ["id"]).collect())
    keys = sorted(rows, key=lambda r: -_es_key(str(r[0]), r[1]))
    expect = sorted(i for i, _ in keys[:25])
    assert got == expect
    # deterministic; different salt -> (almost surely) different draw
    again = sorted(r.id for r in
                   weighted_sample(df, 25, "w", ["id"]).collect())
    assert again == got
    other = sorted(r.id for r in
                   weighted_sample(df, 25, "w", ["id"],
                                   salt="s2").collect())
    assert other != got


def test_weighted_sample_bias_toward_heavy(spark):
    # two classes: weight 10 vs 1 -> heavy class dominates the sample
    rows = ([(i, 10.0, "heavy") for i in range(200)]
            + [(1000 + i, 1.0, "light") for i in range(200)])
    df = spark.createDataFrame(rows, "id long, w double, cls string")
    out = weighted_sample(df, 100, "w", ["id"]).collect()
    heavy = sum(1 for r in out if r.cls == "heavy")
    assert heavy > 70  # E[heavy] ~ 90; loose deterministic-ish bound


def test_weighted_sample_excludes_bad_weights(spark):
    rows = [(1, 5.0), (2, 0.0), (3, -1.0), (4, None),
            (5, float("nan"))]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample(df, 10, "w", ["id"]).collect()
    assert [r.id for r in out] == [1]
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, 0, "w", ["id"])
    with pytest.raises(ValueError, match="key_cols"):
        weighted_sample(df, 5, "w", [])
    # null key components are excluded, not hashed as ''
    nk = spark.createDataFrame([(None, 5.0), (2, 5.0)],
                               "id long, w double")
    assert [r.id for r in
            weighted_sample(nk, 5, "w", ["id"]).collect()] == [2]


# ------------------------------------------------- p-value adjust

def _bh_reference(ps):
    """Textbook BH on a list of p-values (numpy-style)."""
    m = len(ps)
    order = np.argsort(ps, kind="stable")
    adj = np.empty(m)
    prev = 1.0
    for rank_from_end, idx in enumerate(reversed(order)):
        rank = m - rank_from_end
        prev = min(prev, ps[idx] * m / rank)
        adj[idx] = prev
    return adj


def test_bh_matches_reference(spark):
    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)],
        "test_id string, p double")
    out = {r.test_id: r for r in
           adjust_pvalues(df, "p", "test_id", method="bh").collect()}
    expect = _bh_reference(ps)
    for i in range(len(ps)):
        assert out[f"t{i}"].p_adjusted == pytest.approx(
            expect[i], abs=1e-12)
    # tied p-values get identical adjustments
    tied = spark.createDataFrame(
        [("a", 0.01), ("b", 0.01), ("c", 0.5)],
        "test_id string, p double")
    tr = {r.test_id: r.p_adjusted for r in
          adjust_pvalues(tied, "p", "test_id").collect()}
    assert tr["a"] == tr["b"] == pytest.approx(0.015)


def test_adjust_pvalues_bonferroni_nulls_validation(spark):
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.4), ("c", None), ("d", float("nan"))],
        "test_id string, p double")
    out = {r.test_id: r for r in adjust_pvalues(
        df, "p", "test_id", method="bonferroni").collect()}
    # m = 2 (nulls don't count)
    assert out["a"].p_adjusted == pytest.approx(0.02)
    assert out["b"].p_adjusted == pytest.approx(0.8)
    assert out["c"].p_adjusted is None and not out["c"].reject
    assert out["a"].reject
    with pytest.raises(ValueError, match="method"):
        adjust_pvalues(df, "p", "test_id", method="holm")


# ------------------------------------------------------- QQ table

def test_qq_table_order_stats(spark):
    ref_vals = [float(i) for i in range(1, 101)]       # 1..100
    tgt_vals = [float(i) * 2 for i in range(1, 101)]   # 2..200
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    tgt = spark.createDataFrame([(v,) for v in tgt_vals], "x double")
    out = {r.q: r for r in
           qq_table(ref, tgt, "x", qs=[0.25, 0.5, 0.9]).collect()}
    assert out[0.5].ref_q == 50.0 and out[0.5].target_q == 100.0
    assert out[0.5].diff == 50.0
    assert out[0.25].ref_q == 25.0 and out[0.9].ref_q == 90.0
    with pytest.raises(ValueError, match="non-empty"):
        qq_table(ref, tgt, "x", qs=[])


def test_qq_table_empty_side_nulls(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    empty = ref.filter("x < 0")
    out = qq_table(ref, empty, "x", qs=[0.5]).collect()[0]
    assert out.ref_q == 1.0 and out.target_q is None and out.diff is None
