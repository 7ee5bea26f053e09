"""Tests for with_quantile_bins / with_robust_z / robust_outlier_summary
(core/summaries.py) and vocab_growth (ops/text.py)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from whylogs_spark.core.summaries import (
    robust_outlier_summary,
    with_quantile_bins,
    with_robust_z,
)
from whylogs_spark.ops.text import vocab_growth


# ------------------------------------------------------ quantile bins
def test_quantile_bins_quartiles(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                               "x double")
    out = with_quantile_bins(df, "x", n_bins=4)
    got = {r.x: r.x_qbin for r in out.collect()}
    # lower-interpolation quartile boundaries of 1..100: 25, 50, 75
    assert got[1.0] == 0 and got[24.0] == 0
    assert got[25.0] == 1 and got[50.0] == 2 and got[75.0] == 3
    assert got[100.0] == 3
    counts = (out.groupBy("x_qbin").count().orderBy("x_qbin")
              .collect())
    assert [r["count"] for r in counts] == [24, 25, 25, 26]


def test_quantile_bins_null_nan_and_name(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (float("nan"),)], "x double")
    out = with_quantile_bins(df, "x", n_bins=2, bin_col="b")
    got = [(r.x, r.b) for r in out.collect()]
    by = dict((("nan" if (v is not None and math.isnan(v)) else v), b)
              for v, b in got)
    assert by[None] is None and by["nan"] is None
    assert by[1.0] == 0 and by[2.0] == 1 and by[3.0] == 1


def test_quantile_bins_heavy_ties_skip_buckets(spark):
    df = spark.createDataFrame([(1.0,)] * 9 + [(9.0,)], "x double")
    out = with_quantile_bins(df, "x", n_bins=4)
    got = {r[0]: r[1] for r in
           out.select("x", "x_qbin").distinct().collect()}
    # all three boundaries equal 1.0 -> x=1 lands in bin 3, 9 too
    assert got[1.0] == 3 and got[9.0] == 3


def test_quantile_bins_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="n_bins"):
        with_quantile_bins(df, "x", n_bins=1)


# ------------------------------------------------------ robust z
def test_robust_z_known_values(spark):
    # 1..9 plus a gross outlier
    vals = [float(i) for i in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.x: (r.robust_z, r.is_outlier)
           for r in with_robust_z(df, "x").collect()}
    # lower-interpolation median of 10 values = 5th order stat = 5.0
    # |x - 5| sorted: 0,1,1,2,2,3,3,4,4,995 -> MAD = 2.0
    z1000 = round(0.6745 * (1000.0 - 5.0) / 2.0, 6)
    assert out[1000.0] == (z1000, True)
    assert out[5.0] == (0.0, False)
    assert out[1.0] == (round(0.6745 * -4 / 2.0, 6), False)


def test_robust_z_grouped_and_nulls(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
            ("b", 5.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = with_robust_z(df, "x", ["g"], threshold=3.0).collect()
    by = {(r.g, r.x): (r.robust_z, r.is_outlier) for r in out}
    assert by[("a", 100.0)][1] is True
    assert by[("b", None)] == (None, None)
    # group b: single value -> MAD 0 -> null z, not outlier
    assert by[("b", 5.0)] == (None, False)


def test_robust_z_constant_column_flags_exceptions(spark):
    df = spark.createDataFrame(
        [(1.0,)] * 6 + [(7.0,)], "x double")
    out = {r.x: (r.robust_z, r.is_outlier)
           for r in with_robust_z(df, "x").collect()}
    # median 1, MAD 0 -> degenerate: exceptions still flagged
    assert out[1.0] == (None, False)
    assert out[7.0] == (None, True)


def test_robust_outlier_summary(spark):
    rows = ([("a", float(i)) for i in range(1, 10)]
            + [("a", 500.0), ("b", 1.0), ("b", 2.0)])
    df = spark.createDataFrame(rows, "g string, x double")
    out = {r.g: r for r in
           robust_outlier_summary(df, "x", ["g"]).collect()}
    assert out["a"].n == 10
    assert out["a"].n_outliers == 1
    assert out["a"].outlier_rate == pytest.approx(0.1)
    # 2-row group: lower-median = 1.0, MAD = 0 -> degenerate rule
    # flags the other value (documented small-segment noise)
    assert out["b"].n_outliers == 1
    assert out["b"].max_abs_z is None


# ------------------------------------------------------ vocab growth
def test_vocab_growth_curve(spark):
    rows = [
        (1, "a b c"),        # 3 tokens, 3 new
        (2, "a b d"),        # 3 tokens, 1 new
        (3, "a A b"),        # lowercased: 0 new
        (4, "e"),            # 1 new
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = vocab_growth(df, checkpoint_every=2).collect()
    assert [(r.docs_seen, r.tokens_seen, r.distinct_tokens)
            for r in out] == [(2, 6, 4), (4, 10, 5)]
    b = out[1]
    assert b.heaps_beta == pytest.approx(
        round(math.log(5) / math.log(10), 6))


def test_vocab_growth_final_checkpoint_and_empty_docs(spark):
    rows = [(1, "x y"), (2, ""), (3, None), (4, "x z"), (5, "q")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = vocab_growth(df, checkpoint_every=2).collect()
    # checkpoints at 2, 4 and the final row 5
    assert [r.docs_seen for r in out] == [2, 4, 5]
    assert out[-1].distinct_tokens == 4  # x y z q
    assert out[-1].tokens_seen == 5


def test_vocab_growth_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="checkpoint_every"):
        vocab_growth(df, checkpoint_every=0)


def test_vocab_growth_monotone_on_documents(documents):
    out = vocab_growth(documents.select("doc_id", "text"),
                       checkpoint_every=100).collect()
    assert len(out) >= 2
    for a, b in zip(out, out[1:]):
        assert b.tokens_seen > a.tokens_seen
        assert b.distinct_tokens >= a.distinct_tokens
