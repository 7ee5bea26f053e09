"""Tests for anonymize (ops.integrity), ohlc_resample (ops.events),
and the remove_boilerplate pipeline step (ops.pipeline)."""

import datetime as dt
import hashlib

import pytest

from whylogs_spark.ops.events import ohlc_resample
from whylogs_spark.ops.integrity import anonymize, k_anonymity_report
from whylogs_spark.ops.pipeline import run_pipeline


# ---------------------------------------------------------- anonymize

def test_anonymize_strategies(spark):
    rows = [(1, "alice@x.com", 37, "94110", "s"),
            (2, "bob@y.org", 41, "10001", "t"),
            (3, None, None, None, None)]
    df = spark.createDataFrame(
        rows, "id long, email string, age int, zip string, secret string")
    out = {r.id: r for r in anonymize(df, {
        "email": "hash",
        "age": ("bucket", 10),
        "zip": ("prefix", 3),
        "secret": "drop",
    }).collect()}
    assert "secret" not in out[1].asDict()
    assert out[1].email == hashlib.md5(b"alice@x.com").hexdigest()
    assert out[1].age == 30.0 and out[2].age == 40.0
    assert out[1].zip == "941" and out[2].zip == "100"
    # nulls stay null under every strategy
    assert out[3].email is None and out[3].age is None
    assert out[3].zip is None


def test_anonymize_salt_fixed_and_validation(spark):
    df = spark.createDataFrame([(1, "k")], "id long, v string")
    a = anonymize(df, {"v": ("hash", "s1")}).collect()[0].v
    b = anonymize(df, {"v": ("hash", "s2")}).collect()[0].v
    assert a != b
    assert a == hashlib.md5(b"k|s1").hexdigest()
    fx = anonymize(df, {"v": ("fixed", "REDACTED")}).collect()[0].v
    assert fx == "REDACTED"
    # NaN under bucket -> null, never a fabricated 0-bucket
    nn = spark.createDataFrame([(float("nan"),), (1500.0,)],
                               "bal double")
    got = {r.bal for r in
           anonymize(nn, {"bal": ("bucket", 1000)}).collect()}
    assert got == {None, 1000.0}
    with pytest.raises(ValueError, match="not found"):
        anonymize(df, {"missing": "hash"})
    with pytest.raises(ValueError, match="unknown strategy"):
        anonymize(df, {"v": "scramble"})
    with pytest.raises(ValueError, match="width"):
        anonymize(df, {"id": ("bucket", 0)})


def test_anonymize_improves_k_anonymity(spark):
    rows = [(i, 20 + i, "9411" + str(i % 10)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, age int, zip string")
    before = k_anonymity_report(df, ["age", "zip"]).collect()[0]
    after_df = anonymize(df, {"age": ("bucket", 20),
                              "zip": ("prefix", 3)})
    after = k_anonymity_report(after_df, ["age", "zip"]).collect()[0]
    assert before.k_anonymity == 1
    assert after.k_anonymity > before.k_anonymity


# ---------------------------------------------------------- OHLC

BASE = dt.datetime(2024, 3, 1)


def test_ohlc_resample_basic(spark):
    rows = [
        (1, BASE + dt.timedelta(minutes=5), 10.0),
        (1, BASE + dt.timedelta(minutes=20), 30.0),
        (1, BASE + dt.timedelta(minutes=50), 20.0),
        (1, BASE + dt.timedelta(hours=1, minutes=1), 7.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r.bucket: r for r in
           ohlc_resample(df, grain="hour").collect()}
    h0 = out[BASE.replace(minute=0)]
    assert (h0.open, h0.high, h0.low, h0.close) == (10.0, 30.0, 10.0, 20.0)
    assert h0.n == 3 and h0.mean == pytest.approx(20.0)
    h1 = out[BASE + dt.timedelta(hours=1)]
    assert (h1.open, h1.close) == (7.0, 7.0)


def test_ohlc_tiebreak_and_filters(spark):
    # two events at the SAME ts: tiebreak by event_id
    rows = [(2, BASE, 99.0), (1, BASE, 5.0),
            (3, BASE + dt.timedelta(minutes=1), None),
            (4, None, 1.0), (5, BASE, float("nan"))]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = ohlc_resample(df, grain="hour",
                        tiebreak_cols=["event_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.open == 5.0 and r.close == 99.0 and r.n == 2
    with pytest.raises(ValueError, match="grain"):
        ohlc_resample(df, grain="month")


def test_ohlc_keys(spark):
    rows = [("a", BASE, 1.0), ("b", BASE, 9.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r.k: r for r in
           ohlc_resample(df, key_cols=["k"], grain="hour").collect()}
    assert out["a"].open == 1.0 and out["b"].open == 9.0


# --------------------------------------------- pipeline boilerplate step

def test_pipeline_remove_boilerplate_step(spark):
    docs = spark.createDataFrame(
        [(i, f"BANNER\nbody {i}", "web") for i in range(10)],
        "doc_id long, text string, source string")
    out = run_pipeline(docs, [
        {"op": "remove_boilerplate", "min_df_ratio": 0.5},
    ]).collect()
    assert len(out) == 10
    for r in out:
        assert "BANNER" not in r.text
        assert r.source == "web"  # other columns ride through
        assert r.bp_n_lines == 2 and r.bp_n_kept == 1
