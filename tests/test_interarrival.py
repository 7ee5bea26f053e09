"""interarrival_stats: hand-computed gap distributions, tie handling,
and the group-subset contract."""

import datetime

import pytest

from whylogs_spark.ops.events import interarrival_stats

BASE = datetime.datetime(2024, 3, 1)


def _ts(s):
    return BASE + datetime.timedelta(seconds=s)


def test_interarrival_hand_computed(spark):
    # entity (u, t): gaps — u1/a: [10, 30]; u2/a: [20]; u1/b: none
    rows = [
        ("u1", "a", _ts(0)), ("u1", "a", _ts(10)), ("u1", "a", _ts(40)),
        ("u2", "a", _ts(100)), ("u2", "a", _ts(120)),
        ("u1", "b", _ts(5)),
    ]
    df = spark.createDataFrame(rows, "u string, t string, ts timestamp")
    out = {r["t"]: r for r in interarrival_stats(
        df, ["u", "t"], "ts", group_cols=["t"], qs=(0.5,)).collect()}
    # group b has zero gaps -> no row (all aggregates over empty)
    assert set(out) == {"a"}
    a = out["a"]
    # gaps for a: [10, 30, 20]
    assert a["n_gaps"] == 3
    assert a["mean_gap_s"] == pytest.approx(20.0)
    assert a["max_gap_s"] == pytest.approx(30.0)
    # exact lower-interpolation median of [10, 20, 30] = 20
    assert a["q_0_5"] == pytest.approx(20.0)
    # sample sd of [10,20,30] = 10; cv = 0.5; burstiness = -1/3
    assert a["cv_gap"] == pytest.approx(0.5)
    assert a["burstiness"] == pytest.approx(-1.0 / 3.0)


def test_interarrival_duplicate_timestamps(spark):
    # [t0, t0, t4]: gap multiset {0, 4} regardless of tie order
    rows = [("u", _ts(0)), ("u", _ts(0)), ("u", _ts(4))]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    r = interarrival_stats(df, ["u"], "ts", qs=(0.5,)).collect()[0]
    assert r["n_gaps"] == 2
    assert r["mean_gap_s"] == pytest.approx(2.0)
    assert r["max_gap_s"] == pytest.approx(4.0)


def test_interarrival_single_event_entity_and_nulls(spark):
    rows = [("u", _ts(0)), ("v", _ts(0)), ("v", _ts(6)),
            (None, _ts(1)), ("v", None)]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    r = interarrival_stats(df, ["u"], "ts", qs=(0.5,)).collect()
    assert len(r) == 1  # global row; only v contributes one gap
    assert r[0]["n_gaps"] == 1
    assert r[0]["mean_gap_s"] == pytest.approx(6.0)
    # n < 2 -> cv/burstiness null
    assert r[0]["cv_gap"] is None
    assert r[0]["burstiness"] is None


def test_interarrival_validation(spark):
    df = spark.createDataFrame([], "u string, g string, ts timestamp")
    with pytest.raises(ValueError, match="subset"):
        interarrival_stats(df, ["u"], "ts", group_cols=["g"])
    with pytest.raises(ValueError, match="entity_cols"):
        interarrival_stats(df, [], "ts")
