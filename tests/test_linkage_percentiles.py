"""Tests for blocked_fuzzy_join (ops.linkage) and percentile_rollup
(ops.events)."""

import datetime as dt

import numpy as np
import pytest

from whylogs_spark.ops.events import percentile_rollup
from whylogs_spark.ops.linkage import blocked_fuzzy_join


# ------------------------------------------------- fuzzy join

def _sides(spark):
    left = spark.createDataFrame(
        [(1, "Acme Corp"), (2, "Globex"), (3, "Initech"),
         (4, None), (5, "  ")],
        "lid long, name string")
    right = spark.createDataFrame(
        [(10, "acme corp"),     # exact after normalize
         (11, "Acme Crop"),     # transposition: distance 2
         (12, "Globexx"),       # 1 insert
         (13, "Umbrella"),      # no match
         (14, "Inotech")],      # 1 sub but differs at char 2
        "rid long, name string")
    return left, right


def test_fuzzy_join_prefix_blocking(spark):
    left, right = _sides(spark)
    out = {(r.lid, r.rid): r.distance for r in blocked_fuzzy_join(
        left, right, "name", block="prefix", block_len=4,
        max_distance=2).collect()}
    assert out[(1, 10)] == 0
    assert out[(1, 11)] == 2
    assert out[(2, 12)] == 1
    # Inotech differs from Initech at position 2 -> different 4-prefix
    # blocks: MISSED by prefix blocking (the documented tradeoff)
    assert (3, 14) not in out
    assert all(lid not in (4, 5) for lid, _ in out)


def test_fuzzy_join_soundex_and_both(spark):
    left, right = _sides(spark)
    snd = {(r.lid, r.rid) for r in blocked_fuzzy_join(
        left, right, "name", block="soundex",
        max_distance=2).collect()}
    # soundex('initech') == soundex('inotech') -> recovered
    assert (3, 14) in snd
    both = blocked_fuzzy_join(left, right, "name", block="both",
                              block_len=4, max_distance=2)
    keys = [(r.lid, r.rid) for r in both.collect()]
    assert (3, 14) in keys and (1, 10) in keys
    assert len(keys) == len(set(keys))  # union deduplicated


def test_fuzzy_join_both_keeps_duplicate_row_multiplicity(spark):
    """block='both' must dedup only the union's double-matched PAIRS,
    not genuinely duplicate input rows: two identical left rows
    matching one right row yield two pairs, like prefix/soundex."""
    left = spark.createDataFrame(
        [(1, "Acme Corp"), (1, "Acme Corp")], "lid long, name string")
    right = spark.createDataFrame(
        [(10, "acme corp")], "rid long, name string")
    for mode in ("prefix", "soundex", "both"):
        out = blocked_fuzzy_join(left, right, "name", block=mode,
                                 block_len=4, max_distance=2).collect()
        assert len(out) == 2, mode
        assert all(r.distance == 0 for r in out)


def test_fuzzy_join_collision_suffix_and_validation(spark):
    left = spark.createDataFrame([(1, "abcd")], "id long, name string")
    right = spark.createDataFrame([(2, "abce")], "id long, name string")
    out = blocked_fuzzy_join(left, right, "name", block_len=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.id == 1 and r.id_r == 2 and r.distance == 1
    with pytest.raises(ValueError, match="block must be"):
        blocked_fuzzy_join(left, right, "name", block="hash")
    with pytest.raises(ValueError, match="block_len"):
        blocked_fuzzy_join(left, right, "name", block_len=0)
    with pytest.raises(ValueError, match="max_distance"):
        blocked_fuzzy_join(left, right, "name", max_distance=-1)


# ------------------------------------------- percentile rollup

def test_percentile_rollup_matches_numpy(spark):
    base = dt.datetime(2024, 3, 1)
    rng = np.random.RandomState(8)
    rows = []
    per_hour = {}
    for h in range(5):
        vals = [float(v) for v in rng.uniform(0, 100, size=97)]
        per_hour[h] = vals
        rows += [(base + dt.timedelta(hours=h, seconds=i * 30), v)
                 for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {int((r.bucket - base).total_seconds() // 3600): r
           for r in percentile_rollup(df, qs=[0.5, 0.95]).collect()}
    for h, vals in per_hour.items():
        s = np.sort(vals)
        # lower interpolation: order statistic at ceil(q*n)-1
        for q, col in ((0.5, "q_0_5"), (0.95, "q_0_95")):
            expect = s[max(int(np.ceil(q * len(s))) - 1, 0)]
            assert getattr(out[h], col) == pytest.approx(expect, abs=0)


def test_percentile_rollup_keys_and_validation(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [("a", base, 1.0), ("a", base, 3.0), ("b", base, 10.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {r.k: r for r in percentile_rollup(
        df, key_cols=["k"], qs=[0.5]).collect()}
    assert out["a"].q_0_5 == 1.0  # ceil(.5*2)-1 = index 0
    assert out["b"].q_0_5 == 10.0
    with pytest.raises(ValueError, match="grain"):
        percentile_rollup(df, grain="decade")
