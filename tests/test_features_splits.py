import hashlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from whylogs_spark.ops.features import trailing_features
from whylogs_spark.ops.sampling import (kfold_assign, negative_sampling,
                                        rolling_origin_splits)


def test_trailing_features_matches_numpy(spark):
    rng = np.random.RandomState(5)
    rows = []
    for uid in range(8):
        t = 0.0
        for i in range(25):
            t += float(rng.randint(3600, 86400 * 3))
            rows.append((uid, t, float(rng.rand())))
    # tie: two events at the same instant must not see each other
    rows.append((0, rows[0][1], 99.0))
    df = spark.createDataFrame(rows, "u long, ts double, v double")
    out = trailing_features(df, "u", "ts", "v",
                            windows_sec=(86400 * 7,)).collect()
    byrow = {(r.u, r.ts, r.v): r for r in out}
    for u, ts, v in rows:
        past = [(t2, v2) for u2, t2, v2 in rows
                if u2 == u and t2 < ts]
        win = [(t2, v2) for t2, v2 in past if t2 >= ts - 86400 * 7]
        r = byrow[(u, ts, v)]
        assert r.cnt_7d == len(win)
        if win:
            assert r.sum_7d == pytest.approx(
                sum(v2 for _, v2 in win), abs=1e-12)
            assert r.avg_7d == pytest.approx(
                sum(v2 for _, v2 in win) / len(win), abs=1e-12)
        else:
            assert r.sum_7d is None and r.avg_7d is None
        assert r.prior_events == len(past)
        if past:
            assert r.seconds_since_prev == pytest.approx(
                ts - max(t2 for t2, _ in past), abs=1e-9)
        else:
            assert r.seconds_since_prev is None
    # the planted same-instant pair: both see zero of each other
    twins = [r for r in out if r.u == 0 and r.ts == rows[0][1]]
    assert len(twins) == 2
    assert all(t.cnt_7d == 0 and t.prior_events == 0 for t in twins)
    with pytest.raises(ValueError, match="windows"):
        trailing_features(df, "u", "ts", "v", windows_sec=())


def test_kfold_assign(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(2000)], "id long, grp long")
    out = kfold_assign(df, ["id"], 5)
    folds = out.groupBy("fold").count().collect()
    assert {r.fold for r in folds} == set(range(5))
    # uniform in expectation
    for r in folds:
        assert 300 < r["count"] < 500
    # matches the md5 interval arithmetic exactly
    for row in out.limit(50).collect():
        h = int(hashlib.md5(str(row.id).encode()).hexdigest()[:8], 16)
        assert row.fold == min(int(h / 16 ** 8 * 5), 4)
    # grouped k-fold: keying on the group puts all its rows together
    g = kfold_assign(df, ["grp"], 3)
    assert (g.groupBy("grp")
            .agg(F.countDistinct("fold").alias("k")).agg(
                F.max("k")).collect()[0][0]) == 1
    with pytest.raises(ValueError, match="k must"):
        kfold_assign(df, ["id"], 1)


def test_rolling_origin_splits(spark):
    rows = [(float(d * 86400),) for d in range(30)]
    df = spark.createDataFrame(rows, "ts double")
    out = rolling_origin_splits(df, "ts", n_splits=3,
                                horizon_sec=5 * 86400.0)
    got = {(r.split_id, r.role, r.ts) for r in out.collect()}
    tmax = 29 * 86400.0
    for i in (1, 2, 3):
        t0 = tmax - 5 * 86400.0 * (3 - i + 1)
        t1 = tmax - 5 * 86400.0 * (3 - i)
        train = {t for (t,) in rows if t < t0}
        if i == 3:
            test = {t for (t,) in rows if t0 <= t <= t1}
        else:
            test = {t for (t,) in rows if t0 <= t < t1}
        assert {t for s, r, t in got if s == i and r == "train"} == train
        assert {t for s, r, t in got if s == i and r == "test"} == test
    # no leakage: every train row strictly precedes its split's tests
    for i in (1, 2, 3):
        tr = [t for s, r, t in got if s == i and r == "train"]
        te = [t for s, r, t in got if s == i and r == "test"]
        assert max(tr) < min(te)
    with pytest.raises(ValueError, match="horizon"):
        rolling_origin_splits(df, "ts", 3, 0.0)


def test_negative_sampling(spark):
    rng = np.random.RandomState(9)
    rows = [(int(u), f"item{rng.randint(0, 40)}")
            for u in range(60) for _ in range(6)]
    df = spark.createDataFrame(rows, "u long, it string")
    out = negative_sampling(df, "u", "it", n_neg=3, max_catalog=40,
                            salt="s").collect()
    pos = {(str(u), it) for u, it in rows}
    # reproduce the draw: catalog = items by (count desc, item asc)
    from collections import Counter
    cnt = Counter(it for _, it in {(u, it) for u, it in rows})
    catalog = [it for it, _ in sorted(
        cnt.items(), key=lambda kv: (-kv[1], kv[0]))][:40]
    expected = set()
    for u, it in {(str(u), it) for u, it in rows}:
        for j in (1, 2, 3):
            h = int(hashlib.md5(
                f"{u}|{it}|{j}|s".encode()).hexdigest()[:15], 16)
            neg = catalog[h % len(catalog)]
            if (u, neg) not in pos:
                expected.add((u, it, neg, j))
    got = {(r.user, r.item, r.neg_item, r.neg_rank) for r in out}
    assert got == expected
    # no negative is ever a positive for its user
    assert all((u, n) not in pos for u, _, n, _ in got)
    with pytest.raises(ValueError, match="n_neg"):
        negative_sampling(df, "u", "it", n_neg=0)
