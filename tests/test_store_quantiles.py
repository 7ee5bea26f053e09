"""Rolling KLL quantile series off the profile store: every window's
merged-sketch quantile must sit within the sketch's deterministic
rank-error bound of the exact percentile over that window's raw
union, and counts must be exact."""

import datetime as dt

import numpy as np
import pytest

import whylogs_spark as wsp
from whylogs_spark.io.store import ProfileStore

RNG = np.random.RandomState(13)
N_BATCH = 2000
N_DAYS = 12
WINDOW = 4


@pytest.fixture(scope="module")
def series_store(spark, tmp_path_factory):
    """12 daily batches whose distribution shifts upward over time."""
    d = tmp_path_factory.mktemp("qstore")
    store = ProfileStore(str(d / "profiles"))
    raw = {}
    for day in range(N_DAYS):
        vals = RNG.normal(100.0 + 5.0 * day, 10.0, N_BATCH)
        raw[day] = vals
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "x double")
        store.write(wsp.profile(df), "metrics",
                    dt.datetime(2024, 3, 1 + day,
                                tzinfo=dt.timezone.utc))
    return store, raw


def test_window_counts_exact(spark, series_store):
    store, raw = series_store
    out = store.quantile_series(
        spark, "metrics", "x", quantiles=(0.5, 0.95),
        window=WINDOW).orderBy("dataset_ts").collect()
    assert len(out) == N_DAYS
    for i, r in enumerate(out):
        k = min(i + 1, WINDOW)
        assert r["batches"] == k, i
        assert r["n"] == k * N_BATCH, i
        assert r["dataset_ts"].day == 1 + i


def test_window_quantiles_within_bounds(spark, series_store):
    store, raw = series_store
    out = store.quantile_series(
        spark, "metrics", "x", quantiles=(0.25, 0.5, 0.95),
        window=WINDOW).orderBy("dataset_ts").collect()
    # KLL k=256 normalized rank error ~ 1.65%; allow 2x for the merge
    eps = 0.033
    for i, r in enumerate(out):
        days = range(max(0, i - WINDOW + 1), i + 1)
        union = np.sort(np.concatenate([raw[d] for d in days]))
        n = len(union)
        for q, col in ((0.25, "q_25"), (0.5, "q_50"), (0.95, "q_95")):
            lo = union[max(0, int(np.floor((q - eps) * n)) - 1)]
            hi = union[min(n - 1, int(np.ceil((q + eps) * n)))]
            assert lo <= r[col] <= hi, (i, q, r[col], lo, hi)


def test_rolling_tracks_shift(spark, series_store):
    store, _ = series_store
    out = store.quantile_series(
        spark, "metrics", "x", quantiles=(0.5,),
        window=WINDOW).orderBy("dataset_ts").collect()
    medians = [r["q_50"] for r in out]
    # the distribution shifts +5/day; the rolling median must rise
    assert medians[-1] > medians[0] + 20


def test_window_one_is_per_batch(spark, series_store):
    store, raw = series_store
    out = store.quantile_series(
        spark, "metrics", "x", quantiles=(0.5,),
        window=1).orderBy("dataset_ts").collect()
    assert all(r["batches"] == 1 and r["n"] == N_BATCH for r in out)


def test_validation(spark, series_store):
    store, _ = series_store
    with pytest.raises(ValueError, match="window"):
        store.quantile_series(spark, "metrics", "x", window=0)
    with pytest.raises(ValueError, match="quantiles"):
        store.quantile_series(spark, "metrics", "x", quantiles=(1.5,))
