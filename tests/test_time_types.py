"""Time-type matrix for the temporal joins: asof_join and
interval_join must produce identical matches whether the time column
arrives as TIMESTAMP, TIMESTAMP_NTZ, DATE, or STRING, under
repartitioning, including DST-boundary data in a DST-observing session
timezone. Ground truth is a Python brute force over the original
datetimes; ops/_time.py epoch_secs is the shared conversion under
test."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.asof import asof_join
from whylogs_spark.ops.intervals import interval_join

DAY_TYPES = ["timestamp", "timestamp_ntz", "date", "string"]
# DATE cannot carry hour granularity; the DST-hour matrix runs the rest
HOUR_TYPES = ["timestamp", "timestamp_ntz", "string"]


def _cast(df, col, t):
    if t == "string":
        return df.withColumn(col, F.col(col).cast("timestamp")
                             .cast("string"))
    return df.withColumn(col, F.col(col).cast(t))


# ------------------------------------------------------------ fixtures

def _day_points():
    # day-granular so every type (incl. DATE) represents the same value
    return [(i % 3, dt.datetime(2024, 3, 1 + (i * 7) % 28), i)
            for i in range(40)]


def _day_states():
    return [(k, dt.datetime(2024, 3, d), float(k * 100 + d))
            for k in range(3) for d in (2, 9, 16, 23)]


def _day_intervals():
    return [(j, j % 3, dt.datetime(2024, 3, 1 + j),
             dt.datetime(2024, 3, min(1 + j + 4, 29)))
            for j in range(20)]


def _hour_points():
    # straddle the US spring-forward (2024-03-10 02:00 local does not
    # exist in America/New_York); only EXISTING wall times are used so
    # every representation round-trips
    out = []
    i = 0
    for day in (9, 10, 11):
        for hour in (0, 1, 3, 5, 12, 23):
            out.append((i % 2, dt.datetime(2024, 3, day, hour, 30), i))
            i += 1
    return out


def _hour_states():
    return [(k, dt.datetime(2024, 3, d, h, 0), float(k * 10 + d + h))
            for k in range(2) for d in (9, 10, 11) for h in (1, 12)]


def _hour_intervals():
    return [(j, j % 2, dt.datetime(2024, 3, 9 + j % 3, 1, 0),
             dt.datetime(2024, 3, 9 + j % 3, 13, 0))
            for j in range(12)]


def _brute_asof(points, states):
    want = {}
    for k, t, i in points:
        best = None
        for k2, t2, v in states:
            if k2 == k and t2 <= t and (best is None or t2 > best[0]):
                best = (t2, v)
        want[i] = best[1] if best else None
    return want


def _brute_interval(points, intervals):
    return sorted((i, j) for k, t, i in points
                  for j, k2, s, e in intervals
                  if k == k2 and s <= t <= e)


def _with_tz(spark, tz):
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get("spark.sql.session.timeZone")
            spark.conf.set("spark.sql.session.timeZone", tz)

        def __exit__(self, *a):
            spark.conf.set("spark.sql.session.timeZone", self.prev)
    return _Ctx()


# ------------------------------------------------------------- asof

@pytest.mark.parametrize("ttype", DAY_TYPES)
def test_asof_day_granularity_type_matrix(spark, ttype):
    points, states = _day_points(), _day_states()
    L = _cast(spark.createDataFrame(
        points, "k long, ts timestamp, i long"), "ts", ttype) \
        .repartition(7)
    R = _cast(spark.createDataFrame(
        states, "k long, ts timestamp, v double"), "ts", ttype) \
        .repartition(5)
    out = asof_join(L, R, on="ts", by=["k"], value_cols=["v"])
    got = {r.i: r.v for r in out.collect()}
    assert got == _brute_asof(points, states), ttype


@pytest.mark.parametrize("ttype", HOUR_TYPES)
def test_asof_dst_boundary_type_matrix(spark, ttype):
    points, states = _hour_points(), _hour_states()
    with _with_tz(spark, "America/New_York"):
        L = _cast(spark.createDataFrame(
            points, "k long, ts timestamp, i long"), "ts", ttype) \
            .repartition(7)
        R = _cast(spark.createDataFrame(
            states, "k long, ts timestamp, v double"), "ts", ttype) \
            .repartition(3)
        out = asof_join(L, R, on="ts", by=["k"], value_cols=["v"])
        got = {r.i: r.v for r in out.collect()}
    assert got == _brute_asof(points, states), ttype


@pytest.mark.parametrize("ttype", HOUR_TYPES)
def test_asof_bucketed_dst_boundary_type_matrix(spark, ttype):
    """The two-phase hot-key plan shares epoch_secs with the single
    phase; its bucket-bridge logic must agree across types at the DST
    boundary too."""
    points, states = _hour_points(), _hour_states()
    with _with_tz(spark, "America/New_York"):
        L = _cast(spark.createDataFrame(
            points, "k long, ts timestamp, i long"), "ts", ttype)
        R = _cast(spark.createDataFrame(
            states, "k long, ts timestamp, v double"), "ts", ttype)
        out = asof_join(L, R, on="ts", by=["k"], value_cols=["v"],
                        hot_key_buckets="6 hours")
        got = {r.i: r.v for r in out.collect()}
    assert got == _brute_asof(points, states), ttype


# --------------------------------------------------------- interval

@pytest.mark.parametrize("ttype", DAY_TYPES)
def test_interval_day_granularity_type_matrix(spark, ttype):
    points, intervals = _day_points(), _day_intervals()
    L = _cast(spark.createDataFrame(
        points, "k long, ts timestamp, i long"), "ts", ttype) \
        .repartition(7)
    R = spark.createDataFrame(
        intervals, "j long, k long, start timestamp, end timestamp")
    R = _cast(_cast(R, "start", ttype), "end", ttype).repartition(5)
    for bucket in ("auto", "1 day", "3 days"):
        out = interval_join(L, R, on="ts", by=["k"], bucket=bucket)
        got = sorted((r.i, r.j) for r in
                     out.select("i", "j").collect())
        assert got == _brute_interval(points, intervals), \
            (ttype, bucket)


@pytest.mark.parametrize("ttype", HOUR_TYPES)
def test_interval_dst_boundary_type_matrix(spark, ttype):
    points, intervals = _hour_points(), _hour_intervals()
    with _with_tz(spark, "America/New_York"):
        L = _cast(spark.createDataFrame(
            points, "k long, ts timestamp, i long"), "ts", ttype) \
            .repartition(7)
        R = spark.createDataFrame(
            intervals, "j long, k long, start timestamp, end timestamp")
        R = _cast(_cast(R, "start", ttype), "end", ttype)
        for bucket in ("auto", "2 hours"):
            out = interval_join(L, R, on="ts", by=["k"], bucket=bucket)
            got = sorted((r.i, r.j) for r in
                         out.select("i", "j").collect())
            assert got == _brute_interval(points, intervals), \
                (ttype, bucket)
