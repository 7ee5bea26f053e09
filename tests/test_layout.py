"""Z-order layout keys (ops/layout.py): bit-interleave correctness vs a
Python Morton encoder, locality benefit vs single-column sort, null and
constant-column handling, zero-shuffle key projection."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops import layout


def _morton(vals, bits):
    z = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            z |= ((v >> j) & 1) << (j * len(vals) + i)
    return z


def test_zorder_key_matches_python_morton(spark):
    rows = [(i, float(i % 16), float((i * 7) % 16)) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    out = {r.id: r.zkey for r in
           layout.with_zorder_key(df, ["a", "b"], bits=4).collect()}
    # min=0, max=15 for both: normalization maps v -> floor(v/15*15)=v
    for i, a, b in rows:
        assert out[i] == _morton([int(a), int(b)], 4), i


def test_zorder_improves_multidim_locality(spark):
    # 32x32 grid; compare worst-file range spans under zorder vs
    # sorting by x alone, splitting into 16 equal files
    rows = [(x * 32 + y, float(x), float(y))
            for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    keyed = layout.with_zorder_key(df, ["x", "y"], bits=5).collect()
    by_z = sorted(keyed, key=lambda r: r.zkey)
    by_x = sorted(keyed, key=lambda r: (r.x, r.y))
    n_files = 16

    def max_span(order, attr):
        spans = []
        sz = len(order) // n_files
        for f in range(n_files):
            chunk = order[f * sz:(f + 1) * sz]
            vals = [getattr(r, attr) for r in chunk]
            spans.append(max(vals) - min(vals))
        return max(spans)

    # x-sort: y spans the whole range in every file; zorder bounds both
    assert max_span(by_x, "y") == 31.0
    assert max_span(by_z, "x") <= 16.0
    assert max_span(by_z, "y") <= 16.0


def test_zorder_nulls_and_constant_columns(spark):
    rows = [(0, None, 5.0), (1, 1.0, 5.0), (2, 9.0, 5.0)]
    df = spark.createDataFrame(rows, "id long, a double, c double")
    out = {r.id: r.zkey for r in
           layout.with_zorder_key(df, ["a", "c"], bits=4).collect()}
    # null normalizes to the minimum -> same key as the min row
    assert out[0] == out[1]
    # constant column contributes nothing: keys still ordered by a
    assert out[0] < out[2]


def test_zorder_key_projection_is_shuffle_free(spark):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"))
    out = layout.with_zorder_key(df, ["a", "b"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # only the 1-row bounds agg exchanges; no shuffle of the data rows
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_cluster_by_zorder_partitions_are_key_ranges(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 50).cast("double").alias("a"),
        ((F.col("id") * 13) % 50).cast("double").alias("b"))
    clustered = layout.cluster_by_zorder(df, ["a", "b"], n_partitions=8)
    parts = clustered.select("zkey").rdd.glom().collect()
    ranges = [(p[0].zkey, p[-1].zkey) for p in parts if p]
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, ordered ranges


def test_zorder_rejects_too_many_bits(spark):
    df = spark.range(3).select(
        *[F.col("id").cast("double").alias(f"c{i}") for i in range(8)])
    with pytest.raises(ValueError):
        layout.with_zorder_key(df, [f"c{i}" for i in range(8)], bits=8)
