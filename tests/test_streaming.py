"""Streaming profiles: tumbling-window aggregation + rolling sink.

FIXTURES.md F7: tumbling-window profiles vs batch profiles of the same
time slices must merge-match.
"""

import json
import tempfile

import pytest
from pyspark.sql import functions as F

import whylogs_spark as wsp
from whylogs_spark.streaming.rolling import RollingProfileSink, streaming_profile


@pytest.fixture(scope="module")
def events_stream_src(spark, events, tmp_path_factory):
    """Write events out as several files, then stream-read them back."""
    src = str(tmp_path_factory.mktemp("events_src"))
    events.repartition(4).write.mode("overwrite").parquet(src)
    return src


def test_streaming_native_profile_matches_batch(spark, events,
                                                events_stream_src):
    stream = spark.readStream.schema(
        spark.read.parquet(events_stream_src).schema
    ).option("maxFilesPerTrigger", 2).parquet(events_stream_src)

    out = streaming_profile(
        stream, ts_col="ts", window_duration="1 day",
        watermark="0 seconds", columns=["value"])
    q = (
        out.writeStream.format("memory").queryName("prof")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT window_start, n FROM prof "
        "WHERE metric='counts' AND component='n' AND column='value'"
    ).collect()
    truth = {
        str(r["d"]): r["n"]
        for r in events.groupBy(
            F.date_trunc("day", F.col("ts")).cast("string").alias("d"))
        .count().withColumnRenamed("count", "n").collect()
    }
    got_map = {r["window_start"]: r["n"] for r in got}
    assert got_map == truth


def test_rolling_sink_merges_to_batch_profile(spark, events,
                                              events_stream_src, tmp_path):
    stream = spark.readStream.schema(
        spark.read.parquet(events_stream_src).schema
    ).option("maxFilesPerTrigger", 1).parquet(events_stream_src)

    sink_path = str(tmp_path / "profiles")
    ckpt = str(tmp_path / "ckpt")
    sink = RollingProfileSink(
        sink_path, ts_col="ts", window="1 day", columns=["value"])
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    view = sink.read_profiles(spark)
    rows = view.df.filter(
        (F.col("metric") == "distribution") & (F.col("component") == "mean")
    ).collect()
    truth = {
        str(r["d"]): r["m"]
        for r in events.groupBy(
            F.date_trunc("day", F.col("ts")).cast("string").alias("d"))
        .agg(F.avg("value").alias("m")).collect()
    }
    assert len(rows) == len(truth)
    for r in rows:
        ws = json.loads(r["segment"])["__wstart"]
        assert r["d"] == pytest.approx(truth[ws], rel=1e-9), ws


def test_rolling_sink_segmented(spark, events, events_stream_src, tmp_path):
    """Segment x window rolling profiles merge-on-read to the batch truth
    (reference SegmentCache semantics, segment_cache.py)."""
    stream = spark.readStream.schema(
        spark.read.parquet(events_stream_src).schema
    ).option("maxFilesPerTrigger", 1).parquet(events_stream_src)

    sink_path = str(tmp_path / "profiles_seg")
    ckpt = str(tmp_path / "ckpt_seg")
    sink = RollingProfileSink(
        sink_path, ts_col="ts", window="1 day",
        segment_by=["event_type"], columns=["value"])
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)

    view = sink.read_profiles(spark)
    got = {
        r["segment"]: r["n"]
        for r in view.df.filter(
            (F.col("metric") == "counts") & (F.col("component") == "n")
        ).collect()
    }
    truth = events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("string").alias("w"),
        "event_type").count().collect()
    import json
    truth_map = {}
    for r in truth:
        truth_map[(r["w"], r["event_type"])] = r["count"]
    total_got = sum(got.values())
    assert total_got == sum(truth_map.values())
    # every (window, segment) pair present with the right count
    for seg_json, n in got.items():
        d = json.loads(seg_json)
        key = (d["__wstart"], d["event_type"])
        assert truth_map[key] == n, (key, n)
    assert len(got) == len(truth_map)
