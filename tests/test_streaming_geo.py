"""Streaming grid density: windowed per-cell counts equal the batch
grouping, invalid coordinates drop, validation."""

import datetime

from whylogs_spark.streaming.geo import streaming_grid_density

BASE = datetime.datetime(2024, 7, 1)


def _t(m):
    return BASE + datetime.timedelta(minutes=m)


def test_streaming_grid_density_counts(spark, tmp_path):
    schema = "lat double, lon double, ts timestamp"
    rows = [
        # three points in one cell (cell_deg=1: lat 10.x, lon 20.x)
        (10.2, 20.3, _t(5)), (10.7, 20.9, _t(10)), (10.1, 20.1, _t(20)),
        # one point one cell east
        (10.5, 21.5, _t(15)),
        # next hour window, same first cell
        (10.4, 20.4, _t(70)),
        # invalid rows drop
        (float("nan"), 20.0, _t(5)), (95.0, 20.0, _t(5)),
        (10.0, 200.0, _t(5)),
    ]
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "src")
    df.coalesce(1).write.parquet(d + "/b=0")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d + "/*"))

    out = streaming_grid_density(
        stream, cell_deg=1.0, window="1 hour",
        watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("gdens")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(240)

    got = {(r["window_start"], r["cell_x"], r["cell_y"]): r
           for r in spark.sql("SELECT * FROM gdens").collect()}
    w0, w1 = BASE, BASE + datetime.timedelta(hours=1)
    # cell for lat 10.x lon 20.x at 1 deg: ix=200, iy=100
    assert got[(w0, 200, 100)]["n"] == 3
    assert got[(w0, 201, 100)]["n"] == 1
    assert got[(w1, 200, 100)]["n"] == 1
    assert len(got) == 3
    c = got[(w0, 200, 100)]
    assert c["lat_center"] == 10.5 and c["lon_center"] == 20.5


def test_streaming_grid_density_validation(spark):
    import pytest

    df = spark.createDataFrame([], "lat double, lon double, ts timestamp")
    with pytest.raises(ValueError, match="cell_deg"):
        streaming_grid_density(df, cell_deg=0)
    with pytest.raises(ValueError, match="columns not in"):
        streaming_grid_density(df, lat_col="nope")
