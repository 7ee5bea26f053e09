"""Streaming geospatial grid density: windowed point counts per grid
cell — the live heat-map feed (fleet density, demand hot spots,
geo-anomaly inputs) and the streaming sibling of the batch
``ops/geo.grid_density``.

Pure native streaming: one event-time window + grid-cell groupBy —
watermarked, stateful ONLY in the windowed aggregate (bounded by
active windows x occupied cells), no Python on the data path.  Cell
ids use the same flat-grid convention as ``ops/geo.py`` (floor of
shifted degrees), so batch and streaming heat maps align cell for
cell at equal ``cell_deg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_grid_density"]


def streaming_grid_density(
    stream: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    ts_col: str = "ts",
    cell_deg: float = 0.5,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """-> update/complete-mode stream: one row per (time window,
    occupied cell): ``(window_start, window_end, cell_x, cell_y,
    lat_center, lon_center, n)``.

    Rows with null/NaN/out-of-range coordinates or null timestamps
    drop (same validity rule as the batch grid ops).
    """
    if cell_deg <= 0:
        raise ValueError(f"cell_deg must be > 0: {cell_deg}")
    missing = [c for c in (lat_col, lon_col, ts_col)
               if c not in stream.columns]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    base = (stream
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .filter(F.col(ts_col).isNotNull()
                    & lat.isNotNull() & lon.isNotNull()
                    & ~F.isnan(lat) & ~F.isnan(lon)
                    & (F.abs(lat) <= 90.0) & (F.abs(lon) <= 180.0))
            .withWatermark(ts_col, watermark))
    ix = F.floor((lon + 180.0) / F.lit(cell_deg)).cast("long")
    iy = F.floor((lat + 90.0) / F.lit(cell_deg)).cast("long")
    out = (base
           .groupBy(F.window(F.col(ts_col), window).alias("__w"),
                    ix.alias("cell_x"), iy.alias("cell_y"))
           .agg(F.count(F.lit(1)).alias("n")))
    half = F.lit(cell_deg / 2.0)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "cell_x", "cell_y",
        (F.col("cell_y").cast("double") * F.lit(cell_deg)
         - F.lit(90.0) + half).alias("lat_center"),
        (F.col("cell_x").cast("double") * F.lit(cell_deg)
         - F.lit(180.0) + half).alias("lon_center"),
        "n")
