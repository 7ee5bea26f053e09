"""Streaming frequent items: live top-k value monitoring.

The batch ``frequent_items`` metric (core/sketches.py Misra-Gries,
reference analog ``core/metrics/metrics.py`` FrequentItemsMetric) answers
"what are the most common values" over a finished table; a streaming
ingest pipeline wants the same answer per event-time window while rows
arrive. Split the work the way the calibration monitor does
(streaming/model_monitor.py): the STREAM carries one watermarked
stateful aggregation producing per-(window, value) sufficient counts —
the only shape Structured Streaming aggregates natively — and the
top-k rank runs as a tiny batch rollup on the sink side.

State bound: distinct values per open window (the same class of bound
as ``streaming_exact_dedup``'s fingerprint store — watermark eviction
keeps it to the horizon, and ``truncate`` caps per-entry size). For
genuinely unbounded-cardinality columns (user ids, URLs) exact
counting is the wrong tool at 100 TB — hash the column down first or
run the batch Misra-Gries path per microbatch; this operator targets
the categorical/enum columns frequent-items is actually used on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streaming_value_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    truncate: int = 128,
) -> DataFrame:
    """Per (event-time window, value) counts of a column on a stream.

    Nulls are excluded (the counts metric tracks them separately);
    values cast to string and truncate to ``truncate`` chars so a
    pathological document-sized value cannot bloat the state store.

    Plan shape (audited with the other streaming sections): watermark
    -> partial agg -> ONE exchange on the state key -> stateful final
    agg; no Python anywhere.
    """
    if truncate < 1:
        raise ValueError("truncate must be >= 1")
    v = F.substring(F.col(value_col).cast("string"), 1, truncate)
    src = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .filter(F.col(value_col).isNotNull())
    )
    out = (
        src.groupBy(F.window(F.col(ts_col), window_duration),
                    v.alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "value", "n")


def frequent_from_counts(counts_df: DataFrame, k: int = 32) -> DataFrame:
    """Top-``k`` values per window from the per-(window, value) counts
    — run on the SINK (a plain batch frame), not the stream. Ties
    break by value ascending, so ranks are deterministic. Adds
    ``rank`` and ``frac`` (share of the window's counted rows).

    Robust to update-mode append sinks: a (window, value) key
    re-emitted across microbatches appears once per emission with its
    CUMULATIVE count, so the rollup first keeps ``max(n)`` per key —
    the latest emission — instead of ranking (and denominating) the
    stale partials. A complete-mode or last-wins sink passes through
    unchanged."""
    if k < 1:
        raise ValueError("k must be >= 1")
    latest = counts_df.groupBy(
        "window_start", "window_end", "value").agg(F.max("n").alias("n"))
    w = Window.partitionBy("window_start", "window_end")
    ranked = latest.withColumn(
        "rank",
        F.row_number().over(
            w.orderBy(F.col("n").desc(), F.col("value").asc()))
    ).withColumn("frac", F.col("n") / F.sum("n").over(w))
    return ranked.filter(F.col("rank") <= k)
