"""Streaming model-performance monitor: windowed calibration +
accuracy over an event-time prediction stream.

The reference computes model-perf metrics on static frames
(python/whylogs/core/model_performance_metrics/confusion_matrix.py:43,
regression_metrics.py:7); a serving pipeline wants them continuously
per time window. Spark-first: ONE watermarked stateful aggregation
keyed by (event-time window, confidence bin) — map-side partial agg,
bounded state (windows x n_bins rows live until the watermark closes
them), no Python in the hot path. The per-bin rows are the sufficient
statistics: ECE/MCE/accuracy per window are a tiny batch rollup over
the sink table (``calibration_from_bins``), so the stream never
recomputes history and a dashboard reads the rollup straight off the
store.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_model_bins(
    stream_df: DataFrame,
    ts_col: str = "ts",
    score_col: str = "score",
    label_col: str = "label",
    prediction_col: Optional[str] = None,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    n_bins: int = 10,
) -> DataFrame:
    """Per (event-time window, confidence bin) sufficient statistics:
    ``n``, ``n_pos`` (label sum), ``sum_score``, and ``n_correct``
    when ``prediction_col`` is given. Null AND NaN scores/labels are
    excluded (same contract as ``expected_calibration_error`` — a NaN
    score would poison the window's ``sum_score`` while
    ``confidence_bin`` floors it into bin 0, silently diverging from
    the batch metric); scores clamp into [0, 1] bins with 1.0 in the
    last bin.

    Plan shape (asserted by the streaming section of the plan audit
    family): watermark -> partial agg -> ONE exchange on the state key
    -> stateful final agg.
    """
    from ..core.model_perf import confidence_bin

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    b = confidence_bin(s, n_bins)
    src = (
        # watermarks require TIMESTAMP; NTZ sources cast first (same
        # normalization as streaming_profile, rolling.py:67)
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .filter(s.isNotNull() & y.isNotNull()
                & ~F.isnan(s) & ~F.isnan(y))
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        F.sum(s).alias("sum_score"),
    ]
    if prediction_col is not None:
        aggs.append(
            F.sum((F.col(prediction_col) == F.col(label_col))
                  .cast("long")).alias("n_correct"))
    out = (
        src.groupBy(F.window(F.col(ts_col), window_duration),
                    b.alias("bin"))
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "bin", *[c for c in out.columns if c not in ("window", "bin")])


def calibration_from_bins(bins_df: DataFrame) -> DataFrame:
    """Roll the per-bin sufficient statistics up to one row per
    window: ``ece``, ``mce``, ``n``, plus ``accuracy`` when the bins
    carry ``n_correct``. A plain batch aggregation over the (tiny)
    bins table — run it on the sink, not the stream."""
    has_correct = "n_correct" in bins_df.columns
    acc = F.col("n_pos") / F.col("n")
    conf = F.col("sum_score") / F.col("n")
    gap = F.abs(acc - conf)
    per_win = bins_df.groupBy("window_start", "window_end")
    aggs = [
        (F.sum(F.col("n") * gap) / F.sum("n")).alias("ece"),
        F.max(gap).alias("mce"),
        F.sum("n").cast("long").alias("n"),
    ]
    if has_correct:
        aggs.append(
            (F.sum("n_correct") / F.sum("n")).alias("accuracy"))
    return per_win.agg(*aggs)
