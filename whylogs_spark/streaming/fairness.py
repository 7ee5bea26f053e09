"""Streaming fairness monitoring: continuous per-group selection
rates and demographic-parity gaps.

A production classifier whose selection rate drifts apart across a
protected attribute should page before the quarterly audit does.  The
stream carries ONE watermarked windowed aggregation producing
per-(window, group) decision counts — the native Structured Streaming
shape shared with ``streaming/experiment.py`` — and the gap math runs
as a tiny batch rollup over the sink (``fairness_from_counts``, the
same definitions as ``ops.fairness.fairness_report``'s selection-rate
block).

State bound: groups per open window, evicted by the watermark.  No
Python in the stream.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_decision_counts", "fairness_from_counts"]


def streaming_decision_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "group",
    pred_col: str = "pred",
    groups: Optional[Sequence[str]] = None,
    window_duration: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per (event-time window, group) decision counts on a stream:
    ``(window_start, window_end, group, n, n_selected)``.  Rows with
    a null event time, group, or prediction drop before the
    watermark; with ``groups`` given, other values filter at the scan
    (recommended — junk labels would otherwise grow the state key
    space)."""
    g = F.col(group_col).cast("string")
    p = F.col(pred_col).cast("boolean")
    src = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .filter(F.col(ts_col).isNotNull() & g.isNotNull()
                & p.isNotNull())
    )
    if groups is not None:
        src = src.filter(g.isin([str(x) for x in groups]))
    out = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration),
                 g.alias("group"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(p.cast("long")).alias("n_selected"))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "group", "n", "n_selected")


def fairness_from_counts(
    counts_df: DataFrame,
    reference_group: str,
) -> DataFrame:
    """Batch rollup over a :func:`streaming_decision_counts` sink:
    one row per (window, group) with the selection rate, the
    demographic-parity diff, and the four-fifths disparate-impact
    ratio vs ``reference_group`` — identical definitions to
    ``ops.fairness.fairness_report``.  An update-mode sink may carry
    several emissions per (window, group): the LATEST (max)
    cumulative counts win, the shared sink convention.  Windows where
    the reference group has no rows emit null gaps (nothing to
    compare against — surface, don't guess).

    Returns ``(window_start, window_end, group, n, n_selected,
    selection_rate, reference_group, demographic_parity_diff,
    disparate_impact)``."""
    latest = counts_df.groupBy(
        "window_start", "window_end", "group").agg(
        F.max("n").alias("n"),
        F.max("n_selected").alias("n_selected"))
    rates = latest.withColumn(
        "selection_rate",
        F.col("n_selected").cast("double") / F.col("n"))
    # rename the self-join side's keys: both branches descend from
    # the same sink frame, and same-name attributes would conflict
    ref = (rates.filter(F.col("group") == F.lit(str(reference_group)))
           .select(F.col("window_start").alias("__ws"),
                   F.col("window_end").alias("__we"),
                   F.col("selection_rate").alias("__sel_ref")))
    out = rates.join(
        F.broadcast(ref),
        (F.col("window_start") == F.col("__ws"))
        & (F.col("window_end") == F.col("__we")), "left")
    return out.select(
        "window_start", "window_end", "group", "n", "n_selected",
        "selection_rate",
        F.lit(str(reference_group)).alias("reference_group"),
        (F.col("selection_rate") - F.col("__sel_ref"))
        .alias("demographic_parity_diff"),
        F.try_divide(F.col("selection_rate"),
                     F.when(F.col("__sel_ref") > 0,
                            F.col("__sel_ref")))
        .alias("disparate_impact"))
