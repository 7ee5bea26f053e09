"""Streaming experiment-health monitoring: continuous SRM.

A sample-ratio mismatch (broken assignment / logging) should page the
experiment owner within minutes, not at readout time. The stream
carries ONE watermarked windowed aggregation producing per-(window,
arm) counts — the only shape Structured Streaming aggregates natively
(same split as streaming/frequent.py and model_monitor.py) — and the
chi-square goodness-of-fit against the designed allocation runs as a
tiny batch rollup over the sink (``srm_from_counts``, shared with the
batch ``ops.abtest.srm_check`` semantics).

State bound: arms per open window (a handful), evicted by the
watermark. No Python in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_arm_counts", "srm_from_counts"]


def streaming_arm_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "arm",
    arms=None,
    window_duration: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per (event-time window, arm) assignment counts on a stream:
    ``(window_start, window_end, arm, n)``. Rows with a null event
    time or null arm are dropped before the watermark; with ``arms``
    given, other values are filtered at the scan (recommended — a
    buggy client emitting junk labels would otherwise grow the state
    key space)."""
    g = F.col(group_col).cast("string")
    src = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .filter(F.col(ts_col).isNotNull() & g.isNotNull())
    )
    if arms is not None:
        src = src.filter(g.isin([str(a) for a in arms]))
    out = (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration),
                 g.alias("arm"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "arm", "n")


def srm_from_counts(counts_df: DataFrame, expected: dict) -> DataFrame:
    """Batch rollup over a :func:`streaming_arm_counts` sink: one row
    per window with the SRM chi-square against the designed
    allocation — identical statistic to ``ops.abtest.srm_check``.
    Arms in ``expected`` with no rows in a window count as 0 (every
    window joins the full arm spine); arms outside ``expected`` are
    ignored. An update-mode sink may carry several emissions per
    (window, arm) — the LATEST (max) cumulative count wins, matching
    ``frequent_from_counts``.

    Returns ``(window_start, window_end, n_total, chi2, dof)`` plus
    per-arm ``n_<arm>`` columns; feed chi2/dof to
    ``core.drift.chi2_sf``."""
    arms = list(expected)
    if len(arms) < 2:
        raise ValueError("expected must name at least 2 arms")
    if len({str(a) for a in arms}) != len(arms):
        raise ValueError(
            f"arm names collide after str(): {sorted(map(str, arms))}")
    tot = float(sum(expected.values()))
    if tot <= 0:
        raise ValueError("expected ratios must sum to > 0")
    fracs = {a: float(expected[a]) / tot for a in arms}
    if any(f <= 0 for f in fracs.values()):
        raise ValueError("every expected ratio must be > 0")
    latest = (
        counts_df.filter(
            F.col("arm").isin([str(a) for a in arms]))
        .groupBy("window_start", "window_end", "arm")
        .agg(F.max("n").alias("n"))
    )

    def armcol(a):
        return F.col("`n_" + str(a).replace("`", "``") + "`")

    pivoted = latest.groupBy("window_start", "window_end").agg(
        *[F.coalesce(
            F.max(F.when(F.col("arm") == F.lit(str(a)),
                         F.col("n"))), F.lit(0))
          .alias(f"n_{a}") for a in arms])
    n_total = None
    for a in arms:
        n_total = armcol(a) if n_total is None else n_total + armcol(a)
    pivoted = pivoted.withColumn("n_total", n_total)
    nt = F.col("n_total").cast("double")
    chi2 = None
    for a in arms:
        exp_a = nt * F.lit(fracs[a])
        term = (armcol(a).cast("double") - exp_a) ** 2 / exp_a
        chi2 = term if chi2 is None else chi2 + term
    return pivoted.select(
        "window_start", "window_end", "n_total",
        *[armcol(a) for a in arms],
        F.when(nt > 0, chi2).alias("chi2"),
        F.lit(len(arms) - 1).alias("dof"),
    )
