"""Metric time-series anomaly monitoring over stored profiles.

The reference ships profiles to a monitoring backend that flags
per-batch metric deviations against a trailing baseline and alerts on
missing batches (whylogs itself only writes the profiles; see the store
it feeds, reference python/whylogs/api/store/sqlite_store.py:13-119).
This module answers those monitoring questions engine-side, over any
metric time series — including the ones ``ProfileStore`` persists.

Spark-first shape: every baseline is a bounded trailing ROW window
partitioned by the series key — ``rowsBetween(-window, -1)`` buffers at
most ``window`` values per row, so state is O(window) regardless of
corpus size, and the only exchange is the hash partition on the series
key. A monitoring store holds one row per (column, metric, batch), so
even years of hourly batches are tiny next to the data that produced
them; the scan parallelizes across series keys.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType

__all__ = ["anomaly_scan", "missing_periods", "cusum_changepoints"]

_METHODS = ("zscore", "mad", "iqr")


def _q7(arr: Column, p: float) -> Column:
    """Type-7 (linear interpolation) quantile of a sorted array column
    — numpy/DuckDB ``quantile_cont`` convention, so tests can pin the
    exact value cross-engine. Null on an empty array (warm-up rows have
    an empty frame and are masked downstream) — ``F.get`` is 0-based
    and null-safe, so no ANSI index error fires on the masked rows."""
    n = F.size(arr)
    h = (n.cast("double") - F.lit(1.0)) * F.lit(float(p))
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    a_lo = F.get(arr, lo)
    # least() keeps the upper index in bounds when h lands exactly on
    # the last element (frac == 0), where lo + 1 would overflow
    a_hi = F.get(arr, F.least(lo + F.lit(1), n - F.lit(1)))
    return a_lo + frac * (a_hi - a_lo)


def anomaly_scan(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Optional[List[str]] = None,
    window: int = 7,
    method: str = "zscore",
    threshold: Optional[float] = None,
    min_baseline: int = 3,
    phase_col: Optional[str] = None,
) -> DataFrame:
    """Flag per-batch anomalies of a metric time series against a
    trailing baseline of the previous ``window`` batches.

    ``phase_col`` makes the baseline seasonal: each batch is judged
    only against trailing batches with the SAME phase value (e.g. a
    day-of-week column compares Mondays to previous Mondays, so a
    weekly traffic dip stops reading as an anomaly). The phase is an
    explicit column rather than an inferred index so missing batches
    can't shift the season.

    ``method``:
      - ``zscore``: baseline mean/sample-stddev; anomaly when
        ``|value - mean| > threshold * stddev`` (default threshold 3).
      - ``mad``: baseline median / scaled median-absolute-deviation
        (x1.4826, the normal-consistent estimator); anomaly when
        ``|value - median| > threshold * 1.4826 * MAD`` (default 3).
        Robust to outliers *inside* the baseline window.
      - ``iqr``: Tukey fences — anomaly when value falls outside
        ``[q1 - threshold*IQR, q3 + threshold*IQR]`` (default 1.5).
        Quantiles are type-7, matching numpy/DuckDB ``quantile_cont``.

    Returns one row per input row: key columns, ``ts_col``, ``value``,
    ``baseline_n`` (batches actually in the window), ``center``,
    ``spread``, ``score`` (signed deviations in spread units; null for
    ``iqr`` and for a zero-spread baseline), ``is_anomaly`` (null until
    ``min_baseline`` batches of history exist — warm-up rows are
    *unjudged*, not normal). A zero-spread baseline flags any value
    different from the center rather than dividing by zero.

    Scale: the window is ROW-bounded (≤ ``window`` values buffered per
    row) and partitioned by the series key, so per-task memory is
    O(window) and the one exchange hash-partitions on the key. With
    ``key_cols=None`` the whole input is ONE series — only sound for a
    single bounded metric stream (e.g. one column's daily mean), which
    is what a monitoring store holds per key; prefer passing keys.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, "
                         f"got {method!r}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_baseline < 2:
        # one baseline point has no spread (sample stddev/IQR of a
        # singleton is null/0); judging against it is noise
        raise ValueError(f"min_baseline must be >= 2, got {min_baseline}")
    if threshold is None:
        threshold = 1.5 if method == "iqr" else 3.0
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")

    keys = list(key_cols or [])
    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    if phase_col is not None:
        part = part + [F.col(phase_col)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(ts_col))
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    out = df.withColumn("__v", v)
    out = out.withColumn("baseline_n", F.count("__v").over(w))

    if method == "zscore":
        out = (
            out.withColumn("center", F.avg("__v").over(w))
            .withColumn("spread", F.stddev_samp("__v").over(w))
        )
    else:
        arr = F.array_sort(F.collect_list("__v").over(w))
        out = out.withColumn("__arr", arr)
        med = _q7(F.col("__arr"), 0.5)
        if method == "mad":
            devs = F.array_sort(
                F.transform(F.col("__arr"), lambda x: F.abs(x - med)))
            out = (
                out.withColumn("center", med)
                .withColumn("spread", F.lit(1.4826) * _q7(devs, 0.5))
            )
        else:  # iqr
            out = (
                out.withColumn("center", med)
                .withColumn("__q1", _q7(F.col("__arr"), 0.25))
                .withColumn("__q3", _q7(F.col("__arr"), 0.75))
                .withColumn("spread", F.col("__q3") - F.col("__q1"))
            )

    judged = F.col("baseline_n") >= F.lit(int(min_baseline))
    if method == "iqr":
        lo = F.col("__q1") - F.lit(float(threshold)) * F.col("spread")
        hi = F.col("__q3") + F.lit(float(threshold)) * F.col("spread")
        score = F.lit(None).cast("double")
        flagged = (F.col("__v") < lo) | (F.col("__v") > hi)
    else:
        # spread == 0 (or null, impossible past min_baseline>=2 for
        # zscore but kept for symmetry) would divide by zero under
        # ANSI; a zero-spread baseline means "any change is anomalous"
        has_spread = F.col("spread") > F.lit(0.0)
        score = F.when(
            judged & has_spread,
            (F.col("__v") - F.col("center")) / F.col("spread"))
        flagged = F.when(
            has_spread, F.abs(score) > F.lit(float(threshold))
        ).otherwise(F.col("__v") != F.col("center"))

    out = (
        out.withColumn("score", score)
        .withColumn(
            "is_anomaly",
            F.when(judged, flagged).otherwise(
                F.lit(None).cast("boolean")))
        .withColumn(
            "center",
            F.when(judged, F.col("center")).otherwise(F.lit(None)))
        .withColumn(
            "spread",
            F.when(judged, F.col("spread")).otherwise(F.lit(None)))
    )
    extra = [phase_col] if phase_col is not None else []
    return out.select(
        *keys, *extra, F.col(ts_col), F.col("__v").alias("value"),
        "baseline_n", "center", "spread", "score", "is_anomaly")


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Optional[List[str]] = None,
    k: float = 0.5,
    h: float = 5.0,
    baseline_n: int = 10,
    center: Optional[float] = None,
    spread: Optional[float] = None,
) -> DataFrame:
    """Two-sided CUSUM change-point scan over a metric time series:
    detects small *sustained* mean shifts that per-batch anomaly scans
    miss (a 1-sigma drift never trips a 3-sigma zscore threshold, but
    its CUSUM grows linearly until it crosses ``h``).

    Standardized Page CUSUM: with reference mean mu and stddev sigma,
    ``S+_t = max(0, S+_{t-1} + (x_t - mu)/sigma - k)`` (and the mirror
    ``S-`` for downward shifts); an alarm fires when either exceeds
    ``h``. ``k`` is the slack (detects shifts > 2k sigmas), ``h`` the
    decision interval, both in sigma units.

    The recursion is NOT computed sequentially: by Page's identity
    ``S+_t = C_t - min(0, min_{j<=t} C_j)`` where ``C`` is the plain
    cumulative sum of ``(x - mu)/sigma - k`` — so the whole scan is two
    running window aggregates (cumsum + running min) per direction,
    partitioned by the series key. No resets: after a true shift the
    statistic stays elevated, so the flagged region is the sustained
    drift; the detection point is the earliest alarmed row per key
    (``.filter("alarm_up").groupBy(keys).agg(F.min(ts))``).

    Reference stats come from the first ``baseline_n`` batches of each
    series (those warm-up rows are unjudged), or pass explicit
    ``center``/``spread`` to judge every row against known-good values.
    A zero/absent spread leaves the series unjudged (null alarms)
    rather than dividing by zero.

    Returns one row per input row: keys, ts, ``value``, ``s_pos``,
    ``s_neg`` (sigma units), ``alarm_up``, ``alarm_down`` (null while
    unjudged).

    Scale: one hash exchange on the series key; every window is a
    running aggregate (O(1) state per row). Like ``anomaly_scan`` this
    is built for rolled-up metric series (one row per batch), not raw
    corpus rows.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    if h <= 0:
        raise ValueError(f"h must be > 0, got {h}")
    if (center is None) != (spread is None):
        raise ValueError("pass center and spread together, or neither")
    if center is None and baseline_n < 2:
        raise ValueError(
            f"baseline_n must be >= 2 to estimate spread, got {baseline_n}")
    if spread is not None and spread <= 0:
        raise ValueError(f"spread must be > 0, got {spread}")

    keys = list(key_cols or [])
    part = [F.col(c) for c in keys] if keys else [F.lit(1)]
    w_ord = Window.partitionBy(*part).orderBy(F.col(ts_col))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)

    out = df.withColumn("__v", F.col(value_col).cast("double"))
    if center is None:
        out = out.withColumn("__rn", F.row_number().over(w_ord))
        # reference stats from each series' first baseline_n batches;
        # conditional agg over the keyed window (frame = whole
        # partition) avoids a join — one pass, same single exchange
        in_base = F.when(F.col("__rn") <= F.lit(int(baseline_n)),
                         F.col("__v"))
        w_all = w_ord.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
        out = (
            out.withColumn("__mu", F.avg(in_base).over(w_all))
            .withColumn("__sigma", F.stddev_samp(in_base).over(w_all))
        )
        judged = (F.col("__rn") > F.lit(int(baseline_n))) \
            & (F.col("__sigma") > F.lit(0.0))
    else:
        out = (
            out.withColumn("__mu", F.lit(float(center)))
            .withColumn("__sigma", F.lit(float(spread)))
        )
        judged = F.lit(True)

    safe_sigma = F.when(F.col("__sigma") > F.lit(0.0), F.col("__sigma"))
    z = (F.col("__v") - F.col("__mu")) / safe_sigma
    if center is None:
        # the scan starts AFTER the baseline period: warm-up rows
        # contribute zero increments so the estimation window can't
        # pollute the statistic it calibrates
        warm = F.col("__rn") <= F.lit(int(baseline_n))
        zp = F.when(warm, F.lit(0.0)).otherwise(z - F.lit(float(k)))
        zn = F.when(warm, F.lit(0.0)).otherwise(-z - F.lit(float(k)))
    else:
        zp = z - F.lit(float(k))
        zn = -z - F.lit(float(k))
    out = (
        out.withColumn("__zp", zp)
        .withColumn("__zn", zn)
        .withColumn("__cp", F.sum("__zp").over(w_cum))
        .withColumn("__cn", F.sum("__zn").over(w_cum))
    )
    out = (
        out.withColumn("__mp", F.min("__cp").over(w_cum))
        .withColumn("__mn", F.min("__cn").over(w_cum))
        .withColumn(
            "s_pos", F.col("__cp") - F.least(F.lit(0.0), F.col("__mp")))
        .withColumn(
            "s_neg", F.col("__cn") - F.least(F.lit(0.0), F.col("__mn")))
    )
    out = (
        out.withColumn(
            "alarm_up",
            F.when(judged, F.col("s_pos") > F.lit(float(h)))
            .otherwise(F.lit(None).cast("boolean")))
        .withColumn(
            "alarm_down",
            F.when(judged, F.col("s_neg") > F.lit(float(h)))
            .otherwise(F.lit(None).cast("boolean")))
    )
    return out.select(
        *keys, F.col(ts_col), F.col("__v").alias("value"),
        "s_pos", "s_neg", "alarm_up", "alarm_down")


def missing_periods(
    df: DataFrame,
    ts_col: str,
    key_cols: Optional[List[str]] = None,
    expected_seconds: int = 3600,
    tolerance: float = 0.5,
) -> DataFrame:
    """Detect gaps in a batch cadence: rows where the time since the
    previous batch of the same series exceeds ``expected_seconds`` by
    more than ``tolerance`` (fraction of the period, absorbing jitter
    like DST-shifted daily batches). Emits one row per gap with
    ``gap_start``/``gap_end`` (the batches flanking it), ``gap_seconds``
    and ``n_missed`` (whole periods skipped) — the "missing data"
    monitor over a profile store's ``dataset_ts``.

    Scale: one ``lag`` over a key-partitioned window (no frame buffer),
    one exchange on the series key.
    """
    if expected_seconds <= 0:
        raise ValueError(
            f"expected_seconds must be > 0, got {expected_seconds}")
    if not 0 <= tolerance < 1:
        raise ValueError(f"tolerance must be in [0, 1), got {tolerance}")
    keys = list(key_cols or [])
    part = [F.col(k) for k in keys] if keys else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.col(ts_col))
    ts = F.col(ts_col)
    # DATE can't cast to double directly; route it through timestamp
    # (midnight, session tz) so gap_seconds stays in seconds for every
    # supported time type (timestamp, timestamp_ntz, date, numeric)
    if isinstance(df.schema[ts_col].dataType, DateType):
        tnum = ts.cast("timestamp").cast("double")
    else:
        tnum = ts.cast("double")
    out = (
        df.withColumn("__t", tnum)
        .withColumn("__prev", F.lag("__t").over(w))
        .withColumn("__prev_ts", F.lag(ts).over(w))
        .withColumn("gap_seconds", F.col("__t") - F.col("__prev"))
        .filter(
            F.col("gap_seconds")
            > F.lit(float(expected_seconds) * (1.0 + tolerance)))
        .withColumn(
            "n_missed",
            F.floor(
                (F.col("gap_seconds") + F.lit(
                    float(expected_seconds) * tolerance))
                / F.lit(float(expected_seconds))
            ).cast("long") - F.lit(1))
    )
    return out.select(
        *keys,
        F.col("__prev_ts").alias("gap_start"),
        ts.alias("gap_end"),
        F.col("gap_seconds").cast("double").alias("gap_seconds"),
        "n_missed",
    )


def ewma_chart(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: Optional[List[str]] = None,
    lam: float = 0.2,
    L: float = 3.0,
    baseline_n: int = 10,
    center: Optional[float] = None,
    spread: Optional[float] = None,
) -> DataFrame:
    """EWMA control chart over a metric time series — the classic
    middle ground between ``anomaly_scan`` (single-batch spikes) and
    ``cusum_changepoints`` (sustained shifts): geometric memory of
    recent batches catches medium-sized drifts in a few periods.

    ``z_t = (1-lam) * z_{t-1} + lam * x_t`` with ``z_0 = mu``; alarm
    when ``|z_t - mu| > L * sigma * sqrt(lam/(2-lam) *
    (1-(1-lam)^(2t)))`` (the exact time-dependent control limit, so
    early rows get the tighter startup band, Montgomery SPC §9.2).

    The recursion is NOT computed sequentially across the cluster:
    contributions older than the double-precision horizon
    ``W = ceil(ln(2^-53)/ln(1-lam))`` are below machine epsilon, so
    ``z_t`` equals (to the last bit that can matter) a fold over the
    trailing ``W`` values — one ROW-BOUNDED window ``collect_list``
    plus a codegen higher-order ``aggregate`` per row, partitioned by
    the series key. Same scale shape as ``anomaly_scan``'s trailing
    baseline: one hash exchange, O(W) per row, built for rolled-up
    metric series (one row per batch), not raw corpus rows.

    Reference ``mu``/``sigma`` come from each series' first
    ``baseline_n`` batches (those warm-up rows are unjudged — null
    alarm), or pass explicit ``center``/``spread``. A zero/absent
    spread leaves the series unjudged rather than dividing by zero.

    Returns one row per input row: keys, ts, ``value``, ``ewma``,
    ``ucl``, ``lcl``, ``alarm``.
    """
    if not 0.0 < lam <= 1.0:
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    if L <= 0:
        raise ValueError(f"L must be > 0, got {L}")
    if (center is None) != (spread is None):
        raise ValueError("pass center and spread together, or neither")
    if center is None and baseline_n < 2:
        raise ValueError(
            f"baseline_n must be >= 2 to estimate spread, got {baseline_n}")
    if spread is not None and spread <= 0:
        raise ValueError(f"spread must be > 0, got {spread}")

    if lam == 1.0:
        horizon = 1
    else:
        horizon = int(math.ceil(math.log(2.0 ** -53)
                                / math.log(1.0 - lam)))
    keys = list(key_cols or [])
    part = [F.col(c) for c in keys] if keys else [F.lit(1)]
    w_ord = Window.partitionBy(*part).orderBy(F.col(ts_col))

    out = df.withColumn("__v", F.col(value_col).cast("double"))
    out = out.withColumn("__rn", F.row_number().over(w_ord))
    if center is None:
        in_base = F.when(F.col("__rn") <= F.lit(int(baseline_n)),
                         F.col("__v"))
        w_all = w_ord.rowsBetween(Window.unboundedPreceding,
                                  Window.unboundedFollowing)
        out = (
            out.withColumn("__mu", F.avg(in_base).over(w_all))
            .withColumn("__sigma", F.stddev_samp(in_base).over(w_all))
        )
        judged_from = int(baseline_n)
    else:
        out = out.withColumn("__mu", F.lit(float(center))) \
                 .withColumn("__sigma", F.lit(float(spread)))
        judged_from = 0

    w_tail = w_ord.rowsBetween(-(horizon - 1), 0)
    trail = F.collect_list("__v").over(w_tail)
    z = F.aggregate(
        trail, F.col("__mu"),
        lambda acc, v: (1.0 - lam) * acc + lam * v)
    # exact startup variance: sigma^2 * lam/(2-lam) * (1-(1-lam)^(2t))
    halfwidth = (
        F.lit(float(L)) * F.col("__sigma")
        * F.sqrt(F.lit(lam / (2.0 - lam))
                 * (1.0 - F.pow(F.lit((1.0 - lam) ** 2),
                                F.col("__rn")))))
    judged = (F.col("__rn") > judged_from) & F.col("__sigma").isNotNull() \
        & (F.col("__sigma") > 0)
    out = (
        out.withColumn("ewma", z)
        .withColumn("ucl", F.when(judged, F.col("__mu") + halfwidth))
        .withColumn("lcl", F.when(judged, F.col("__mu") - halfwidth))
        .withColumn(
            "alarm",
            F.when(judged,
                   (z > F.col("__mu") + halfwidth)
                   | (z < F.col("__mu") - halfwidth)))
    )
    return out.select(
        *keys, F.col(ts_col),
        F.col("__v").alias("value"), "ewma", "ucl", "lcl", "alarm")
