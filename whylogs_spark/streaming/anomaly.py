"""Streaming metric anomaly monitor: judge each arriving metric batch
against its trailing per-series baseline, continuously.

The reference ships profiles to a monitoring backend that evaluates
per-batch deviations over time (whylogs itself only writes profiles —
see python/whylogs/api/store/sqlite_store.py:13-119); the batch
answer lives in ``core.monitor.anomaly_scan``. This sink runs that
answer as a stream: upstream does the watermarked windowed rollup
(one stateful agg; the usual Structured Streaming shape), and every
microbatch of finalized metric rows is appended to a tiny series
store and judged against the previous ``window`` batches of its
series.

Scale: the store holds ROLLED-UP series (one row per key and period),
so it is orders of magnitude smaller than the stream; each microbatch
costs one append plus one bounded scan of the store tail (rows newer
than the incoming minimum ts minus ``window`` periods — partition
pruning applies if the store grows enough to warrant date
partitioning). State never accumulates in the streaming query itself.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.monitor import anomaly_scan


class AnomalyMonitorSink:
    """foreachBatch sink over a (already rolled-up) metric stream.

    Usage::

        rolled = (events.withWatermark("ts", "10 minutes")
                  .groupBy(F.window("ts", "1 hour"), "event_type")
                  .agg(F.sum("value").alias("value"))
                  .select("event_type",
                          F.col("window.start").alias("ts"), "value"))
        sink = AnomalyMonitorSink(
            str(store), "ts", "value", key_cols=["event_type"],
            on_anomaly=lambda bid, rows: page(rows))
        q = (rolled.writeStream.outputMode("append")
             .foreachBatch(sink).option("checkpointLocation", ckpt)
             .start())

    ``on_anomaly`` fires on the driver with (batch_id, [Row]) for
    newly-arrived rows judged anomalous — the alert hook, like
    ``DriftMonitorSink.on_drift``. Only rows of the CURRENT microbatch
    are reported (history is context, not re-alerted).

    ``method="cusum"`` judges sustained mean shifts instead of
    per-batch outliers (``core.monitor.cusum_changepoints``, tuned by
    ``cusum_k`` / ``cusum_h`` / ``cusum_baseline_n``); flagged rows
    carry ``alarm_up`` / ``alarm_down``. The CUSUM walk is cumulative
    from the series start, so it rejects the ``expected_seconds``
    horizon prune and ``phase_col`` — the rolled-up series is tiny,
    scan it whole.

    ``expected_seconds`` opts into pruning the per-batch store scan to
    the tail the baseline can reach: ``lookback_periods`` cadence
    periods (default ``2 * (window + 1)`` — the 2x headroom keeps a
    short outage gap from shrinking the baseline for the rows right
    after it). With ``phase_col`` the baseline spans whole seasons, so
    pruning then requires an explicit
    ``lookback_periods >= season_length * (window + 1)``.
    """

    def __init__(
        self,
        path: str,
        ts_col: str,
        value_col: str,
        key_cols: Optional[List[str]] = None,
        window: int = 7,
        method: str = "zscore",
        threshold: Optional[float] = None,
        min_baseline: int = 3,
        phase_col: Optional[str] = None,
        expected_seconds: Optional[int] = None,
        lookback_periods: Optional[int] = None,
        cusum_k: float = 0.5,
        cusum_h: float = 5.0,
        cusum_baseline_n: int = 10,
        on_anomaly: Optional[Callable[[int, List], None]] = None,
    ) -> None:
        if method not in ("zscore", "mad", "iqr", "cusum"):
            # fail at construction, not at the first microbatch
            raise ValueError(
                f"method must be zscore|mad|iqr|cusum, got {method!r}")
        if method == "cusum" and (expected_seconds is not None
                                  or lookback_periods is not None
                                  or phase_col is not None):
            raise ValueError(
                "cusum judges a cumulative walk from the series "
                "start: expected_seconds/lookback_periods pruning "
                "and phase_col do not apply")
        if expected_seconds is not None:
            if phase_col is not None and lookback_periods is None:
                # a seasonal baseline reaches season_length * window
                # periods back; a (window+1)-period prune would starve
                # it and silently unjudge every row
                raise ValueError(
                    "phase_col baselines span whole seasons: pass "
                    "lookback_periods >= season_length * (window + 1) "
                    "when pruning with expected_seconds")
            if lookback_periods is None:
                # 2x headroom so a short outage gap doesn't shrink the
                # baseline for the rows right after it — exactly when
                # judging matters most. Series with longer gaps should
                # widen this (or skip pruning; the store is tiny).
                lookback_periods = 2 * (window + 1)
            if lookback_periods < window + 1:
                raise ValueError(
                    f"lookback_periods must be >= window + 1, "
                    f"got {lookback_periods}")
        self.path = path
        self.ts_col = ts_col
        self.value_col = value_col
        self.key_cols = list(key_cols or [])
        self.window = window
        self.method = method
        self.threshold = threshold
        self.min_baseline = min_baseline
        self.phase_col = phase_col
        self.expected_seconds = expected_seconds
        self.lookback_periods = lookback_periods
        self.cusum_k = cusum_k
        self.cusum_h = cusum_h
        self.cusum_baseline_n = cusum_baseline_n
        self.on_anomaly = on_anomaly

    def _select_cols(self):
        cols = list(self.key_cols)
        if self.phase_col:
            cols.append(self.phase_col)
        return cols + [self.ts_col, self.value_col]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        incoming = batch_df.select(*self._select_cols()) \
            .withColumn("__batch_id", F.lit(int(batch_id)))
        incoming.write.mode("append").parquet(self.path)
        if self.on_anomaly is None:
            return
        # judge only the new rows, against history + themselves; the
        # store scan is bounded to the tail the baseline can reach.
        # dropDuplicates guards the series against foreachBatch's
        # at-least-once redelivery (a replayed append must not double
        # a batch's row and shift every baseline after it)
        store = spark.read.parquet(self.path).dropDuplicates(
            self.key_cols + [self.ts_col])
        if self.expected_seconds is not None:
            min_ts = incoming.agg(
                F.min(self.ts_col)).first()[0]
            if min_ts is not None:
                secs = int(self.expected_seconds * self.lookback_periods)
                horizon = F.lit(min_ts) - F.expr(
                    f"INTERVAL {secs} SECONDS")
                store = store.filter(F.col(self.ts_col) >= horizon)
        flagged = self._judge(store).filter(F.col("__flagged")) \
            .drop("__flagged")
        join_keys = self.key_cols + [self.ts_col]
        new_flagged = flagged.join(
            incoming.select(*join_keys).distinct(), join_keys,
            "left_semi").collect()
        if new_flagged:
            self.on_anomaly(int(batch_id), new_flagged)

    def read_series(self, spark: SparkSession) -> DataFrame:
        """The stored series, deduplicated on (keys, ts) — the same
        guard the judge path applies, so a microbatch replayed by
        foreachBatch's at-least-once contract never shows up twice to
        consumers either. The raw appended rows (with ``__batch_id``)
        stay reachable via ``spark.read.parquet(sink.path)``."""
        return spark.read.parquet(self.path).dropDuplicates(
            self.key_cols + [self.ts_col])

    def compact(self, spark: SparkSession) -> None:
        """Rewrite the sink store with redelivered duplicates dropped,
        bounding on-disk growth under repeated replays.

        MUST run while the owning streaming query is stopped (or
        between triggers it cannot overlap): a microbatch appended
        after the rewrite materializes but before the swap would be
        lost. This is the standard maintenance-window contract —
        ``io/store.py`` ``compact`` has the same one.

        Crash safety: the deduplicated rows land in a sibling temp
        dir, then the swap is rename(old -> trash), rename(tmp ->
        live), delete(trash) — at no point do the data exist only in a
        directory slated for deletion, so a crash mid-swap is
        recoverable from either the trash or the tmp dir (a failed
        second rename is rolled back). Works for any FS URI the
        session's connectors reach, same as ``io.fsio``."""
        from ..io.fsio import _fs_and_path

        deduped = spark.read.parquet(self.path).dropDuplicates(
            self.key_cols + [self.ts_col])
        base = self.path.rstrip("/")
        tmp, trash = base + "__compact_tmp", base + "__compact_old"
        deduped.write.mode("overwrite").parquet(tmp)
        fs, jdst, _ = _fs_and_path(self.path, spark)
        jsrc = _fs_and_path(tmp, spark)[1]
        jtrash = _fs_and_path(trash, spark)[1]
        fs.delete(jtrash, True)  # leftover from an earlier crash
        if not fs.rename(jdst, jtrash):
            raise IOError(
                f"compact: rename {self.path!r} -> {trash!r} failed")
        if not fs.rename(jsrc, jdst):
            fs.rename(jtrash, jdst)  # roll back to the old store
            raise IOError(
                f"compact: rename {tmp!r} -> {self.path!r} failed "
                "(original store restored)")
        fs.delete(jtrash, True)

    def _judge(self, series: DataFrame) -> DataFrame:
        """Score a series frame with the configured method; adds the
        boolean ``__flagged`` column both callers filter on."""
        if self.method == "cusum":
            from ..core.monitor import cusum_changepoints

            cu = cusum_changepoints(
                series, self.ts_col, self.value_col,
                key_cols=self.key_cols, k=self.cusum_k,
                h=self.cusum_h, baseline_n=self.cusum_baseline_n)
            return cu.withColumn(
                "__flagged",
                F.coalesce(F.col("alarm_up"), F.lit(False))
                | F.coalesce(F.col("alarm_down"), F.lit(False)))
        scored = anomaly_scan(
            series, self.ts_col, self.value_col,
            key_cols=self.key_cols, window=self.window,
            method=self.method, threshold=self.threshold,
            min_baseline=self.min_baseline, phase_col=self.phase_col)
        return scored.withColumn(
            "__flagged", F.coalesce(F.col("is_anomaly"), F.lit(False)))

    def read_anomalies(self, spark: SparkSession) -> DataFrame:
        """Re-scan the whole stored series (batch mode): the full
        judged history, for dashboards/backfill."""
        return self._judge(
            spark.read.parquet(self.path).dropDuplicates(
                self.key_cols + [self.ts_col])).drop("__flagged")
