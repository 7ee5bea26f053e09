"""Stateful streaming sessionization (``applyInPandasWithState``).

The batch operator (ops/events.py:sessionize) assigns gap-based session
ids with a window over the full history; on an unbounded stream that
history is state. This operator keeps ONE open session per user as a
3-field state row and emits a session the moment it closes — either
because a newer event arrived past the gap, or because the event-time
watermark passed ``last_event + gap`` (an event-time timeout), so
sessions of silent users close without waiting for their next event.

This is the superset of the reference's processing-time rolling loggers
(python/whylogs/api/logger/rolling.py) for the sessionization use case:
event-time semantics, late-data tolerance via the watermark, and
executor-distributed state keyed by user — state scales horizontally
with the cluster, and each microbatch touches only users present in the
batch or due for timeout.

Caveats (documented, standard for streaming sessionization): events
arriving out of order ACROSS microbatches within the watermark are
folded into the open session (``last = max(last, ts)``) rather than
re-splitting history; within a microbatch events are sorted by event
time first.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


from ._util import duration_ms as _gap_ms


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """-> streaming DataFrame of CLOSED sessions
    ``(user, session_start, session_end, n_events)``, append-mode.

    One shuffle per microbatch (hash on ``user_col`` — the same key the
    state store is partitioned by, so state access is local); state per
    user is 3 longs regardless of session length.
    """
    gms = _gap_ms(gap)
    out_schema = (f"{user_col} long, session_start timestamp, "
                  f"session_end timestamp, n_events long")
    state_schema = "start long, last long, n long"

    def close_row(uid, start, last, n) -> pd.DataFrame:
        return pd.DataFrame({
            user_col: [uid],
            "session_start": [pd.to_datetime(start, unit="ms")],
            "session_end": [pd.to_datetime(last, unit="ms")],
            "n_events": [n],
        })

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        uid = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield close_row(uid, start, last, n)
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        ev = pd.concat(parts)
        ts = ev[ts_col].sort_values().astype("int64") // 1_000_000
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed = []
        for t in ts:
            t = int(t)
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gms:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        state.update((int(start), int(last), int(n)))
        # close on watermark passing last+gap; the timeout timestamp must
        # sit strictly beyond the current watermark
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(last) + gms, wm + 1))
        if closed:
            yield pd.concat(
                [close_row(uid, s, e, k) for s, e, k in closed])

    # watermarks require TIMESTAMP; parquet NTZ event times must be cast
    # first or the stream fails with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    marked = stream.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return marked.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)


def streaming_session_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str = None,
) -> DataFrame:
    """Gap-based session aggregates via Spark's NATIVE
    ``session_window`` — the fully-JVM complement to
    ``streaming_sessionize``.

    Differences from the ``applyInPandasWithState`` operator above:
    the native state machinery MERGES sessions when late events (inside
    the watermark) bridge two previously separate sessions — the
    documented caveat of the custom operator — and the whole plan is
    codegen (no Python). The custom operator in turn can carry
    arbitrary Python per-session state; use this one whenever the
    standard aggregates are enough.

    Emits closed sessions in append mode once the watermark passes:
    ``(user, session_start, last_event, window_end, duration_seconds,
    n_events [, <value>_sum, <value>_avg])``. ``window_end`` is
    Spark's session-window end = last event + gap (the eviction
    boundary); ``duration_seconds`` is the REAL span
    ``last_event - session_start``, matching the batch
    ``session_stats``.

    Plan shape: watermark -> partial agg -> one exchange keyed by
    (user, session) -> session-merging stateful agg.
    """
    ts = F.col(ts_col).cast("timestamp")
    src = stream.withColumn("__ts", ts).withWatermark("__ts", watermark)
    aggs = [F.count(F.lit(1)).alias("n_events"),
            F.max("__ts").alias("last_event")]
    if value_col is not None:
        aggs += [F.sum(value_col).alias(f"{value_col}_sum"),
                 F.avg(value_col).alias(f"{value_col}_avg")]
    out = (
        src.groupBy(F.col(user_col),
                    F.session_window(F.col("__ts"), gap))
        .agg(*aggs)
    )
    return out.select(
        user_col,
        F.col("session_window.start").alias("session_start"),
        "last_event",
        F.col("session_window.end").alias("window_end"),
        # microsecond timestampdiff — the SAME expression as the batch
        # session_stats (ops/events.py), so sub-second data keeps the
        # documented parity (unix_timestamp would truncate each
        # endpoint to whole seconds, and per-endpoint epoch casts are
        # the DST-hazardous pattern events.py documents)
        (F.expr("timestampdiff(MICROSECOND, session_window.start, "
                "last_event)") / F.lit(1e6))
        .alias("duration_seconds"),
        *[c for c in out.columns
          if c not in (user_col, "session_window", "last_event")])
