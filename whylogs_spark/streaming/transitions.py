"""Streaming first-order transition extraction: the continuous
counterpart of ``ops.events.transition_matrix``.

Per-user state is ONE (last_ts, last_event) pair (two scalars —
bounded regardless of activity); each microbatch sorts the user's new
events by (ts, event) — the batch operator's tie order — and emits one
``(user, src, dst, ts)`` row per consecutive pair, bridging across
microbatches through the state. Dormant users' state evicts via an
event-time timeout (``idle_ttl`` past their last event), so state
size is bounded by ACTIVE users, not all users ever seen.

Exactness contract: identical to the batch ``transition_matrix`` when
each user's events arrive in event-time order across microbatches
(within a microbatch, order doesn't matter — events are sorted). An
event that arrives in a LATER microbatch but with an EARLIER timestamp
than the user's state (allowed inside the watermark) is appended after
the bridge rather than re-sorted into history — the documented,
state-bounded behavior of every one-pass streaming transition counter.

Count the emitted pairs with a plain windowed aggregation, or read the
sink and feed ``transition_counts_from_pairs`` (batch).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ._util import duration_ms as _ttl_ms

__all__ = ["streaming_transitions", "transition_counts_from_pairs"]


def streaming_transitions(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    watermark: str = "1 hour",
    idle_ttl: str = "1 day",
) -> DataFrame:
    """-> streaming DataFrame of ``(user, src, dst, ts)`` transition
    rows, append-mode — ``ts`` is the DESTINATION event's time.

    One shuffle per microbatch (hash on ``user_col``, the state-store
    key); state per user is one (ts, event) pair.
    """
    ttl = _ttl_ms(idle_ttl)
    out_schema = (f"{user_col} long, src string, dst string, "
                  "ts timestamp")
    state_schema = "last_ms long, last_ev string"

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        uid = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        ev = pd.concat(parts)
        ev = ev[ev[event_col].notna()]
        if not len(ev):
            return
        ev = ev.sort_values([ts_col, event_col], kind="mergesort")
        ms = ev[ts_col].astype("int64") // 1_000_000
        names = ev[event_col].tolist()
        times = [int(t) for t in ms]
        if state.exists:
            last_ms, last_ev = state.get
            names = [last_ev] + names
            times = [int(last_ms)] + times
        state.update((times[-1], names[-1]))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(times[-1] + ttl, wm + 1))
        if len(names) < 2:
            return
        yield pd.DataFrame({
            user_col: [uid] * (len(names) - 1),
            "src": names[:-1],
            "dst": names[1:],
            "ts": pd.to_datetime(times[1:], unit="ms"),
        })

    marked = stream.filter(F.col(user_col).isNotNull()
                           & F.col(ts_col).isNotNull()).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return marked.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)


def transition_counts_from_pairs(pairs: DataFrame) -> DataFrame:
    """Batch rollup over a sink of emitted transition rows: ``(src,
    dst, n_transitions, probability)`` — the same output contract as
    ``ops.events.transition_matrix``, for reading back what the stream
    wrote. Bounded (src, dst) aggregation + a window over that bounded
    matrix."""
    from pyspark.sql import Window

    counts = pairs.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions"))
    row_tot = F.sum("n_transitions").over(Window.partitionBy("src"))
    return counts.select(
        "src", "dst", "n_transitions",
        (F.col("n_transitions").cast("double") / row_tot)
        .alias("probability"))
