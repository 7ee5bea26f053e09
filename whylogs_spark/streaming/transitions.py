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
    # schemas derive from the INPUT types — the operator is generic in
    # the user key and event code types, like the batch counterpart
    utype = stream.schema[user_col].dataType.simpleString()
    etype = stream.schema[event_col].dataType.simpleString()
    out_schema = (f"{user_col} {utype}, src {etype}, dst {etype}, "
                  "ts timestamp")
    state_schema = f"last_us long, last_ev {etype}"

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
        # microsecond precision: Spark timestamps are µs; //1e6 to ms
        # would truncate and break joins back to the source events
        us = ev[ts_col].astype("int64") // 1_000
        names = ev[event_col].tolist()
        times = [int(t) for t in us]
        if state.exists:
            last_us, last_ev = state.get
            names = [last_ev] + names
            times = [int(last_us)] + times
        state.update((times[-1], names[-1]))
        # GroupState timeout timestamps are MILLISECONDS
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(times[-1] // 1000 + ttl, wm + 1))
        if len(names) < 2:
            return
        yield pd.DataFrame({
            user_col: [uid] * (len(names) - 1),
            "src": names[:-1],
            "dst": names[1:],
            "ts": pd.to_datetime(times[1:], unit="us"),
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
    wrote — single-sourced from the batch operator's rollup."""
    from whylogs_spark.ops.events import rollup_transition_pairs

    return rollup_transition_pairs(pairs)
