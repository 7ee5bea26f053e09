"""Streaming inter-arrival gaps with BOUNDED per-entity state: emit
the seconds between consecutive events of each entity, in event-time
order, as the stream flows — the streaming sibling of the batch
``ops/events.interarrival_stats`` gap pass (feed the emitted gaps to
any windowed aggregate for live burstiness / heartbeat monitoring).

Late data is handled the as-of way: events buffer per entity until
the event-time watermark passes them, then drain IN TIMESTAMP ORDER
against the last drained timestamp — so an out-of-order arrival
inside the lateness bound still produces the same gap sequence the
batch lag() would (batch parity is the tested contract).  Events
later than the watermark are dropped by Spark upstream, exactly like
every watermarked stateful operator here.

Scale shape: one shuffle per microbatch (hash on the entity key —
state-store-local); state per entity is the last drained timestamp
plus only the not-yet-watermarked buffer.  ``expire_after_s`` drops
an idle entity's state once the watermark moves that far past its
last event (the unbounded-keyspace guard: without it, one long per
entity lives forever).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_interarrival"]


def streaming_interarrival(
    stream: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    expire_after_s: float = 86400.0,
) -> DataFrame:
    """-> append-mode stream, one row per DRAINED event:
    ``(<entity_col>, ts timestamp, gap_s double)`` — ``gap_s`` is the
    seconds since the entity's previous event (null for its first
    event, and for the first event after a state expiry).

    Multi-column entities: concat the columns upstream.  Null entity
    keys / timestamps drop.
    """
    if expire_after_s <= 0:
        raise ValueError(
            f"expire_after_s must be > 0: {expire_after_s}")
    missing = [c for c in (entity_col, ts_col)
               if c not in stream.columns]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")

    ent_t = stream.schema[entity_col].dataType.simpleString()
    out_schema = f"{entity_col} {ent_t}, ts timestamp, gap_s double"
    state_schema = "last_ms long, pending array<long>"
    expire_ms = int(expire_after_s * 1000)

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        ent = key[0]
        if state.exists:
            last_ms, pending = state.get
            pending = list(pending)
        else:
            last_ms, pending = None, []
        if not state.hasTimedOut:
            for p in pdfs:
                if not len(p):
                    continue
                ms = p["__ts"].astype("int64") // 1_000_000
                pending.extend(int(v) for v in ms)
        else:
            for _ in pdfs:
                pass
        wm = state.getCurrentWatermarkMs()

        pending.sort()
        drain = [t for t in pending if t <= wm]
        still = [t for t in pending if t > wm]

        rows = []
        for t in drain:
            gap = (t - last_ms) / 1000.0 if last_ms is not None \
                else None
            rows.append({entity_col: ent,
                         "ts": pd.to_datetime(t, unit="ms"),
                         "gap_s": gap})
            last_ms = t

        if still:
            state.update((last_ms, still))
            state.setTimeoutTimestamp(max(min(still), wm + 1))
        elif last_ms is not None and wm - last_ms < expire_ms:
            state.update((last_ms, []))
            # wake up at expiry so the idle entity's state is
            # reclaimed even if it never sends another event
            state.setTimeoutTimestamp(last_ms + expire_ms)
        else:
            state.remove()

        if rows:
            yield pd.DataFrame(
                rows, columns=[entity_col, "ts", "gap_s"])

    src = (stream
           .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
           .filter(F.col(ts_col).isNotNull()
                   & F.col(entity_col).isNotNull())
           .withWatermark(ts_col, watermark)
           .select(F.col(entity_col),
                   F.col(ts_col).alias("__ts")))
    return src.groupBy(entity_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
