"""Streaming as-of enrichment: join a fact stream to the LATEST
dimension version at or before each event's time, tolerating
late-arriving dimension updates.

The batch sibling (ops/asof.py asof_join) sorts history; on unbounded
streams history is per-key STATE.  Spark's built-in stream-stream
joins cannot express "latest row at or before" (they match windows,
not argmax), so this is the canonical ``applyInPandasWithState``
case: both streams union into one keyed stream, events BUFFER in
state until the event-time watermark passes their timestamp (after
which no dimension update older than them can still arrive), then
each emits exactly once with the newest dimension version at or
before its time.

Correctness contract: an event is enriched with the dimension values
that were CURRENT at the event's own event time — not arrival time —
as long as the dimension update arrives within the watermark.  This
is the point-in-time-correct feature lookup (ops/features.py
trailing windows are its aggregate cousin): no leakage from future
dimension versions, by construction.

Scale shape: ONE shuffle per microbatch (hash on the join key — the
same key the state store partitions by, so state access is local).
Per-key state is the pending-event buffer (bounded by watermark ×
event rate per key) plus the dimension version list, which is
TRIMMED each batch: versions superseded before the watermark can
never be the as-of match for any future event and are dropped, so
state does not grow with stream lifetime.  Payloads ride as JSON
strings inside state (schema-agnostic plumbing; the Arrow batch
carries them column-wise).
"""

from __future__ import annotations

import json
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_asof_enrich"]

_SQL_NAME = {
    T.LongType: "long", T.IntegerType: "int", T.DoubleType: "double",
    T.FloatType: "float", T.StringType: "string",
    T.BooleanType: "boolean", T.TimestampType: "timestamp",
    T.DateType: "date", T.ShortType: "short", T.ByteType: "tinyint",
}


def _sql_type(dt: T.DataType) -> str:
    name = _SQL_NAME.get(type(dt))
    if name is None:
        raise ValueError(
            f"streaming_asof_enrich: unsupported payload type {dt} "
            "(atomic types only — pre-serialize nested columns)")
    return name


def streaming_asof_enrich(
    events: DataFrame,
    dims: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    dim_ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """-> append-mode streaming DataFrame: every event row, enriched
    with ``dim_<col>`` for each non-key dimension attribute, plus
    ``dim_ts`` (the matched version's time; null columns when no
    version exists at or before the event).

    Events emit when the watermark passes their event time — the
    price of late-dimension correctness is that per-event latency ~=
    the watermark delay.  Use a short watermark for fresh pipelines,
    a long one when dimension feeds lag.
    """
    ev_fields = [f for f in events.schema.fields
                 if f.name not in (key_col, ts_col)]
    dim_fields = [f for f in dims.schema.fields
                  if f.name not in (key_col, dim_ts_col)]
    if not dim_fields:
        raise ValueError("dims carries no attribute columns")
    ev_names = [f.name for f in ev_fields]
    dim_names = [f.name for f in dim_fields]
    overlap = set(ev_names) & {f"dim_{c}" for c in dim_names}
    if overlap:
        raise ValueError(f"column collision on {sorted(overlap)}")

    out_schema = ", ".join(
        [f"{key_col} {_sql_type(events.schema[key_col].dataType)}",
         f"{ts_col} timestamp"]
        + [f"{f.name} {_sql_type(f.dataType)}" for f in ev_fields]
        + [f"dim_{f.name} {_sql_type(f.dataType)}" for f in dim_fields]
        + ["dim_ts timestamp"])
    # temporal payload fields come back from JSON as ISO strings —
    # note them so fn can rebuild real timestamps for Arrow
    temporal = {
        f.name for f in ev_fields
        if isinstance(f.dataType, (T.TimestampType, T.DateType))
    } | {
        f"dim_{f.name}" for f in dim_fields
        if isinstance(f.dataType, (T.TimestampType, T.DateType))
    }
    date_typed = {
        f.name for f in ev_fields if isinstance(f.dataType, T.DateType)
    } | {
        f"dim_{f.name}" for f in dim_fields
        if isinstance(f.dataType, T.DateType)
    }
    state_schema = ("dts array<long>, djs array<string>, "
                    "ets array<long>, ejs array<string>")

    def _pack(df: DataFrame, tcol: str, names: List[str],
              side: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("__k"),
            F.col(tcol).cast("timestamp").alias("__ts"),
            F.lit(side).alias("__side"),
            F.to_json(F.struct(*[F.col(c) for c in names]))
            .alias("__js"))

    unioned = (
        _pack(events, ts_col, ev_names, "e")
        .unionByName(_pack(dims, dim_ts_col, dim_names, "d"))
        .withWatermark("__ts", watermark))

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.exists:
            dts, djs, ets, ejs = state.get
            dvers = list(zip(dts, djs))
            pend = list(zip(ets, ejs))
        else:
            dvers, pend = [], []
        if not state.hasTimedOut:
            for p in pdfs:
                if not len(p):
                    continue
                ms = p["__ts"].astype("int64") // 1_000_000
                for t, side, js in zip(ms, p["__side"], p["__js"]):
                    if side == "d":
                        dvers.append((int(t), js))
                    else:
                        pend.append((int(t), js))
        else:
            for _ in pdfs:
                pass
        dvers.sort(key=lambda x: x[0])
        wm = state.getCurrentWatermarkMs()

        out_rows = []
        still = []
        for t, js in sorted(pend, key=lambda x: x[0]):
            if t > wm:
                still.append((t, js))
                continue
            # newest version at or before t (linear scan over the
            # bounded version list; versions are sorted ascending)
            match = None
            for dt_, dj in dvers:
                if dt_ <= t:
                    match = (dt_, dj)
                else:
                    break
            rec = {key_col: k,
                   ts_col: pd.to_datetime(t, unit="ms")}
            # explicit None default per event column: to_json drops
            # null fields (spark.sql.jsonGenerator.ignoreNullFields
            # defaults true), so a missing key MEANS null — leaving
            # it unset would (a) lose the column entirely when it is
            # null across a whole emitted batch (KeyError at the
            # df[cols] projection) and (b) let pandas widen
            # partially-null int columns to NaN floats that fail the
            # Arrow cast to the declared schema; .get keeps real
            # Nones in object dtype, same as the dim side below
            parsed = json.loads(js) if js else {}
            for c in ev_names:
                rec[c] = parsed.get(c)
            if match is not None:
                dj = json.loads(match[1]) if match[1] else {}
                for c in dim_names:
                    rec[f"dim_{c}"] = dj.get(c)
                rec["dim_ts"] = pd.to_datetime(match[0], unit="ms")
            else:
                for c in dim_names:
                    rec[f"dim_{c}"] = None
                rec["dim_ts"] = pd.NaT
            out_rows.append(rec)

        # trim versions: drop any version superseded by a newer one
        # that is itself already <= watermark (no future event can
        # need it — future events have ts > wm)
        keep_from = 0
        for i, (dt_, _) in enumerate(dvers):
            if dt_ <= wm:
                keep_from = i
        dvers = dvers[keep_from:]

        if still or dvers:
            state.update((
                [t for t, _ in dvers], [j for _, j in dvers],
                [t for t, _ in still], [j for _, j in still]))
            nxt = min([t for t, _ in still], default=wm + 60_000)
            state.setTimeoutTimestamp(max(nxt, wm + 1))
        else:
            state.remove()

        if out_rows:
            df = pd.DataFrame(out_rows)
            for c in temporal:
                if c in df.columns:
                    conv = pd.to_datetime(df[c])
                    df[c] = (conv.dt.date if c in date_typed
                             else conv)
            # pandas may infer object dtype for all-None columns;
            # Arrow handles that, but normalize event column order
            cols = ([key_col, ts_col] + ev_names
                    + [f"dim_{c}" for c in dim_names] + ["dim_ts"])
            yield df[[c for c in cols]]

    return unioned.groupBy("__k").applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
