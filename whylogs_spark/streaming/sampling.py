"""Streaming per-group reservoir sampling with BOUNDED state: keep
the k rows with the SMALLEST md5 rank per group — the streaming
sibling of the batch ``ops/sampling.group_sample`` (same
``_hash_prefix`` rank: md5 over the '|'-joined key columns + salt),
so a stream sampled continuously and a batch table sampled once
produce the SAME k rows for the same data.

That determinism is the point: "sample 100 documents per source from
the firehose" becomes reproducible — replays, backfills and the
batch pipeline all agree on the sample, because bottom-k-by-hash is
a uniform reservoir that does not depend on arrival order.

Scale shape: one shuffle per microbatch (hash on the group key —
state-store-local); state per group is exactly <= k (rank,
payload-JSON) pairs regardless of stream length.  A group emits its
final sample once, append-mode, when the event-time watermark sees
no newer data for that group (event-time timeout) — the
reproducible-training-set use case; a later event re-opens the group
and a fresh sample accumulates.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_group_sample"]


def streaming_group_sample(
    stream: DataFrame,
    group_col: str,
    k: int,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    salt: str = "",
) -> DataFrame:
    """-> append-mode stream: one row per sampled record
    ``(group, rank_hex, <payload cols as strings...>)`` per closed
    group.  ``key_cols`` seed the rank exactly like the batch
    operator (``ops.sampling._hash_prefix``).  Exactly ``k`` rows
    survive per group (the batch contract is ``row_number() <= k``,
    not ``rank()``); rank ties at the ``k`` boundary are cut
    deterministically by the serialized payload, where the batch
    side's tie-break among equal-rank rows is arbitrary."""
    from ..ops.sampling import _hash_prefix

    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    missing = [c for c in list(key_cols) + [group_col, ts_col]
               if c not in stream.columns]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")
    payload = [c for c in stream.columns if c != group_col]
    out_schema = ", ".join(
        [f"{group_col} "
         f"{stream.schema[group_col].dataType.simpleString()}",
         "rank_hex string"]
        + [f"{c} string" for c in payload])
    state_schema = "ranks array<string>, rows array<string>"

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        g = key[0]
        if state.hasTimedOut:
            ranks, rows = state.get
            state.remove()
            recs = []
            for rk, js in sorted(zip(ranks, rows)):
                rec = {group_col: g, "rank_hex": rk}
                # to_json drops null fields, so a payload column that
                # is null in EVERY sampled row of this group would be
                # absent from pd.DataFrame(recs) and the Arrow cast
                # to out_schema would fail — default each declared
                # column to None explicitly
                parsed = json.loads(js) if js else {}
                for c in payload:
                    rec[c] = parsed.get(c)
                recs.append(rec)
            if recs:
                yield pd.DataFrame(recs, columns=[group_col,
                                                  "rank_hex",
                                                  *payload])
            return
        if state.exists:
            ranks, rows = state.get
            pool: List[Tuple[str, str]] = list(zip(ranks, rows))
        else:
            pool = []
        for p in pdfs:
            if not len(p):
                continue
            pool.extend(zip(p["__rk"], p["__js"]))
        # exactly k survivors, like the batch row_number() <= k; rank
        # ties at the boundary (identical key_cols values) are cut
        # deterministically by the serialized payload — the batch
        # side breaks the same ties arbitrarily among identical-rank
        # rows, so both emit k rows and agree on every distinct rank
        pool.sort()
        pool = pool[:k]
        state.update(([r for r, _ in pool], [j for _, j in pool]))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(wm + 1)
        return
        yield  # pragma: no cover — generator contract

    src = (stream
           .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
           .filter(F.col(ts_col).isNotNull())
           .withWatermark(ts_col, watermark)
           .select(
               group_col, ts_col,  # keep the watermarked column alive
               _hash_prefix(list(key_cols), salt).alias("__rk"),
               F.to_json(F.struct(
                   *[F.col(c).cast("string").alias(c)
                     for c in payload])).alias("__js")))
    return src.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
