"""Streaming referential integrity: windowed orphan-rate monitoring.

The batch check (``ops/integrity.py referential_integrity``) audits a
landed table; an ingest pipeline wants to know the moment a producer
starts emitting events that no longer join to a dimension (a deploy
that swaps id namespaces, a partner feed drifting out of sync). This
is the stream-static version: each micro-batch LEFT-joins the stream
against the dimension's distinct key set and a watermarked windowed
aggregation emits per-window FK health rows.

Spark-native shape: stream-static equi-join (the static side is
re-resolved every micro-batch, so a dimension refreshed in place is
picked up without restarting the query; ``broadcast_dim`` ships only
its pruned distinct keys to executors) followed by ONE watermarked
stateful aggregation keyed by the time window — state is
O(windows-in-flight), independent of stream length. Null FK semantics
match the batch op: a null key is neither matched nor orphaned.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_fk_monitor"]


def streaming_fk_monitor(
    stream_df: DataFrame,
    dim_df: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Optional[Sequence[str]] = None,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Per-window FK health of a stream against a static dimension.

    Emits one row per closed event-time window: ``window_start,
    window_end, child_rows, null_key_rows, matched_rows, orphan_rows,
    match_rate`` (rate over non-null keys, null when a window has
    none). Append-mode sink-ready: rows finalize when the watermark
    passes the window end.

    The dimension side is reduced to its DISTINCT key columns before
    the join — at 100 TB the stream never shuffles for the join at all
    (broadcast), and the stateful aggregation's state is one counter
    row per open window.
    """
    child_keys = list(child_keys)
    parent_keys = list(parent_keys or child_keys)
    if len(child_keys) != len(parent_keys):
        raise ValueError(
            f"key arity mismatch: {child_keys} vs {parent_keys}")
    ts = F.col(ts_col)
    if "timestamp_ntz" in stream_df.schema[ts_col].dataType \
            .simpleString():
        ts = ts.cast("timestamp")
    src = (stream_df
           .withColumn("__ts", ts)
           .withWatermark("__ts", watermark))
    pk = dim_df.select(
        *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
    ).dropna(how="any").distinct().withColumn("__matched", F.lit(True))
    if broadcast_dim:
        pk = F.broadcast(pk)
    joined = src.join(pk, on=child_keys, how="left")
    isnull = F.col(child_keys[0]).isNull()
    for c in child_keys[1:]:
        isnull = isnull | F.col(c).isNull()
    agg = (joined.groupBy(F.window("__ts", window).alias("w")).agg(
        F.count("*").alias("child_rows"),
        F.sum(F.when(isnull, 1).otherwise(0)).alias("null_key_rows"),
        F.sum(F.when(F.col("__matched").isNotNull(), 1).otherwise(0))
        .alias("matched_rows"),
        F.sum(F.when(F.col("__matched").isNull() & ~isnull, 1)
              .otherwise(0)).alias("orphan_rows"),
    ))
    denom = F.col("child_rows") - F.col("null_key_rows")
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "child_rows", "null_key_rows", "matched_rows", "orphan_rows",
        F.when(denom > 0,
               F.round(F.col("matched_rows") / denom, 6))
        .alias("match_rate"),
    )
