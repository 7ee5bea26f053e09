"""Streaming deduplication.

The batch dedup family (ops/dedup.py) needs the whole corpus; a
streaming ingest pipeline instead wants duplicates dropped as rows
arrive, with state that does not grow forever. Two Spark-native
levels:

* ``streaming_exact_dedup`` — drop rows whose normalized-text
  fingerprint was already seen within the watermark horizon, via
  ``dropDuplicatesWithinWatermark``: per-key state is evicted once the
  event time falls behind the watermark, so state is bounded by
  (arrival rate x horizon), not stream length. Exactly the semantics a
  near-real-time training-data ingest needs — a re-crawled page that
  reappears within the horizon is dropped, one that reappears a year
  later is (correctly, for freshness-weighted corpora) re-admitted.
* ``streaming_fingerprint_counts`` — a watermarked count per
  fingerprint per window: the streaming analog of
  ``duplicate_stats``, for monitoring duplicate pressure live.

Reference scope: whylogs has no streaming dedup; this is part of the
beyond-reference LLM-pipeline surface (SURVEY §2.9 covers the
streaming substrate).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from whylogs_spark.ops.dedup import normalized_text


def streaming_exact_dedup(
    stream_df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    extra_keys: Optional[List[str]] = None,
) -> DataFrame:
    """Exact-dedup a stream on the xxhash64 of the normalized text.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state store
    holds only fingerprints newer than the watermark horizon — bounded
    state, no full-corpus key set. The fingerprint column ``__fp`` is
    kept in the output so a downstream batch pass can reconcile across
    horizons if needed.
    """
    ts = F.col(ts_col)
    if "timestamp_ntz" in stream_df.schema[ts_col].dataType.simpleString():
        ts = ts.cast("timestamp")
    fp = stream_df.withColumn(
        "__fp", F.xxhash64(normalized_text(F.col(text_col)))
    ).withColumn("__ts", ts).withWatermark("__ts", watermark)
    keys = ["__fp"] + list(extra_keys or [])
    return fp.dropDuplicatesWithinWatermark(keys).drop("__ts")


def streaming_fingerprint_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    window_duration: str = "10 minutes",
) -> DataFrame:
    """Duplicate-pressure monitor: rows per fingerprint per event-time
    window (count > 1 means duplicates inside the window). A native
    watermarked streaming aggregation — partial agg before the single
    state-keyed exchange, state evicted as windows expire."""
    ts = F.col(ts_col)
    if "timestamp_ntz" in stream_df.schema[ts_col].dataType.simpleString():
        ts = ts.cast("timestamp")
    fp = stream_df.withColumn(
        "__fp", F.xxhash64(normalized_text(F.col(text_col)))
    ).withColumn("__ts", ts)
    return (
        fp.withWatermark("__ts", watermark)
        .groupBy(F.window("__ts", window_duration).alias("window"), "__fp")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("__fp").alias("fingerprint"),
            "n_rows",
            (F.col("n_rows") - 1).alias("n_duplicates"),
        )
    )
