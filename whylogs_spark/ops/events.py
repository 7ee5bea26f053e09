"""Event-stream operators for training-data pipelines.

Beyond the reference (which has no event-stream processing): gap-based
sessionization and session statistics, the standard preprocessing step
for behavioral / clickstream training data.

Scale shape: ONE shuffle keyed by the actor column (window partitioning),
then everything is within-partition window functions and one grouped
aggregation that reuses the same partitioning (no second exchange).
Skewed actors (bots) are the known hazard — cap or pre-filter heavy
users upstream if one user's events exceed a partition's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the user's previous event exceeds ``gap``.

    session_id is ``<user>#<k>`` with k the per-user session ordinal —
    deterministic and reproducible in plain SQL (lag + conditional
    cumulative sum), so an exact oracle exists in any engine.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        prev.isNull()
        | (F.col(ts_col).cast("timestamp")
           > prev.cast("timestamp") + gap_expr)
    ).cast("long")
    k = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(
        session_col,
        F.concat(F.col(user_col).cast("string"), F.lit("#"),
                 k.cast("string")))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """(user, session_id, n_events, session_start, session_end,
    duration_sec) — one row per session; the groupBy reuses the window's
    hash partitioning on user, so sessionize+stats is one shuffle total."""
    s = sessionize(df, user_col, ts_col, gap)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            # NTZ timestamps (parquet timestamp[us] without UTC flag)
            # cannot cast straight to double; go via TIMESTAMP first.
            # Differences cancel any session-timezone interpretation.
            "duration_sec",
            F.col("session_end").cast("timestamp").cast("double")
            - F.col("session_start").cast("timestamp").cast("double"))
    )
