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

    Timezone semantics: the gap test runs on the event-time values
    as-is — for TIMESTAMP_NTZ inputs (parquet without the UTC flag)
    that is pure wall-clock arithmetic, never interpreted in the
    session timezone, so session boundaries cannot shift by an hour
    across a DST transition under a non-UTC session tz (string inputs
    are cast to NTZ for the same reason).
    """
    dt = dict(df.dtypes).get(ts_col, "")
    tcol = (F.col(ts_col) if dt.startswith("timestamp")
            else F.col(ts_col).cast("timestamp_ntz"))
    w = Window.partitionBy(user_col).orderBy(tcol.asc())
    prev = F.lag(tcol).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        prev.isNull() | (tcol > prev + gap_expr)
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
            # timestampdiff on the raw (NTZ) values: wall-clock
            # semantics, matching the oracle's epoch differences. A
            # cast to TIMESTAMP would interpret each endpoint in the
            # session timezone — a session spanning a DST transition
            # under a non-UTC session tz would be off by +/-3600s.
            "duration_sec",
            F.expr("timestampdiff(MICROSECOND, session_start, "
                   "session_end)") / F.lit(1e6))
    )
