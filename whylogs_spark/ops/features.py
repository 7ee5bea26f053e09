"""Point-in-time-correct feature engineering over an event stream —
the feature-store primitive a training pipeline needs to build label
rows WITHOUT future leakage: for every event, trailing aggregates of
the entity's history strictly BEFORE that event.

No reference analogue (whylogs profiles features, it does not build
them); the semantics follow the standard feature-store "as-of"
contract: a feature value at time t may only see rows with
timestamp < t (same-instant rows are excluded too — at serving time
they would not have been ingested yet).

Scale shape: ONE shuffle keyed by the entity; every trailing window
is a RANGE frame over the entity's own ordered history, so skew
bound = one entity's event count (the sessionization caveat — a bot
user concentrates in one task, everything else parallelizes).  No
self-joins, no per-window passes: all windows and the recency lag
come out of the same sorted run.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trailing_features", "future_label", "rfm_segmentation"]


def _epoch_seconds(df: DataFrame, time_col: str):
    """Epoch seconds as double for numeric OR timestamp columns
    (TIMESTAMP_NTZ cannot cast straight to double in Spark 4 — it
    must go through TIMESTAMP, which interprets it in the session
    timezone)."""
    from pyspark.sql import types as T

    dt = df.schema[time_col].dataType
    c = F.col(time_col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType,
                       T.DateType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def trailing_features(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    value_col: Optional[str] = None,
    windows_sec: Sequence[int] = (86400 * 7, 86400 * 30),
) -> DataFrame:
    """One row per input event with strictly-past trailing features.

    Adds, for each ``W`` in ``windows_sec`` (suffix = the window in
    whole days when divisible, else seconds):

    * ``cnt_<suffix>``  — events in ``[t−W, t)``
    * ``sum_<suffix>`` / ``avg_<suffix>`` — of ``value_col`` (when
      given) over the same frame

    plus ``seconds_since_prev`` (null for the entity's first event;
    simultaneous earlier events do not count — strictly smaller
    timestamp) and ``prior_events`` (the entity's lifetime event
    count before t).

    The frame is ``RANGE BETWEEN W PRECEDING AND 1 PRECEDING`` over
    epoch seconds, so ties at the SAME timestamp see identical
    features (none of each other) — deterministic without a
    tiebreak column, and point-in-time honest: a same-instant event
    has not been ingested yet when this one is scored.
    """
    if not windows_sec:
        raise ValueError("windows_sec must be non-empty")
    if any(w <= 0 for w in windows_sec):
        raise ValueError(f"windows must be positive: {windows_sec}")
    t = _epoch_seconds(df, time_col)
    base = df.filter(
        F.col(entity_col).isNotNull() & t.isNotNull()
    ).withColumn("__ep", t)

    def _suffix(w: int) -> str:
        return f"{w // 86400}d" if w % 86400 == 0 else f"{w}s"

    cols: List = [F.col(c) for c in df.columns]
    for w in windows_sec:
        fr = (Window.partitionBy(entity_col).orderBy(F.col("__ep"))
              .rangeBetween(-int(w), -1))
        sfx = _suffix(int(w))
        cols.append(F.coalesce(F.count(F.lit(1)).over(fr), F.lit(0))
                    .alias(f"cnt_{sfx}"))
        if value_col is not None:
            v = F.col(value_col).cast("double")
            cols.append(F.sum(v).over(fr).alias(f"sum_{sfx}"))
            cols.append(F.avg(v).over(fr).alias(f"avg_{sfx}"))
    life = (Window.partitionBy(entity_col).orderBy(F.col("__ep"))
            .rangeBetween(Window.unboundedPreceding, -1))
    cols.append(F.coalesce(F.count(F.lit(1)).over(life), F.lit(0))
                .alias("prior_events"))
    cols.append((F.col("__ep") - F.max("__ep").over(life))
                .alias("seconds_since_prev"))
    return base.select(*cols)


def future_label(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    horizon_sec: float,
    value_col: Optional[str] = None,
    prefix: str = "future",
) -> DataFrame:
    """Training-LABEL construction, the forward mirror of
    :func:`trailing_features`: for every event, what the entity does
    in the strictly-future window ``(t, t + horizon]`` — churn /
    conversion / next-purchase labels built with the same
    no-leakage discipline as the features (the current instant is
    excluded on BOTH sides, so a row never labels itself).

    Adds ``<prefix>_count`` (events in the window),
    ``<prefix>_any`` (count > 0 — the binary label) and, with
    ``value_col``, ``<prefix>_sum``.

    Same scale shape as the feature side: one shuffle on the entity,
    RANGE frames over the sorted run, skew bound = one entity.
    """
    if horizon_sec <= 0:
        raise ValueError(f"horizon_sec must be > 0: {horizon_sec}")
    t = _epoch_seconds(df, time_col)
    base = df.filter(
        F.col(entity_col).isNotNull() & t.isNotNull()
    ).withColumn("__ep", t)
    fr = (Window.partitionBy(entity_col).orderBy(F.col("__ep"))
          .rangeBetween(1, int(horizon_sec)))
    cols: List = [F.col(c) for c in df.columns]
    cnt = F.coalesce(F.count(F.lit(1)).over(fr), F.lit(0))
    cols.append(cnt.alias(f"{prefix}_count"))
    cols.append((cnt > 0).alias(f"{prefix}_any"))
    if value_col is not None:
        cols.append(F.sum(F.col(value_col).cast("double")).over(fr)
                    .alias(f"{prefix}_sum"))
    return base.select(*cols)


def rfm_segmentation(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    value_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quantile scores per
    entity — the classic behavioral-segmentation table.  One row per
    entity: ``(entity, last_ts, frequency, monetary, r_score,
    f_score, m_score, rfm_cell)`` with each score in 1..n_bins from
    the EXACT percentile cuts of the per-entity metric (strict-greater
    binning, ties collapse bins), higher = more recent / more
    frequent / more valuable, and ``rfm_cell`` the concatenated
    "545"-style segment label.

    Scale shape: pass 1 partial-aggs rows to one row per entity;
    pass 2 is ONE global aggregate computing all three cut arrays
    (broadcast back); scoring is three map-side array filters.  No
    window, no join beyond the 1-row broadcast.
    """
    if n_bins < 2:
        raise ValueError(f"rfm needs n_bins >= 2, got {n_bins}")
    t = _epoch_seconds(df, time_col)
    v = F.col(value_col).cast("double")
    per = (df.filter(F.col(entity_col).isNotNull() & t.isNotNull()
                     & v.isNotNull() & ~F.isnan(v))
           .groupBy(entity_col)
           .agg(F.max(t).alias("last_ts"),
                F.count(F.lit(1)).cast("double").alias("frequency"),
                F.sum(v).alias("monetary")))
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = per.agg(
        F.expr(f"percentile(last_ts, array({qs}))").alias("__cr"),
        F.expr(f"percentile(frequency, array({qs}))").alias("__cf"),
        F.expr(f"percentile(monetary, array({qs}))").alias("__cm"))
    j = per.crossJoin(F.broadcast(cuts))
    r = F.expr("size(filter(__cr, c -> last_ts > c))") + 1
    f_ = F.expr("size(filter(__cf, c -> frequency > c))") + 1
    m = F.expr("size(filter(__cm, c -> monetary > c))") + 1
    return j.select(
        entity_col, "last_ts",
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
        r.cast("int").alias("r_score"),
        f_.cast("int").alias("f_score"),
        m.cast("int").alias("m_score"),
        F.concat(r.cast("string"), f_.cast("string"),
                 m.cast("string")).alias("rfm_cell"))
