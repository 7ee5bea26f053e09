"""As-of (point-in-time) join — a temporal operator Spark's DataFrame
API lacks as a built-in.

For every left row, attach the right row with the greatest timestamp
``<=`` the left timestamp within the same key (``direction="backward"``;
``"forward"`` takes the smallest timestamp ``>=``). The standard
operator for joining a fact stream to slowly-arriving state — features
to labels, trades to quotes, clicks to the most recent purchase.

The reference engine has no temporal-join surface; this belongs to the
training-pipeline superset (SURVEY §2.12). DuckDB's native ``ASOF JOIN``
provides an exact cross-engine oracle.

Scale shape — the naive formulations both die at 100 TB:

* ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` + max-per-row: a range
  join; Spark plans a per-key cross product, O(|l|x|r|) within key.
* per-row subquery: not expressible distributedly.

This implementation is the union + carry-forward shape: tag both sides,
union (a zero-cost concatenation of scans — no join node at all), ONE
shuffle on the key, then within each key partition an ordered window
``last(value, ignorenulls=true)`` carries the most recent right-side
values onto each left row. Cost is one exchange + one in-partition sort
of |l|+|r| rows, independent of how many right rows precede each left
row. Whole plan is built-ins (Window over codegen'd sort), no Python.

Hot-key hazard and its mitigation: with the default single-phase plan
a single hot key (a bot user with 10^8 events) serializes into one
partition. Pass ``hot_key_buckets`` (an interval, e.g. ``"1 day"``)
to switch to the two-phase plan: the carry-forward window partitions
by (key, time-bucket) — the hot key's rows spread across buckets — and
a second, per-bucket-CLOSE rollup (one row per (key, bucket), tiny)
carries values across bucket boundaries. Same result, skew bounded by
a single key-bucket's volume.

Default policy (measured, bench ``asof_hot10x_*`` rows): single-phase
stays the default because it wins on every shape the bench can
produce — even with one bot key owning 500k of 1M rows (sf0.1 10x
rehearsal, 32 cores) single-phase ran 1.4 s vs two-phase 2.4 s, since
a 10^5-10^6-row in-task sort is cheap and the two-phase plan does ~2x
the task-seconds (extra windows + rollup join). The crossover is where
one key's rows stop fitting a single task's sort budget — ~10^7-10^8
rows per key (per-key volume, not table size). Rule of thumb: switch
on ``hot_key_buckets`` when max rows-per-key x row width approaches
executor task memory, and pick a bucket interval that splits the hot
key into >= O(cores) slices.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_BKT = "__asof_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    direction: str = "backward",
    tolerance: Optional[str] = None,
    value_cols: Optional[Sequence[str]] = None,
    matched_ts_col: str = "matched_ts",
    suffix: str = "_r",
    hot_key_buckets: Optional[str] = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right side's
    ``value_cols`` from the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) the left row's ``on``
    timestamp with equal ``by`` keys; nulls when no such row exists (or
    when it is further than ``tolerance``, an SQL interval string like
    ``'2 days'``).

    Right rows must be unique per (by, on) — pre-aggregate duplicates
    (the match at an exactly-tied timestamp is otherwise ambiguous; the
    same precondition DuckDB's ASOF JOIN leaves implementation-defined).
    ``matched_ts_col`` receives the matched right timestamp. Right value
    columns that collide with left column names get ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by + [on]]
    value_cols = list(value_cols)

    left_payload = [c for c in left.columns if c not in by and c != on]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltype_on = left.schema[on].dataType

    def rname(c: str) -> str:
        return c + suffix if c in left.columns else c

    # one common projection per side; union is plan-level concatenation
    lrows = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(rtypes[c]).alias(rname(c)) for c in value_cols],
        F.lit(None).cast(rtypes[on]).alias(matched_ts_col),
    )
    rrows = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
        *[F.col(c).alias(rname(c)) for c in value_cols],
        F.col(on).alias(matched_ts_col),
    )
    unioned = lrows.unionByName(rrows)

    # backward: ascending ts; a right row (side 0) at the same ts sorts
    # BEFORE the left row, so "at-or-before" includes exact ties.
    # forward: descending ts, same tie rule gives "at-or-after".
    ts_order = (F.col(_TS).asc() if direction == "backward"
                else F.col(_TS).desc())
    carry_cols = [rname(c) for c in value_cols] + [matched_ts_col]

    if hot_key_buckets is None:
        w = (
            Window.partitionBy(*by)
            .orderBy(ts_order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = unioned.select(
            *by, F.col(_TS), F.col(_SIDE), *left_payload,
            *[F.last(F.col(c), ignorenulls=True).over(w).alias(c)
              for c in carry_cols],
        ).filter(F.col(_SIDE) == 1)
    else:
        # two-phase skew-bounded plan: carry within (key, time-bucket),
        # then bridge bucket boundaries with a per-bucket-close rollup
        # (one row per (key, bucket) — orders of magnitude smaller).
        from whylogs_spark.ops._time import epoch_secs, interval_seconds

        bucket_sec = interval_seconds(hot_key_buckets,
                                      "hot_key_buckets")

        secs = epoch_secs(_TS, dict(unioned.dtypes)[_TS])
        bucketed = unioned.withColumn(
            _BKT, F.floor(secs / F.lit(bucket_sec)).cast("long"))
        w1 = (
            Window.partitionBy(*by, _BKT)
            .orderBy(ts_order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        in_bucket = bucketed.select(
            *by, F.col(_BKT), F.col(_TS), F.col(_SIDE), *left_payload,
            *[F.last(F.col(c), ignorenulls=True).over(w1).alias(c)
              for c in carry_cols],
        ).filter(F.col(_SIDE) == 1)
        # per-bucket close of the RIGHT side (right rows are unique per
        # (by, on), so max_by/min_by on the timestamp is unambiguous).
        # The ordering expr is nulled for NULL-valued rows — max_by/
        # min_by skip rows whose ordering expr is null, so each close is
        # the last NON-NULL value in the bucket, matching the
        # single-phase per-column last(value, ignorenulls=True) carry
        # (a boundary-most NULL must not shadow an earlier real value).
        pick = F.max_by if direction == "backward" else F.min_by
        closes = (
            bucketed.filter(F.col(_SIDE) == 0)
            .groupBy(*by, _BKT)
            .agg(*[
                pick(
                    F.col(c),
                    F.when(F.col(c).isNotNull(), F.col(_TS)),
                ).alias(f"__cl_{c}")
                for c in carry_cols
            ])
        )
        # every bucket present on either side, so a left bucket with no
        # right rows still finds the latest EARLIER close via the
        # offset window (frame excludes the current bucket)
        buckets = bucketed.select(*by, _BKT).distinct()
        bkt_order = (F.col(_BKT).asc() if direction == "backward"
                     else F.col(_BKT).desc())
        w2 = (
            Window.partitionBy(*by).orderBy(bkt_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = buckets.join(closes, on=by + [_BKT], how="left").select(
            *by, F.col(_BKT),
            *[F.last(F.col(f"__cl_{c}"), ignorenulls=True).over(w2)
              .alias(f"__pv_{c}") for c in carry_cols],
        )
        # (key, bucket) join keys: the hot key is spread across buckets
        out = in_bucket.join(prev, on=by + [_BKT], how="left").select(
            *by, F.col(_TS), F.col(_SIDE), *left_payload,
            *[F.coalesce(F.col(c), F.col(f"__pv_{c}")).alias(c)
              for c in carry_cols],
        )

    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        in_range = (
            F.col(matched_ts_col) >= F.col(_TS) - iv
            if direction == "backward"
            else F.col(matched_ts_col) <= F.col(_TS) + iv
        )
        keep = F.col(matched_ts_col).isNotNull() & in_range
        out = out.select(
            *by, F.col(_TS), F.col(_SIDE), *left_payload,
            *[F.when(keep, F.col(rname(c))).alias(rname(c))
              for c in value_cols],
            F.when(keep, F.col(matched_ts_col)).alias(matched_ts_col),
        )

    return out.select(
        *by,
        F.col(_TS).cast(ltype_on).alias(on),
        *left_payload,
        *[F.col(rname(c)) for c in value_cols],
        F.col(matched_ts_col),
    )
