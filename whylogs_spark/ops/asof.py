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
Known hazard: a single hot key serializes into one partition — salt or
split hot keys upstream if one key's rows exceed executor memory.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


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
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried: List = [
        F.last(F.col(rname(c)), ignorenulls=True).over(w).alias(rname(c))
        for c in value_cols
    ]
    carried_ts = F.last(F.col(matched_ts_col), ignorenulls=True).over(w)

    out = unioned.select(
        *by, F.col(_TS), F.col(_SIDE), *left_payload,
        *carried, carried_ts.alias(matched_ts_col),
    ).filter(F.col(_SIDE) == 1)

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
