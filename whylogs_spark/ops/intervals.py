"""Interval containment join (point-in-range join).

Spark has no native range join: the naive formulation
``left JOIN right ON ts BETWEEN start AND end`` plans as a
BroadcastNestedLoopJoin (or a cartesian product with a filter) — O(n*m)
and a non-starter at scale. The classic distributed answer, used here,
is TIME-BUCKET EXPANSION: each interval explodes to the fixed-width
buckets it overlaps, each point computes its single bucket, and the
match becomes an EQUI-join on (by-keys..., bucket) plus a residual
containment filter. Shuffle keys are hash-partitionable, Catalyst picks
a normal hash join, and each (point, interval) pair meets in EXACTLY
one bucket (the point's own), so no post-join dedup is needed.

Cost model: the explode fans each interval out to
``floor(end/bucket) - floor(start/bucket) + 1`` rows, so the bucket
should sit on the order of the TYPICAL interval length — fanout is then
O(1) per interval and the plan is two scans + one equi-join at any
scale. The residual filter runs inside the join stage's codegen.

The default ``bucket="auto"`` derives the width IN-PLAN from the
interval-length distribution (one bounded agg over the right side,
broadcast into both sides): ``max(p50_length, max_length/max_fanout,
1s)``. The p50 term keeps typical fanout at ~1 replica per interval;
the max/max_fanout term caps the WORST interval at ``max_fanout + 1``
replicas, so a single year-long outlier among minute-scale intervals
can no longer explode to ~526k rows (it coarsens the grid instead —
more residual-filtered candidates per bucket, a documented trade
against unbounded row amplification). A fixed string bucket remains
available when the caller knows the distribution.

Time handling reuses ops/_time.py ``epoch_secs`` (numeric, TIMESTAMP,
TIMESTAMP_NTZ, DATE/STRING all safe; NTZ stays DST-immune via
wall-clock arithmetic).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import pandas as pd

from ._time import epoch_secs


def _interval_to_secs(interval: str) -> float:
    secs = pd.Timedelta(interval).total_seconds()
    if secs <= 0:
        raise ValueError(f"bucket must be positive: {interval!r}")
    return secs


def auto_bucket_expr(max_fanout: int):
    """The in-plan auto bucket width over a frame that already carries
    ``__ssec``/``__esec``: ``greatest(p50 length, max length /
    max_fanout, 1s)``. Returned as aggregate expressions usable in a
    one-row agg (broadcast into both join sides), so the choice is
    action-free and recomputes per run from the actual distribution."""
    length = F.col("__esec") - F.col("__ssec")
    return F.greatest(
        F.percentile_approx(length, F.lit(0.5)).cast("double"),
        F.max(length) / F.lit(float(max_fanout)),
        F.lit(1.0),
    ).alias("__bsec")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Optional[Sequence[str]] = None,
    bucket: str = "auto",
    max_fanout: int = 256,
) -> DataFrame:
    """Inner-join each left row (a point ``on``) to every right row
    whose closed interval ``[start_col, end_col]`` contains it,
    additionally equi-matching the ``by`` key columns when given.

    ``bucket="auto"`` (default) sizes the bucket from the interval
    lengths in-plan (see module docstring); any fixed pandas-parsable
    width ("1 hour", "15 minutes") opts out. ``max_fanout`` caps the
    bucket replicas of the LONGEST interval under auto sizing.

    Output columns: all left columns, then the right side's non-``by``
    columns. Right rows with NULL or inverted bounds never match; left
    rows with a NULL point never match. Other column-name collisions
    between the sides are the caller's responsibility, as in a plain
    join.
    """
    keys: List[str] = list(by or [])
    lsec = epoch_secs(on, dict(left.dtypes)[on])
    rsec = epoch_secs(start_col, dict(right.dtypes)[start_col])
    esec = epoch_secs(end_col, dict(right.dtypes)[end_col])
    rbase = (
        right.withColumn("__ssec", rsec)
        .withColumn("__esec", esec)
        .filter(F.col("__ssec").isNotNull() & F.col("__esec").isNotNull()
                & (F.col("__ssec") <= F.col("__esec")))
    )
    if bucket == "auto":
        if max_fanout < 1:
            raise ValueError("max_fanout must be >= 1")
        stats = F.broadcast(rbase.agg(auto_bucket_expr(max_fanout)))
        bcol = F.col("__bsec")
    else:
        stats = None
        bcol = F.lit(float(_interval_to_secs(bucket)))
    lb = left.withColumn("__psec", lsec) \
        .filter(F.col("__psec").isNotNull())
    if stats is not None:
        lb = lb.crossJoin(stats)
    lb = lb.withColumn("__bkt", F.floor(F.col("__psec") / bcol)) \
        .drop("__bsec")
    rx = rbase.crossJoin(stats) if stats is not None else rbase
    rx = rx.withColumn(
        "__bkt",
        F.explode(F.sequence(
            F.floor(F.col("__ssec") / bcol),
            F.floor(F.col("__esec") / bcol)))).drop("__bsec")
    # drop the right side's by-columns before the join so the output
    # carries one unambiguous copy (the left's)
    rkeep = [c for c in right.columns if c not in keys]
    rx = rx.select(*rkeep, "__ssec", "__esec", "__bkt") if not keys else \
        rx.select(*keys, *rkeep, "__ssec", "__esec", "__bkt")
    pred = lb["__bkt"] == rx["__bkt"]
    for k in keys:
        pred = pred & (lb[k] == rx[k])
    joined = (
        lb.join(rx, pred, "inner")
        .filter((F.col("__psec") >= F.col("__ssec"))
                & (F.col("__psec") <= F.col("__esec")))
    )
    out = joined
    for c in ([rx[k] for k in keys]
              + [lb["__bkt"], rx["__bkt"], lb["__psec"],
                 rx["__ssec"], rx["__esec"]]):
        out = out.drop(c)
    return out
