"""Categorical feature encoding: frequency encoding and smoothed
target encoding — the feature-prep steps between profiling and model
training.

The reference profiles categorical columns (frequent-items sketches);
turning them into model features is out of its scope but squarely in a
training-data pipeline's. Both encoders here are declarative two-pass
plans: ONE aggregation builds the (category -> statistic) code table,
which joins back by broadcast — the code table is bounded by category
cardinality, never data-sized.

Leakage warning (and why ``target_encode`` smooths): encoding a
category by the mean of the LABEL leaks the label into the feature —
use it on the TRAINING fold only, or check the result with
``ops.stats.target_leakage_report``. The m-estimate smoothing
(Micci-Barreca 2001) shrinks rare categories toward the global mean so
a 1-row category can't memorize its own label.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequency_encode", "target_encode"]


def frequency_encode(
    df: DataFrame,
    column: str,
    out_col: Optional[str] = None,
    relative: bool = True,
) -> DataFrame:
    """Replace-by-frequency: add ``out_col`` (default ``<column>_freq``)
    holding the category's row count (``relative=False``) or its
    fraction of all rows (``relative=True``). NULL categories encode
    like any other value (their own group).

    Plan shape: one partial-agged groupBy builds the code table
    (bounded by category cardinality); the total rides the same
    aggregate via a 1-row branch; the join back is broadcast-hinted —
    a hot category is ONE row in the table, so the join cannot skew.
    """
    name = out_col or f"{column}_freq"
    counts = df.groupBy(column).agg(F.count(F.lit(1)).alias("__cnt"))
    total = counts.agg(F.sum("__cnt").alias("__tot"))
    code = counts.crossJoin(F.broadcast(total))
    val = (F.col("__cnt").cast("double") / F.col("__tot")) if relative \
        else F.col("__cnt").cast("double")
    code = code.select(F.col(column).alias("__cat"), val.alias(name))
    # null-safe join: NULL categories must match their code row; the
    # rename avoids ambiguous self-join lineage
    return (df.join(F.broadcast(code),
                    on=F.col(column).eqNullSafe(F.col("__cat")),
                    how="left")
            .drop("__cat"))


def target_encode(
    df: DataFrame,
    column: str,
    label_col: str,
    smoothing: float = 20.0,
    out_col: Optional[str] = None,
) -> DataFrame:
    """m-estimate target encoding: ``out_col`` (default
    ``<column>_te``) = ``(sum_label + m * global_mean) / (count + m)``
    per category — rare categories shrink toward the global label mean
    (m = ``smoothing``, in pseudo-observations). Rows whose label is
    null/NaN don't contribute to the statistics but still receive
    their category's encoding; NULL categories form their own group.

    LEAKS THE LABEL by construction — fit on the training fold only
    (or accept the bias), and audit with ``target_leakage_report``.

    Plan shape: identical to :func:`frequency_encode` — one bounded
    aggregation, a 1-row global-mean branch, broadcast join back.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0: {smoothing}")
    name = out_col or f"{column}_te"
    y = F.col(label_col).cast("double")
    y = F.when(~F.isnan(y), y)  # NaN -> null; aggregates then skip it
    per = df.groupBy(column).agg(
        F.sum(y).alias("__sum"),
        F.count(y).alias("__cnt"))
    glob = per.agg(
        (F.sum("__sum") / F.sum("__cnt")).alias("__gm"))
    m = F.lit(float(smoothing))
    enc = (F.coalesce(F.col("__sum"), F.lit(0.0)) + m * F.col("__gm")) \
        / (F.col("__cnt") + m)
    code = (per.crossJoin(F.broadcast(glob))
            .select(F.col(column).alias("__cat"),
                    F.when(F.col("__gm").isNotNull(), enc)
                    .alias(name)))
    return (df.join(F.broadcast(code),
                    on=F.col(column).eqNullSafe(F.col("__cat")),
                    how="left")
            .drop("__cat"))
