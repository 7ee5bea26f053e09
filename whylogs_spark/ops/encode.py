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

__all__ = ["frequency_encode", "target_encode", "woe_iv"]


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


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Weight-of-evidence / information-value table for a numeric
    feature against a binary label — the scorecard-industry standard
    for "how predictive is this feature" (Siddiqi 2006).

    Equal-frequency bins from the EXACT ``percentile`` cut points at
    i/bins (ties collapse bins; empty bins drop).  One row per
    occupied bin: ``(bin, lo, hi, n, n_pos, pos_rate, p_pos, p_neg,
    woe, iv_contrib)`` where ``p_pos``/``p_neg`` are the bin's share
    of all positives/negatives, ``woe = ln(p_pos/p_neg)`` (null when
    either side is empty — no fake smoothing), and
    ``iv_contrib = (p_pos − p_neg)·woe`` (0 when woe is null; sum it
    for the feature's IV).  Bin rule: value ≤ first cut → bin 0,
    else the count of cut points strictly below the value.

    Scale shape: pass 1 is ONE partial-agged global aggregate
    (exact-percentile cuts + class totals, a 1-row frame broadcast
    back); pass 2 bins rows map-side with a higher-order array filter
    (no UDF) and reduces to ≤``bins`` rows.  No data-sized shuffle
    beyond the percentile's own exchange; no window over the raw
    frame.  The label must be 0/1-coercible; null feature or label
    rows drop.
    """
    if bins < 2:
        raise ValueError(f"woe_iv needs bins >= 2, got {bins}")
    x = F.col(feature_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        x.isNotNull() & ~F.isnan(x) & y.isNotNull()
    ).select(x.alias("__x"), y.alias("__y"))
    qs = ", ".join(str(i / bins) for i in range(1, bins))
    head = base.agg(
        F.expr(f"percentile(__x, array({qs}))").alias("__cuts"),
        F.sum("__y").alias("__tot_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).alias("__tot_neg"))
    binned = base.crossJoin(F.broadcast(head)).select(
        F.expr("size(filter(__cuts, c -> __x > c))").alias("bin"),
        "__x", "__y", "__tot_pos", "__tot_neg")
    per = binned.groupBy("bin").agg(
        F.min("__x").alias("lo"),
        F.max("__x").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").cast("double").alias("n_pos"),
        F.first("__tot_pos").alias("__tp"),
        F.first("__tot_neg").alias("__tn"))
    n_neg = F.col("n") - F.col("n_pos")
    p_pos = F.when(F.col("__tp") > 0, F.col("n_pos") / F.col("__tp"))
    p_neg = F.when(F.col("__tn") > 0, n_neg / F.col("__tn"))
    woe = F.when((F.col("n_pos") > 0) & (n_neg > 0),
                 F.log(p_pos / p_neg))
    iv = F.when(woe.isNotNull(),
                (p_pos - p_neg) * woe).otherwise(F.lit(0.0))
    return per.select(
        "bin", "lo", "hi", "n",
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n_pos") / F.col("n")).alias("pos_rate"),
        p_pos.alias("p_pos"), p_neg.alias("p_neg"),
        woe.alias("woe"), iv.alias("iv_contrib"))
