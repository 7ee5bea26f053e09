"""Distinct-set overlap between segments via hash-threshold sampling
(bottom-k / KMV-style distinct sketching, fixed-threshold variant).

The reference answers "how many distinct values does this column have"
per profile with an HLL sketch (``python/whylogs/core/metrics/metrics.py``
CardinalityMetric), but HLL unions can't answer the SET questions a
corpus audit needs: how much do two segments' value sets OVERLAP (shared
users across event types, shared vocabulary across sources, shared URLs
across crawls)? The standard mergeable answer is a bottom-k / theta
sketch; the fixed-threshold variant used here (Gibbons' distinct
sampling, the same estimator family as the theta sketch after a fixed
theta) keeps every value whose uniform hash falls below ``p`` — the
surviving set IS a uniform sample of the distinct values, so any set
expression over segments (intersection, union, Jaccard) is estimated by
the same expression over the samples, scaled by ``1/p``. Standard error
of a distinct count d is ~ sqrt((1-p)/(p*d)) relative.

Determinism: the hash is the first 8 hex chars of md5 of the value's
string form — the same engine-portable idiom as ``ops.sampling``'s
hash_split, reproducible verbatim in the DuckDB oracle, so the
"estimates" are deterministic functions of the data and gate-checkable
bit-for-bit.

Scale shape (100 TB framing): the threshold filter is a pure scan-level
predicate (admits ~p of distinct values); ``distinct`` on (segment,
value) partial-aggregates map-side, so a value repeated a billion times
costs one row per map task; the pairwise intersection is a self-join on
the sampled VALUE whose per-key fanout is bounded by the number of
segments containing it (<= n_segments, never data-sized); every
downstream frame is bounded by n_segments or n_segments^2 rows. Nothing
is collected, no window over raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["segment_distinct_overlap", "distinct_sample"]

_HEX_SPACE = 16 ** 8


def _hash_threshold(p: float) -> str:
    t = int(round(min(max(p, 0.0), 1.0) * _HEX_SPACE))
    return format(min(t, _HEX_SPACE - 1), "08x") if t < _HEX_SPACE \
        else "g" * 8  # lexicographically > any hex char: admits all


def _h8(value: Column) -> Column:
    return F.substring(F.md5(value.cast("string")), 1, 8)


def distinct_sample(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    p: float,
) -> DataFrame:
    """Uniform sample of each segment's DISTINCT values: one row per
    (segment, value) whose md5-derived hash lands below ``p``. NULL
    values and NULL segments are excluded (a null has no identity to
    overlap on). ``p=1.0`` degrades gracefully to the exact distinct
    set."""
    if not (0.0 < p <= 1.0):
        raise ValueError(f"p must be in (0, 1]: {p}")
    v = F.col(value_col)
    return (
        df.filter(v.isNotNull() & F.col(segment_col).isNotNull())
        .filter(_h8(v) < F.lit(_hash_threshold(p)))
        .select(F.col(segment_col).alias("segment"),
                v.cast("string").alias("value"))
        .distinct()
    )


def segment_distinct_overlap(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    p: float = 0.1,
) -> DataFrame:
    """Pairwise distinct-set overlap report between segments.

    One row per unordered segment pair (``segment_a < segment_b``,
    including zero-overlap pairs): sampled distinct counts per side and
    in common, plus the scaled estimates —

    ``est_distinct_a/b`` ~ |distinct(a)|, ``est_intersection`` ~
    |distinct(a) & distinct(b)|, ``est_union`` by inclusion-exclusion,
    ``est_jaccard`` = intersection / union (null when the union sample
    is empty). With ``p=1.0`` every estimate is exact.

    The sample is hash-deterministic (md5 threshold), so repeated runs
    — and any engine with md5 — produce identical output; the DuckDB
    oracle recomputes it verbatim.

    Segments are enumerated from the DATA, not the sample: a small
    segment whose values all hash above the threshold still appears in
    every pair (sampled 0, estimates 0) rather than vanishing — the
    honest answer is "the sample saw nothing", not a missing row.
    """
    s = distinct_sample(df, segment_col, value_col, p)
    all_segs = (df.select(F.col(segment_col).alias("segment"))
                .filter(F.col("segment").isNotNull()).distinct())
    per_seg = (
        all_segs.join(
            s.groupBy("segment").agg(
                F.count(F.lit(1)).alias("sampled")),
            on="segment", how="left")
        .withColumn("sampled", F.coalesce(F.col("sampled"), F.lit(0)))
    )
    a = per_seg.select(F.col("segment").alias("segment_a"),
                       F.col("sampled").alias("sampled_a"))
    b = per_seg.select(F.col("segment").alias("segment_b"),
                       F.col("sampled").alias("sampled_b"))
    # all unordered pairs from the (n_segments)-row side tables,
    # broadcast both ways — never touches the sampled values again
    pairs = (
        F.broadcast(a)
        .join(F.broadcast(b),
              F.col("segment_a") < F.col("segment_b"), "inner")
    )
    # intersection counts: self-join the sample on value; per-key
    # fanout bounded by #segments containing the value
    sa = s.select(F.col("segment").alias("segment_a"), "value")
    sb = s.select(F.col("segment").alias("segment_b"), "value")
    common = (
        sa.join(sb, on="value")
        .filter(F.col("segment_a") < F.col("segment_b"))
        .groupBy("segment_a", "segment_b")
        .agg(F.count(F.lit(1)).alias("sampled_common"))
    )
    inv_p = F.lit(1.0 / p)
    out = (
        pairs.join(common, on=["segment_a", "segment_b"], how="left")
        .withColumn("sampled_common",
                    F.coalesce(F.col("sampled_common"), F.lit(0)))
    )
    est_a = F.round(F.col("sampled_a") * inv_p, 4)
    est_b = F.round(F.col("sampled_b") * inv_p, 4)
    est_i = F.round(F.col("sampled_common") * inv_p, 4)
    est_u = F.round(
        (F.col("sampled_a") + F.col("sampled_b")
         - F.col("sampled_common")) * inv_p, 4)
    samp_u = (F.col("sampled_a") + F.col("sampled_b")
              - F.col("sampled_common"))
    jac = F.when(
        samp_u > 0,
        F.round(F.col("sampled_common").cast("double") / samp_u, 6))
    return out.select(
        "segment_a", "segment_b", "sampled_a", "sampled_b",
        "sampled_common",
        est_a.alias("est_distinct_a"), est_b.alias("est_distinct_b"),
        est_i.alias("est_intersection"), est_u.alias("est_union"),
        jac.alias("est_jaccard"),
    )
