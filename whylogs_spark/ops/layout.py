"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group pruning works when each file covers a NARROW range of
the filtered column. Sorting by one column gives perfect pruning on it
and none on the others; interleaving the bits of several normalized
columns (a Z-order / Morton curve) gives every participating column
locality, so multi-dimensional selective scans skip most files. This is
the same technique behind Delta Lake's OPTIMIZE ZORDER BY — here as a
plain column expression plus a repartitionByRange, engine-agnostic.

``with_zorder_key`` is a pure codegen projection: each column is
min-max normalized to ``bits`` bits (bounds from one broadcast 1-row
aggregate, the PSI-edges pattern) and the bits are interleaved with
shift/or expressions — no UDF, no shuffle. ``cluster_by_zorder`` then
range-partitions + sorts-within-partitions on the key, which is exactly
the layout writers need (one ordered write, no global sort on the
driver path; range partitioning samples bounds, the standard Spark
mechanism).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(norm_cols: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each already-normalized integer
    column (value in [0, 2^bits)): bit ``j`` of column ``i`` lands at
    position ``j * k + i``. Total width k*bits must fit a signed long.
    """
    k = len(norm_cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(norm_cols):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
    return z


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Z-order key over ``cols`` (numeric; NULLs normalize to 0).

    Each column is min-max scaled to ``bits`` bits using bounds from a
    single 1-row aggregate over the frame (broadcast cross-join — stays
    in-plan, action-free); a constant column collapses to 0 and simply
    stops contributing to the ordering. The key itself is pure
    shift/and/or codegen: zero shuffle, reproducible in any engine
    (the DuckDB oracle recomputes it bit for bit).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    top = float((1 << bits) - 1)
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
    edges = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(edges))
    norm: List[Column] = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        v = F.col(c).cast("double")
        scaled = F.when(
            hi > lo,
            F.floor((F.coalesce(v, lo) - lo) / (hi - lo) * F.lit(top)),
        ).otherwise(F.lit(0)).cast("long")
        norm.append(F.least(F.greatest(scaled, F.lit(0)),
                            F.lit((1 << bits) - 1)))
    out = out.withColumn(out_col, zorder_key(norm, bits))
    return out.drop(*[f"__{p}_{c}" for c in cols for p in ("lo", "hi")])


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    n_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """Physically cluster the frame along the Z-curve of ``cols``:
    range-partition on the Z-key (sampled bounds — Spark's standard
    mechanism, no global sort) and sort within each partition, so a
    subsequent parquet write yields files whose min/max stats are tight
    on EVERY participating column. The key column is kept for layout
    audits; drop it after writing if undesired.
    """
    keyed = with_zorder_key(df, cols, bits)
    return keyed.repartitionByRange(n_partitions, F.col("zkey")) \
        .sortWithinPartitions("zkey")
