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


def _with_normalized(df: DataFrame, cols: Sequence[str], bits: int):
    """Min-max scale each column to ``bits`` bits using bounds from a
    single 1-row aggregate (broadcast cross-join — in-plan,
    action-free). NULLs normalize to 0; a constant column collapses to
    0 and stops contributing to the ordering. Returns (frame, norm
    exprs, bound-column names to drop)."""
    top = float((1 << bits) - 1)
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
    out = df.crossJoin(F.broadcast(df.agg(*aggs)))
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
    drop = [f"__{p}_{c}" for c in cols for p in ("lo", "hi")]
    return out, norm, drop


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "zkey",
) -> DataFrame:
    """Add a Z-order key over ``cols`` (numeric; NULLs normalize to 0).

    Normalization per ``_with_normalized``; the key itself is pure
    shift/and/or codegen: zero shuffle, reproducible in any engine
    (the DuckDB oracle recomputes it bit for bit).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    out, norm, drop = _with_normalized(df, cols, bits)
    out = out.withColumn(out_col, zorder_key(norm, bits))
    return out.drop(*drop)


def with_hilbert_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    out_col: str = "hkey",
) -> DataFrame:
    """Add a 2-D Hilbert-curve key over exactly two numeric columns.

    The Hilbert curve never jumps: consecutive key values are always
    grid neighbors, so file min/max ranges after clustering are tighter
    than Z-order's (whose diagonal seams put far-apart points on
    adjacent keys) — measurably better row-group pruning for 2-D range
    scans (the lat/lon, time-by-id shape). For 3+ columns use
    ``with_zorder_key``; the quadrant-rotation construction below is
    inherently 2-D and two dimensions is where the pruning gap is
    biggest anyway.

    Construction: the classic per-level quadrant walk (d += s^2 *
    ((3*rx) XOR ry), reflect+swap when ry=0), unrolled into ``bits``
    codegen projection steps carrying (x, y) columns — no UDF, no
    shuffle, same broadcast 1-row normalization as Z-order. The
    reflection can drive intermediates negative exactly as in the
    canonical C code; only low bits are consumed afterward, and long
    arithmetic is two's-complement in Spark, Python and DuckDB alike,
    so the oracle reproduces the key bit for bit.
    """
    if len(cols) != 2:
        raise ValueError(
            f"hilbert key is 2-D: pass exactly 2 cols, got {len(cols)}")
    if bits * 2 > 62:
        raise ValueError(f"2 cols x {bits} bits exceeds a long")
    out, norm, drop = _with_normalized(df, cols, bits)
    out = (
        out.withColumn("__hx", norm[0])
        .withColumn("__hy", norm[1])
        .withColumn(out_col, F.lit(0).cast("long"))
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        out = (
            out.withColumn(
                "__rx",
                F.shiftright(F.col("__hx"), i).bitwiseAND(F.lit(1)))
            .withColumn(
                "__ry",
                F.shiftright(F.col("__hy"), i).bitwiseAND(F.lit(1)))
        )
        rx, ry = F.col("__rx"), F.col("__ry")
        out = out.withColumn(
            out_col,
            F.col(out_col)
            + F.lit(s * s).cast("long")
            * (F.lit(3) * rx).bitwiseXOR(ry).cast("long"))
        nx = (
            F.when(ry == 1, F.col("__hx"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hy"))
            .otherwise(F.col("__hy")))
        ny = (
            F.when(ry == 1, F.col("__hy"))
            .when(rx == 1, F.lit(s - 1) - F.col("__hx"))
            .otherwise(F.col("__hx")))
        out = out.withColumn("__nx", nx).withColumn("__ny", ny) \
            .withColumn("__hx", F.col("__nx")) \
            .withColumn("__hy", F.col("__ny"))
    return out.drop("__hx", "__hy", "__nx", "__ny", "__rx", "__ry",
                    *drop)


def cluster_by_hilbert(
    df: DataFrame,
    cols: Sequence[str],
    n_partitions: int,
    bits: int = 8,
) -> DataFrame:
    """``cluster_by_zorder`` along the Hilbert curve instead: range
    partition on the sampled key bounds + sort within partitions."""
    keyed = with_hilbert_key(df, cols, bits)
    return keyed.repartitionByRange(n_partitions, F.col("hkey")) \
        .sortWithinPartitions("hkey")


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


def layout_report(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Audit the pruning quality of written parquet files: one row per
    file with row count, per-column min/max and ``span_frac_<col>`` —
    the file's value range as a fraction of the global range. Row-group
    pruning skips a file when the filter misses [min, max], so the
    average span fraction IS the expected fraction of files a point
    query must read: ~1.0 means the layout gives that column no
    pruning; a well-clustered column sits near files/range granularity.

    Two aggregations (per-file, then global bounds broadcast back) —
    metadata-scale work, runnable on any table regardless of which
    engine wrote it.
    """
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"min_{c}"), F.max(v).alias(f"max_{c}")]
    per_file = df.groupBy(
        F.input_file_name().alias("file")).agg(*aggs)
    # global bounds fold out of the per-file frame — one data scan
    bounds = per_file.agg(*[
        a for c in cols for a in (
            F.min(f"min_{c}").alias(f"__gmin_{c}"),
            F.max(f"max_{c}").alias(f"__gmax_{c}"))])
    out = per_file.crossJoin(F.broadcast(bounds))
    for c in cols:
        rng = F.col(f"__gmax_{c}") - F.col(f"__gmin_{c}")
        out = out.withColumn(
            f"span_frac_{c}",
            F.when(rng > 0,
                   (F.col(f"max_{c}") - F.col(f"min_{c}")) / rng)
            .otherwise(F.lit(0.0)))
    return out.drop(*[f"__g{p}_{c}" for c in cols
                      for p in ("min", "max")])


def skew_report(
    df: DataFrame,
    cols: Sequence[str],
    top_k: int = 20,
) -> DataFrame:
    """Shuffle-skew diagnosis for a prospective join/groupBy key: the
    ``top_k`` heaviest key values with their row count, share of the
    table, and ``skew`` — the ratio of the key's count to the mean
    rows-per-key. A key with skew 50x at 100 TB means one reducer gets
    50x the work of the average; that's the number that decides
    between a plain shuffle, salting, or the bucketed two-phase
    variants the repo's sessionize/asof operators offer.

    One partial-aggregated groupBy + a TakeOrderedAndProject top-k;
    the distinct-key count rides the same aggregate (no second scan).
    NULL keys count as a key (they hash to one reducer too).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    reserved = {"n", "share", "skew", "total_rows", "n_keys"}
    clash = reserved & set(cols)
    if clash:
        raise ValueError(
            f"key columns {sorted(clash)} collide with the report's "
            f"output columns {sorted(reserved)}; alias them first")
    keyed = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("n"))
    totals = keyed.agg(
        F.sum("n").alias("__rows"),
        F.count(F.lit(1)).alias("__keys"))
    top = keyed.orderBy(F.col("n").desc(), *cols).limit(top_k)
    return top.crossJoin(F.broadcast(totals)).select(
        *cols, "n",
        (F.col("n") / F.col("__rows")).alias("share"),
        # divide BEFORE multiplying: n * n_keys can overflow int64 at
        # the table sizes this report exists for (ANSI mode aborts)
        (F.col("n") / F.col("__rows") * F.col("__keys")).alias("skew"),
        F.col("__rows").alias("total_rows"),
        F.col("__keys").alias("n_keys"))


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    left_keys,
    right_keys=None,
    top_k: int = 20,
) -> DataFrame:
    """Pre-flight skew diagnosis for an equi-join: the ``top_k``
    heaviest join keys by estimated OUTPUT fanout (left count x right
    count per key) — the rows that decide whether a 100 TB join
    finishes or one task receives a billion-row key. Run it BEFORE the
    join; the answer tells you whether to broadcast, salt, or filter.

    Returns ``(key columns…, left_rows, right_rows, fanout)`` ordered
    by fanout descending — keys missing from one side report 0 there
    and fanout 0 (they produce no inner-join output but still show
    one-sided hot spots). NULL keys are excluded (inner equi-joins
    drop them anyway).

    Scale shape: each side collapses to (key -> count) with map-side
    partial aggregation — the hot key this tool exists to find costs
    one row per task, not a shuffle of its rows; the two bounded count
    tables full-outer join on the key; top-k rides
    TakeOrderedAndProject. Never joins the raw frames.
    """
    left_keys = list(left_keys)
    right_keys = list(right_keys or left_keys)
    if len(left_keys) != len(right_keys):
        raise ValueError(
            f"key arity mismatch: {left_keys} vs {right_keys}")
    lc = (left.dropna(how="any", subset=left_keys)
          .groupBy(*left_keys)
          .agg(F.count(F.lit(1)).alias("left_rows")))
    rc = (right.dropna(how="any", subset=right_keys)
          .select(*[F.col(r).alias(l) for l, r in
                    zip(left_keys, right_keys)])
          .groupBy(*left_keys)
          .agg(F.count(F.lit(1)).alias("right_rows")))
    j = lc.join(rc, on=left_keys, how="full")
    l_rows = F.coalesce(F.col("left_rows"), F.lit(0))
    r_rows = F.coalesce(F.col("right_rows"), F.lit(0))
    return (
        j.select(*left_keys,
                 l_rows.alias("left_rows"),
                 r_rows.alias("right_rows"),
                 (l_rows * r_rows).alias("fanout"))
        .orderBy(F.desc("fanout"), F.desc("left_rows"),
                 F.desc("right_rows"), *left_keys)
        .limit(top_k)
    )
