"""Cross-table schema matching: which columns of table A correspond
to which columns of table B — the data-discovery step before joining,
unioning, or migrating two undocumented tables (the classic schema-
matching problem; instance-based + name-based hybrid à la COMA).

Signals, all bounded:

* ``name_sim``    — difflib SequenceMatcher ratio of the lowercased
  column names (driver-side; the name list is tiny — a pure function
  of schema metadata, so oracles can inline it as constants).
* ``type_class``  — string / integral / fractional / temporal /
  boolean compatibility (only same-class pairs are emitted).
* ``value_jaccard`` — Jaccard overlap of the two columns' distinct
  values, each side capped at ``sample_distinct`` values chosen by
  md5 order (deterministic, engine-replayable).  Computed for string
  and integral classes, where canonical string forms agree across
  engines; fractional/temporal columns match on name + type only
  (float formatting is engine-specific).

Scale shape: each table unpivots its compared columns into ONE
(col, value) long frame; a groupBy dedups values map-side, a
TWO-PHASE md5 rank caps each column's distinct set (local rank per
(col, partition) keeps ``cap`` per partition, then a global rank
over the ≤ cap × shuffle-partitions survivors — no reducer ever
sees a full column), and the A×B overlap is one equi-join on the
value keyed by the capped sets — shuffle volume ≤ 2 · n_cols ·
sample_distinct rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["column_matches"]

_CLASSES = (
    (T.StringType, "string"),
    ((T.ByteType, T.ShortType, T.IntegerType, T.LongType), "integral"),
    ((T.FloatType, T.DoubleType, T.DecimalType), "fractional"),
    ((T.DateType, T.TimestampType, T.TimestampNTZType), "temporal"),
    (T.BooleanType, "boolean"),
)


def _type_class(dt) -> Optional[str]:
    for klass, name in _CLASSES:
        if isinstance(dt, klass):
            return name
    return None


def _name_sim(a: str, b: str) -> float:
    import difflib

    la, lb = a.lower(), b.lower()
    if not la and not lb:
        return 1.0
    # Levenshtein-equivalent ratio from stdlib difflib (no deps);
    # symmetric, in [0, 1]
    return difflib.SequenceMatcher(None, la, lb).ratio()


def _capped_distincts(df: DataFrame, cols: Sequence[str],
                      cap: int, tag: str) -> DataFrame:
    """(col, v) long frame of each column's md5-capped distinct
    values, canonicalized to strings.

    Two-phase cap so no reducer ever ranks a full column's distinct
    set: phase 1 ranks within ``(col, distinct-output partition)``
    and keeps ``cap`` per partition — the global cap-smallest md5s
    are a subset of the per-partition survivors, so phase 2's global
    md5 rank (over ≤ cap × shuffle-partitions rows per column) emits
    the identical set a single global rank would (md5 order is
    total).  A 100 TB column with billions of distinct values used
    to funnel its whole distinct set through one window reducer."""
    colk = f"__col_{tag}"
    # ONE scan unpivoted via inline(array(struct...)) instead of a
    # union of per-column selects (r13: the union shape planned one
    # scan branch per column — n_cols x scan-partitions tasks per
    # consumer stage and n_cols passes over the table; the inline
    # reads every compared column in a single pass)
    long_df = df.select(F.inline(F.array(*[
        F.struct(F.lit(c).alias(colk),
                 F.col(c).cast("string").alias("__v"))
        for c in cols])))
    long_df = long_df.filter(F.col("__v").isNotNull())
    dedup = long_df.distinct()
    # pin the partition id as a column BEFORE the window's exchange
    w_local = Window.partitionBy(colk, "__pid").orderBy(F.md5("__v"))
    pre = (dedup.withColumn("__pid", F.spark_partition_id())
           .withColumn("__rk", F.row_number().over(w_local))
           .filter(F.col("__rk") <= cap).drop("__rk", "__pid"))
    w = Window.partitionBy(colk).orderBy(F.md5("__v"))
    return (pre.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= cap).drop("__rk"))


def column_matches(
    dfa: DataFrame,
    dfb: DataFrame,
    sample_distinct: int = 2000,
    min_score: float = 0.0,
) -> DataFrame:
    """One row per compatible (col_a, col_b) pair: ``(col_a, col_b,
    type_class, name_sim, n_a, n_b, n_common, value_jaccard,
    score)``, ``score = (name_sim + coalesce(value_jaccard,
    name_sim)) / 2`` so value evidence dominates when available and
    name evidence stands alone otherwise.  Rows below ``min_score``
    are dropped.  ``n_a``/``n_b`` are the CAPPED distinct counts the
    Jaccard is computed over (≤ ``sample_distinct``)."""
    if sample_distinct < 1:
        raise ValueError(
            f"sample_distinct must be >= 1: {sample_distinct}")
    spark = dfa.sparkSession
    ca = {f.name: _type_class(f.dataType) for f in dfa.schema.fields}
    cb = {f.name: _type_class(f.dataType) for f in dfb.schema.fields}
    pairs = [
        (a, b, ta)
        for a, ta in ca.items() if ta is not None
        for b, tb in cb.items() if tb == ta
    ]
    if not pairs:
        raise ValueError("no type-compatible column pairs")
    meta = spark.createDataFrame(
        [(a, b, tc, float(_name_sim(a, b)),
          tc in ("string", "integral")) for a, b, tc in pairs],
        "col_a string, col_b string, type_class string, "
        "name_sim double, cmp boolean")

    va_cols = sorted({a for a, _, tc in pairs
                      if tc in ("string", "integral")})
    vb_cols = sorted({b for _, b, tc in pairs
                      if tc in ("string", "integral")})
    if va_cols and vb_cols:
        va = _capped_distincts(dfa, va_cols, sample_distinct, "a")
        vb = _capped_distincts(dfb, vb_cols, sample_distinct, "b")
        na = va.groupBy("__col_a").agg(F.count(F.lit(1)).alias("n_a"))
        nb = vb.groupBy("__col_b").agg(F.count(F.lit(1)).alias("n_b"))
        common = (va.join(vb, "__v")
                  .groupBy("__col_a", "__col_b")
                  .agg(F.count(F.lit(1)).alias("n_common")))
        overlap = (
            na.crossJoin(nb)
            .join(common, ["__col_a", "__col_b"], "left")
            .select(F.col("__col_a").alias("col_a"),
                    F.col("__col_b").alias("col_b"),
                    "n_a", "n_b",
                    F.coalesce("n_common", F.lit(0))
                    .alias("n_common"))
        )
        out = meta.join(F.broadcast(overlap), ["col_a", "col_b"],
                        "left")
    else:
        out = meta.select(
            "*", F.lit(None).cast("long").alias("n_a"),
            F.lit(None).cast("long").alias("n_b"),
            F.lit(None).cast("long").alias("n_common"))
    jac = F.when(
        F.col("cmp") & F.col("n_a").isNotNull(),
        F.col("n_common").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
    out = out.select(
        "col_a", "col_b", "type_class", "name_sim",
        F.when(F.col("cmp"), F.col("n_a")).alias("n_a"),
        F.when(F.col("cmp"), F.col("n_b")).alias("n_b"),
        F.when(F.col("cmp"), F.col("n_common")).alias("n_common"),
        jac.alias("value_jaccard"),
        ((F.col("name_sim")
          + F.coalesce(jac, F.col("name_sim"))) / 2.0).alias("score"))
    return out.filter(F.col("score") >= F.lit(float(min_score)))
