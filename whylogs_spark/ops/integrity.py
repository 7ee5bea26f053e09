"""Relational data-quality checks: referential integrity, k-anonymity,
Benford conformity, and corpus snapshot diffing.

The reference profiles single tables (constraints over one profile —
``python/whylogs/core/constraints/factories``); a production training
-data pipeline also has to validate the *relationships* between tables
(fact -> dimension joins that silently drop rows), the *re-identification
risk* of quasi-identifier combinations before a corpus is shared, the
*plausibility* of numeric columns (Benford's law is the standard
forensic screen for fabricated or truncated numeric feeds), and the
*churn* between two crawl snapshots. These are beyond-reference,
first-class pipeline operators.

Scale notes (100 TB framing):

* ``referential_integrity`` collapses the child table to its DISTINCT
  key space with a map-side partial aggregation BEFORE any join — the
  anti-join shuffles |distinct keys| rows, never |child rows|. The
  parent side ships only its key columns (column-pruned scan) and is
  broadcast when the caller knows it is dimension-sized.
* ``k_anonymity_report`` is two hash aggregations (group sizes, then a
  1-row rollup); both partial-aggregate map-side, so a hot
  quasi-identifier combination (millions of identical rows) costs one
  combined row per task, not a shuffle of the raw rows.
* ``benford_test`` reduces to a 9-row (or 90-row) grouped frame in one
  pass; every per-digit expression is a codegen'd arithmetic
  expression — no string round-trip of the numeric column, no UDF.
* ``snapshot_diff`` hashes the compared columns down to one 8-byte
  fingerprint per row BEFORE the full-outer join, so the shuffle
  carries (id, hash) instead of document bodies — at crawl scale that
  is the difference between shuffling gigabytes and terabytes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "candidate_keys",
    "referential_integrity",
    "orphan_keys",
    "k_anonymity_report",
    "k_risk_groups",
    "benford_test",
    "snapshot_diff",
    "snapshot_diff_summary",
    "functional_dependency_report",
    "fd_violation_examples",
    "anonymize",
    "chi2_gof",
    "relationship_report",
]


def _any_null(cols: Sequence[str]) -> Column:
    c = F.col(cols[0]).isNull()
    for name in cols[1:]:
        c = c | F.col(name).isNull()
    return c


def _child_parent_join(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Optional[Sequence[str]],
    broadcast_parent: bool,
) -> DataFrame:
    """Grouped child keys LEFT-joined to the parent's distinct key set.

    Returns one row per distinct child key (nulls included) with
    ``__child_rows`` and a ``__matched`` flag. The child collapses to
    its key space first (partial agg), so the join input is bounded by
    key cardinality regardless of fact-table row count.
    """
    child_keys = list(child_keys)
    parent_keys = list(parent_keys or child_keys)
    if len(child_keys) != len(parent_keys):
        raise ValueError(
            f"key arity mismatch: {child_keys} vs {parent_keys}")
    g = child.groupBy(*child_keys).agg(F.count("*").alias("__child_rows"))
    pk = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
    ).dropna(how="any").distinct().withColumn("__matched", F.lit(True))
    if broadcast_parent:
        pk = F.broadcast(pk)
    return g.join(pk, on=child_keys, how="left")


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Optional[Sequence[str]] = None,
    relation: Optional[str] = None,
    broadcast_parent: bool = False,
) -> DataFrame:
    """One-row foreign-key health report for ``child.child_keys ->
    parent.parent_keys``.

    Columns: ``relation, child_rows, null_key_rows, matched_rows,
    orphan_rows, orphan_keys, match_rate``. SQL FK semantics: a child
    key with ANY null component neither matches nor violates — it is
    reported separately in ``null_key_rows`` and excluded from
    ``match_rate``'s denominator (``matched / (child_rows - null_key
    _rows)``, null when no non-null keys exist).

    Plan shape: partial-agg distinct of the child -> left join to the
    parent's pruned distinct keys -> single 1-row rollup. Set
    ``broadcast_parent=True`` for dimension-sized parents (nation,
    region, calendar); otherwise AQE picks the strategy from runtime
    sizes.
    """
    child_keys = list(child_keys)
    j = _child_parent_join(child, parent, child_keys, parent_keys,
                           broadcast_parent)
    isnull = _any_null(child_keys)
    rows = F.col("__child_rows")
    matched = F.sum(F.when(F.col("__matched").isNotNull(), rows)
                    .otherwise(F.lit(0)))
    nulls = F.sum(F.when(isnull, rows).otherwise(F.lit(0)))
    orphan_rows = F.sum(
        F.when(F.col("__matched").isNull() & ~isnull, rows)
        .otherwise(F.lit(0)))
    orphan_keys_ = F.sum(
        F.when(F.col("__matched").isNull() & ~isnull, F.lit(1))
        .otherwise(F.lit(0)))
    name = relation or "->".join(
        [",".join(child_keys), ",".join(list(parent_keys or child_keys))])
    out = j.agg(
        F.sum(rows).alias("child_rows"),
        nulls.alias("null_key_rows"),
        matched.alias("matched_rows"),
        orphan_rows.alias("orphan_rows"),
        orphan_keys_.alias("orphan_keys"),
    )
    denom = F.col("child_rows") - F.col("null_key_rows")
    return out.select(
        F.lit(name).alias("relation"),
        F.coalesce(F.col("child_rows"), F.lit(0)).alias("child_rows"),
        F.coalesce(F.col("null_key_rows"), F.lit(0))
        .alias("null_key_rows"),
        F.coalesce(F.col("matched_rows"), F.lit(0)).alias("matched_rows"),
        F.coalesce(F.col("orphan_rows"), F.lit(0)).alias("orphan_rows"),
        F.coalesce(F.col("orphan_keys"), F.lit(0)).alias("orphan_keys"),
        F.when(denom > 0,
               F.round(F.col("matched_rows") / denom, 6))
        .alias("match_rate"),
    )


def orphan_keys(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Optional[Sequence[str]] = None,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Drill-down companion to :func:`referential_integrity`: one row
    per distinct non-null child key missing from the parent, with the
    count of child rows it strands (``child_rows``). Same bounded join
    shape — never materializes raw child rows."""
    child_keys = list(child_keys)
    j = _child_parent_join(child, parent, child_keys, parent_keys,
                           broadcast_parent)
    return (j.filter(F.col("__matched").isNull()
                     & ~_any_null(child_keys))
            .select(*child_keys,
                    F.col("__child_rows").alias("child_rows")))


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
) -> DataFrame:
    """One-row k-anonymity (and optional l-diversity) summary over the
    quasi-identifier combination ``quasi_cols`` (Sweeney 2002; Machana-
    vajjhala et al. 2007 for l-diversity).

    Columns: ``n_rows, n_groups, k_anonymity`` (the minimum group
    size — the dataset IS k-anonymous for that k), ``groups_below_k,
    rows_below_k, pct_rows_below_k`` (re-identification exposure at the
    requested ``k``), ``singleton_rows`` (equivalence classes of size
    1 — unique individuals). With ``sensitive_col``: ``l_diversity``
    (minimum distinct sensitive values per group, nulls excluded per
    COUNT DISTINCT semantics) and ``rows_l1`` (rows in groups whose
    sensitive attribute is constant — attribute-disclosure exposure).

    NULL quasi-identifier values form their own equivalence class
    (GROUP BY semantics) — correct for risk purposes, since rows
    sharing "missing" are mutually indistinguishable.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    quasi_cols = list(quasi_cols)
    aggs = [F.count("*").alias("__gn")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("__gl"))
    g = df.groupBy(*quasi_cols).agg(*aggs)
    gn = F.col("__gn")
    out = [
        F.sum(gn).alias("n_rows"),
        F.count("*").alias("n_groups"),
        F.min(gn).alias("k_anonymity"),
        F.sum(F.when(gn < k, F.lit(1)).otherwise(F.lit(0)))
        .alias("groups_below_k"),
        F.sum(F.when(gn < k, gn).otherwise(F.lit(0)))
        .alias("rows_below_k"),
        F.sum(F.when(gn == 1, gn).otherwise(F.lit(0)))
        .alias("singleton_rows"),
    ]
    if sensitive_col is not None:
        gl = F.col("__gl")
        out += [
            F.min(gl).alias("l_diversity"),
            F.sum(F.when(gl <= 1, gn).otherwise(F.lit(0)))
            .alias("rows_l1"),
        ]
    summary = g.agg(*out)
    pct = F.when(
        F.col("n_rows") > 0,
        F.round(F.col("rows_below_k") / F.col("n_rows"), 6))
    cols = ["n_rows", "n_groups", "k_anonymity", "groups_below_k",
            "rows_below_k"]
    tail = ["singleton_rows"] + (
        ["l_diversity", "rows_l1"] if sensitive_col is not None else [])
    return summary.select(
        F.lit(int(k)).alias("k"),
        *[F.col(c) for c in cols],
        pct.alias("pct_rows_below_k"),
        *[F.col(c) for c in tail],
    )


def k_risk_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
) -> DataFrame:
    """Per-group drill-down: the equivalence classes of size < ``k``
    (quasi columns + ``group_rows`` + optional ``distinct_sensitive``),
    i.e. the rows a release would have to suppress or generalize."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    quasi_cols = list(quasi_cols)
    aggs = [F.count("*").alias("group_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col))
            .alias("distinct_sensitive"))
    return (df.groupBy(*quasi_cols).agg(*aggs)
            .filter(F.col("group_rows") < k))


def benford_test(
    df: DataFrame,
    col: str,
    digits: int = 1,
) -> DataFrame:
    """First-significant-digit(s) distribution vs Benford's law, the
    standard forensic screen for fabricated, truncated, or unit-mixed
    numeric feeds (Nigrini 2012).

    Returns one row per digit bucket (``1..9`` for ``digits=1``,
    ``10..99`` for ``digits=2``) — including buckets with zero
    observations — with ``n, observed_p, expected_p, chi2_term``, and
    the constant summary columns ``n_total, chi2_stat, mad`` (mean
    absolute deviation of observed vs expected proportions — Nigrini's
    conformity measure: < 0.006 is "close conformity" for digits=1).

    Zeros, nulls and NaN are excluded (no leading digit); sign is
    ignored. The digit extraction is pure arithmetic —
    ``floor(|x| * 10^(digits-1-floor(log10(|x|))))`` — clamped into
    the valid bucket range to absorb the FP edge where ``log10`` of a
    value infinitesimally below a power of ten rounds up. No string
    formatting of the column is involved, so the same expression
    evaluates identically in the DuckDB oracle.
    """
    if digits not in (1, 2):
        raise ValueError(f"digits must be 1 or 2, got {digits}")
    lo, hi = (1, 9) if digits == 1 else (10, 99)
    x = F.abs(F.col(col).cast("double"))
    ok = F.col(col).isNotNull() & ~F.isnan(x) & (x > 0)
    d = F.floor(x * F.pow(F.lit(10.0),
                          F.lit(float(digits - 1)) - F.floor(F.log10(x))))
    d = F.least(F.greatest(d, F.lit(lo)), F.lit(hi))
    counts = (df.filter(ok)
              .select(d.alias("digit"))
              .groupBy("digit").agg(F.count("*").alias("n")))
    spark = df.sparkSession
    spine = spark.range(lo, hi + 1).select(F.col("id").alias("digit"))
    per = (spine.join(counts, "digit", "left")
           .select("digit", F.coalesce(F.col("n"), F.lit(0)).alias("n")))
    # bounded (9- or 90-row) frame: totals via 1-row agg + broadcast
    # cross join — no partition-less window over data
    tot = per.agg(F.sum("n").alias("n_total"))
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    scored = (per.crossJoin(F.broadcast(tot))
              .withColumn("observed_p",
                          F.when(F.col("n_total") > 0,
                                 F.col("n") / F.col("n_total"))
                          .otherwise(F.lit(0.0)))
              .withColumn("expected_p", exp_p)
              .withColumn(
                  "chi2_term",
                  F.when(F.col("n_total") > 0,
                         F.pow(F.col("n") - F.col("expected_p")
                               * F.col("n_total"), F.lit(2.0))
                         / (F.col("expected_p") * F.col("n_total")))
                  .otherwise(F.lit(0.0))))
    stats = scored.agg(
        F.sum("chi2_term").alias("chi2_stat"),
        F.avg(F.abs(F.col("observed_p") - F.col("expected_p")))
        .alias("mad"))
    return (scored.crossJoin(F.broadcast(stats))
            .select("digit", "n",
                    F.round("observed_p", 6).alias("observed_p"),
                    F.round("expected_p", 6).alias("expected_p"),
                    F.round("chi2_term", 6).alias("chi2_term"),
                    "n_total",
                    F.round("chi2_stat", 6).alias("chi2_stat"),
                    F.round("mad", 6).alias("mad"))
            .orderBy("digit"))


def _row_fingerprint(cols: Sequence[str]) -> Column:
    """64-bit content fingerprint over ``cols``, null-gated: every
    column is prefixed and null-sentineled BEFORE hashing, because
    ``xxhash64`` passes the running seed through untouched for NULL
    inputs — without the gate, (NULL, "x") and ("x", NULL) would
    collide (see ops/dedup.py's identical guard)."""
    gated = [
        F.coalesce(F.concat(F.lit("v"), F.col(c).cast("string")),
                   F.lit("n")).alias(c)
        for c in cols
    ]
    return F.xxhash64(*gated)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Per-id churn between two corpus snapshots: one row per id seen
    in either snapshot with ``status`` in ``added | removed | changed |
    unchanged`` (changed = same id, different content fingerprint over
    ``compare_cols``).

    Scale shape: each side is reduced to ``(id, 8-byte fingerprint)``
    BEFORE the full-outer join — the shuffle carries 16 bytes per row
    instead of document bodies. Content equality is fingerprint
    equality (xxhash64, collision odds ~2^-64 per pair); the DuckDB
    oracle compares raw values (`IS DISTINCT FROM`), so a gate
    mismatch would surface a collision. Duplicate ids within one
    snapshot are invalid input for a diff; this function does not
    deduplicate them (run ``ops.dedup.exact_dedup`` first).
    """
    compare_cols = list(compare_cols)
    o = old.select(F.col(id_col), _row_fingerprint(compare_cols)
                   .alias("__h_old"))
    n = new.select(F.col(id_col), _row_fingerprint(compare_cols)
                   .alias("__h_new"))
    j = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") == F.col("__h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """One-row rollup of :func:`snapshot_diff`: counts per status plus
    ``old_rows, new_rows`` and ``churn_rate`` = (added + removed +
    changed) / new_rows (null when the new snapshot is empty)."""
    d = snapshot_diff(old, new, id_col, compare_cols)
    n_ = lambda s: F.sum(  # noqa: E731
        F.when(F.col("status") == s, F.lit(1)).otherwise(F.lit(0)))
    out = d.agg(
        n_("added").alias("added"),
        n_("removed").alias("removed"),
        n_("changed").alias("changed"),
        n_("unchanged").alias("unchanged"),
    )
    return out.select(
        "added", "removed", "changed", "unchanged",
        (F.col("removed") + F.col("changed") + F.col("unchanged"))
        .alias("old_rows"),
        (F.col("added") + F.col("changed") + F.col("unchanged"))
        .alias("new_rows"),
        F.when(
            F.col("added") + F.col("changed") + F.col("unchanged") > 0,
            F.round((F.col("added") + F.col("removed")
                     + F.col("changed"))
                    / (F.col("added") + F.col("changed")
                       + F.col("unchanged")), 6)).alias("churn_rate"),
    )


def functional_dependency_report(
    df: DataFrame,
    determinant_cols: Sequence[str],
    dependent_cols: Sequence[str],
) -> DataFrame:
    """One-row health report for the functional dependency
    ``determinant_cols -> dependent_cols``: does each determinant
    value map to exactly ONE dependent combination? The schema-rule
    analog of :func:`referential_integrity` — it catches denormalized
    tables drifting out of sync (two rows of the same order with
    different order dates), botched joins that fanned out, and
    dimension updates applied to only some rows.

    Columns: ``n_rows, n_groups, violating_groups, violating_rows,
    max_variants, holds, strength`` where ``strength = 1 -
    violating_rows / n_rows`` (null on empty input) and ``holds``
    means zero violations. NULL determinant values form ordinary
    groups (reported like any other key); NULLs inside the dependent
    combination are compared as values via the struct, so (NULL) and
    ('x') count as two variants.

    Plan shape: one hash aggregation to (determinant -> variant count,
    row count) — partial aggregation map-side bounds the exchange by
    distinct determinants per task — then a 1-row rollup. Nothing
    corpus-sized past the first agg, no window, no collect.
    """
    determinant_cols = list(determinant_cols)
    dependent_cols = list(dependent_cols)
    if not determinant_cols or not dependent_cols:
        raise ValueError("determinant and dependent cols required")
    overlap = set(determinant_cols) & set(dependent_cols)
    if overlap:
        raise ValueError(
            f"determinant/dependent overlap: {sorted(overlap)}")
    dep = F.struct(*[F.col(c) for c in dependent_cols])
    g = df.groupBy(*determinant_cols).agg(
        F.count(F.lit(1)).alias("__rows"),
        F.countDistinct(dep).alias("__variants"),
    )
    viol = F.col("__variants") > 1
    out = g.agg(
        F.sum("__rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(viol.cast("long")).alias("violating_groups"),
        F.sum(F.when(viol, F.col("__rows")).otherwise(F.lit(0)))
        .alias("violating_rows"),
        F.max("__variants").alias("max_variants"),
    )
    return out.select(
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
        "n_groups",
        F.coalesce(F.col("violating_groups"), F.lit(0))
        .alias("violating_groups"),
        F.coalesce(F.col("violating_rows"), F.lit(0))
        .alias("violating_rows"),
        "max_variants",
        (F.coalesce(F.col("violating_groups"), F.lit(0)) == 0)
        .alias("holds"),
        F.when(
            F.col("n_rows") > 0,
            1.0 - F.col("violating_rows").cast("double")
            / F.col("n_rows")).alias("strength"),
    )


def fd_violation_examples(
    df: DataFrame,
    determinant_cols: Sequence[str],
    dependent_cols: Sequence[str],
    k: int = 100,
) -> DataFrame:
    """The ``k`` worst violating determinant groups (most dependent
    variants first): ``determinant_cols…, n_rows, n_variants``. The
    drill-down companion to :func:`functional_dependency_report` —
    top-k via orderBy+limit (TakeOrderedAndProject, never a global
    sort)."""
    determinant_cols = list(determinant_cols)
    dependent_cols = list(dependent_cols)
    if not determinant_cols or not dependent_cols:
        raise ValueError("determinant and dependent cols required")
    overlap = set(determinant_cols) & set(dependent_cols)
    if overlap:
        raise ValueError(
            f"determinant/dependent overlap: {sorted(overlap)}")
    dep = F.struct(*[F.col(c) for c in dependent_cols])
    g = df.groupBy(*determinant_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(dep).alias("n_variants"),
    )
    return (g.filter(F.col("n_variants") > 1)
            .orderBy(F.desc("n_variants"), F.desc("n_rows"),
                     *determinant_cols)
            .limit(k))


def anonymize(df: DataFrame, spec: dict) -> DataFrame:
    """Column-level de-identification — the FIX for what
    :func:`k_anonymity_report` measures. ``spec`` maps column ->
    strategy:

    * ``"hash"`` / ``("hash", salt)`` — md5 hex pseudonym (same input
      -> same token, so joins on the column keep working; salt rotates
      the pseudonym space between releases)
    * ``("bucket", width)`` — numeric generalization to
      ``floor(x / width) * width``
    * ``("prefix", n)`` — keep the first n characters (ZIP3-style)
    * ``("fixed", value)`` — replace every non-null with a constant
    * ``"drop"`` — remove the column

    NULLs stay NULL under every strategy, and NaN becomes NULL under
    ``bucket`` (a missing value has no identity to protect, and
    preserving it keeps null-rate profiles comparable).
    Every strategy is a deterministic zero-shuffle codegen projection
    — re-runs and other engines produce identical output. Re-check
    the result with :func:`k_anonymity_report`.
    """
    out = df
    for col, how in spec.items():
        if col not in out.columns:
            raise ValueError(f"column not found: {col!r}")
        if how == "drop":
            out = out.drop(col)
            continue
        c = F.col(col)
        if how == "hash" or (isinstance(how, (tuple, list))
                             and how[0] == "hash"):
            salt = how[1] if isinstance(how, (tuple, list)) \
                and len(how) > 1 else ""
            s = c.cast("string")
            if salt:
                s = F.concat(s, F.lit("|"), F.lit(str(salt)))
            repl = F.when(c.isNotNull(), F.md5(s))
        elif isinstance(how, (tuple, list)) and how[0] == "bucket":
            width = float(how[1])
            if width <= 0:
                raise ValueError(f"bucket width must be > 0: {width}")
            x = c.cast("double")
            # NaN -> null, like NULL: floor(NaN) would cast to 0 and
            # fabricate a legitimate-looking bucket in de-identified
            # output
            repl = F.when(~F.isnan(x),
                          F.floor(x / F.lit(width)) * F.lit(width))
        elif isinstance(how, (tuple, list)) and how[0] == "prefix":
            n = int(how[1])
            if n < 1:
                raise ValueError(f"prefix length must be >= 1: {n}")
            repl = F.when(c.isNotNull(),
                          F.substring(c.cast("string"), 1, n))
        elif isinstance(how, (tuple, list)) and how[0] == "fixed":
            repl = F.when(c.isNotNull(), F.lit(how[1]))
        else:
            raise ValueError(
                f"unknown strategy for {col!r}: {how!r} (use hash, "
                "(hash, salt), (bucket, w), (prefix, n), (fixed, v), "
                "drop)")
        out = out.withColumn(col, repl)
    return out


def candidate_keys(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    max_columns: int = 8,
    distinct: str = "exact",
) -> DataFrame:
    """Candidate-key discovery over single columns and column PAIRS:
    which column (combination)s uniquely identify a row — the schema
    knowledge referential-integrity checks, dedup key choices, and
    join planning all start from, and exactly the thing an inherited
    undocumented table is missing.

    One aggregation computes, for every single column and every
    unordered pair among ``columns`` (default: all non-nested
    columns; more than ``max_columns`` raises — pass an explicit
    list, the pair space is quadratic): distinct combination count
    (null members count as values — struct/ROW semantics in both
    engines), rows with any null member, and the uniqueness ratio.
    ``is_key`` certifies ``n_distinct == n_rows AND n_nulls == 0``
    under ``distinct='exact'`` (Spark's multi-count-distinct expand
    multiplies the scan by the number of combos — fine for
    certification runs; ``'approx'`` uses HLL with NO expand for
    discovery at 100 TB scale and leaves ``is_key`` null).
    ``is_minimal`` marks keys none of whose proper subsets is a key
    (a pure projection over the one aggregated row — no joins, no
    re-evaluation of the aggregation).

    Returns one row per combo: ``(key_columns, n_cols, n_distinct,
    n_nulls, uniqueness_ratio, is_key, is_minimal)``.
    """
    if distinct not in ("approx", "exact"):
        raise ValueError("distinct must be 'approx' or 'exact'")
    if columns is None:
        # match the documented default ("all non-nested columns"): a
        # map-typed (or map-containing) column is not comparable, so
        # count_distinct(struct(...)) over it fails at analysis
        from pyspark.sql import types as _T

        columns = [f.name for f in df.schema.fields
                   if not isinstance(f.dataType,
                                     (_T.MapType, _T.StructType,
                                      _T.ArrayType))]
    cols = list(columns)
    if len(cols) < 1:
        raise ValueError("need at least one column")
    if len(cols) > max_columns:
        raise ValueError(
            f"{len(cols)} columns exceeds max_columns={max_columns} "
            "(the pair space is quadratic) — pass an explicit subset")
    combos = [(c,) for c in cols]
    combos += [(cols[i], cols[j]) for i in range(len(cols))
               for j in range(i + 1, len(cols))]

    def dexp(combo):
        s = F.struct(*[F.col(c) for c in combo])
        return (F.count_distinct(s) if distinct == "exact"
                else F.approx_count_distinct(s))

    aggs = [F.count(F.lit(1)).alias("__n")]
    for idx, combo in enumerate(combos):
        aggs.append(dexp(combo).alias(f"__d{idx}"))
        anynull = None
        for c in combo:
            cond = F.col(c).isNull()
            anynull = cond if anynull is None else (anynull | cond)
        aggs.append(F.sum(anynull.cast("long")).alias(f"__nn{idx}"))
    row = df.agg(*aggs)

    # every combo's counts land in the SAME single aggregated row, so
    # keyness AND minimality (pair key with no single-key member) are
    # pure projections there — no joins, no second evaluation of the
    # aggregation (a branch-and-join formulation would re-run the
    # expensive multi-distinct agg once per branch)
    n = F.col("__n")

    def keyness(idx):
        return ((F.col(f"__d{idx}") == n)
                & (F.col(f"__nn{idx}") == 0))

    single_idx = {combo[0]: idx for idx, combo in enumerate(combos)
                  if len(combo) == 1}
    structs = []
    for idx, combo in enumerate(combos):
        if distinct == "approx":
            is_key = F.lit(None).cast("boolean")
            is_min = F.lit(None).cast("boolean")
        else:
            is_key = keyness(idx)
            if len(combo) == 1:
                is_min = is_key
            else:
                is_min = is_key \
                    & ~keyness(single_idx[combo[0]]) \
                    & ~keyness(single_idx[combo[1]])
        structs.append(F.struct(
            F.lit(",".join(combo)).alias("key_columns"),
            F.lit(len(combo)).alias("n_cols"),
            F.col(f"__d{idx}").alias("n_distinct"),
            F.col(f"__nn{idx}").alias("n_nulls"),
            F.when(n > 0, F.col(f"__d{idx}").cast("double")
                   / n.cast("double")).alias("uniqueness_ratio"),
            is_key.alias("is_key"),
            is_min.alias("is_minimal"),
        ))
    return row.select(
        F.explode(F.array(*structs)).alias("s")).select("s.*")


def chi2_gof(
    df: DataFrame,
    column: str,
    expected: dict,
) -> DataFrame:
    """Chi-square goodness-of-fit of a categorical column against
    EXPECTED shares (the one-sample sibling of the two-sample drift
    chi2 and of :func:`benford_test`, which is this test with Benford
    shares baked in).  One row: ``(n, n_expected_categories, dof,
    statistic, unexpected_n)``.

    ``expected`` maps category → share (normalized to sum to 1).
    Observed categories NOT in ``expected`` are excluded from the
    statistic and counted in ``unexpected_n`` (with a zero expectation
    the statistic is degenerate-infinite; surfacing the count is the
    actionable report).  Expected categories with zero observations
    still contribute ``e`` to the statistic via the identity
    ``chi2 = Σ o²/e − n`` over OBSERVED cells, which never
    materializes empty cells.  ``dof = |expected| − 1``; feed
    ``statistic`` to ``core.drift.chi2_sf`` for the p-value.

    Scale shape: ONE partial-agged groupBy(category) (bounded by
    cardinality), then a 1-row reduce with the expected shares inlined
    as a literal CASE — no join, no second scan.
    """
    if not expected:
        raise ValueError("chi2_gof needs a non-empty expected mapping")
    total = float(sum(expected.values()))
    if total <= 0:
        raise ValueError("expected shares must sum to a positive value")
    shares = {str(k): v / total for k, v in expected.items()}

    c = F.col(column).cast("string")
    counts = (df.filter(c.isNotNull())
              .groupBy(c.alias("__k"))
              .agg(F.count(F.lit(1)).cast("double").alias("__o")))
    share_expr = None
    for k, v in shares.items():
        cond = F.col("__k") == F.lit(k)
        share_expr = (F.when(cond, F.lit(float(v))) if share_expr is None
                      else share_expr.when(cond, F.lit(float(v))))
    share_expr = share_expr.otherwise(F.lit(None))
    cell = counts.select(
        "__o", share_expr.alias("__e_share"))
    rep = cell.agg(
        F.sum(F.when(F.col("__e_share").isNotNull(), F.col("__o")))
        .alias("__n_in"),
        F.sum(F.when(F.col("__e_share").isNotNull(),
                     F.col("__o") * F.col("__o") / F.col("__e_share")))
        .alias("__oo_e"),
        F.coalesce(
            F.sum(F.when(F.col("__e_share").isNull(), F.col("__o"))),
            F.lit(0.0)).alias("unexpected_n"))
    n_in = F.coalesce(F.col("__n_in"), F.lit(0.0))
    stat = F.when(n_in > 0, F.col("__oo_e") / n_in - n_in)
    return rep.select(
        n_in.cast("long").alias("n"),
        F.lit(len(shares)).alias("n_expected_categories"),
        F.lit(len(shares) - 1).alias("dof"),
        stat.alias("statistic"),
        F.col("unexpected_n").cast("long").alias("unexpected_n"))


def relationship_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Classify the join relationship between two tables' key columns,
    one row: ``(left_rows, right_rows, left_keys, right_keys,
    left_max_multiplicity, right_max_multiplicity, left_orphans,
    right_orphans, relationship)`` where ``relationship`` is
    ``one_to_one`` / ``one_to_many`` / ``many_to_one`` /
    ``many_to_many`` by whether either side's max per-key multiplicity
    exceeds 1, and ``*_orphans`` counts ROWS whose key has no match on
    the other side.  The join-planning pre-flight next to
    :func:`referential_integrity` (which validates a DECLARED FK; this
    op discovers what the relationship actually is).

    Scale shape: each side reduces to one row per key (partial-agged);
    orphan counts come from ONE full-outer join of the two bounded
    key-count tables; everything after is a 1-row reduce.  Null keys
    are excluded (they never join).
    """
    lk = F.col(left_key)
    rk = F.col(right_key)
    lc = (left.filter(lk.isNotNull())
          .groupBy(lk.alias("__k"))
          .agg(F.count(F.lit(1)).alias("__ln")))
    rc = (right.filter(rk.isNotNull())
          .groupBy(rk.alias("__k"))
          .agg(F.count(F.lit(1)).alias("__rn")))
    j = lc.join(rc, "__k", "full_outer")
    rep = j.agg(
        F.coalesce(F.sum("__ln"), F.lit(0)).alias("left_rows"),
        F.coalesce(F.sum("__rn"), F.lit(0)).alias("right_rows"),
        F.count("__ln").alias("left_keys"),
        F.count("__rn").alias("right_keys"),
        F.coalesce(F.max("__ln"), F.lit(0))
        .alias("left_max_multiplicity"),
        F.coalesce(F.max("__rn"), F.lit(0))
        .alias("right_max_multiplicity"),
        F.coalesce(F.sum(F.when(F.col("__rn").isNull(),
                                F.col("__ln"))), F.lit(0))
        .alias("left_orphans"),
        F.coalesce(F.sum(F.when(F.col("__ln").isNull(),
                                F.col("__rn"))), F.lit(0))
        .alias("right_orphans"))
    lmany = F.col("left_max_multiplicity") > 1
    rmany = F.col("right_max_multiplicity") > 1
    rel = (F.when(lmany & rmany, "many_to_many")
           .when(lmany, "many_to_one")
           .when(rmany, "one_to_many")
           .otherwise("one_to_one"))
    return rep.withColumn("relationship", rel)
