"""Deterministic sampling / splitting operators for training-data
pipelines.

A 100 TB corpus cannot be train/test split with ``rand()`` — the split
must be a pure function of the row key so it is reproducible across
runs, engines, and re-partitions, and so late-arriving rows land in the
same split. All operators here key on the first 8 hex chars of
``md5(key)`` compared lexicographically against hex thresholds: a pure
map-side, shuffle-free predicate built from JVM built-ins (md5 /
substring / CASE), fully codegen'd and pushdown-friendly, and exactly
reproducible in any engine with an md5 function (the DuckDB oracles in
``__spark_entry__.py`` recompute it verbatim).

The reference engine has no sampling surface (its profiles are
whole-dataset); these operators are part of this engine's
training-pipeline superset, alongside ops/dedup.py and ops/text.py.

Scale notes:
  * ``hash_split`` / ``stratified_sample``: zero-shuffle row filters.
  * ``group_sample``: one shuffle on the group key (window top-k);
    rank-by-hash is the distributed, deterministic analogue of a
    per-group uniform reservoir sample of size k.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # resolution of the 8-hex-char hash prefix


def _hash_prefix(key_cols: Sequence[str], salt: str = "") -> Column:
    """First 8 hex chars of md5 over the '|'-joined key columns.

    Lexicographic comparison of fixed-width lowercase hex is an exact
    uniform order on [0, 16^8), so string thresholds avoid any
    engine-specific integer conversion.
    """
    parts: List[Column] = [F.col(c).cast("string") for c in key_cols]
    if salt:
        parts.append(F.lit(salt))
    return F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8)


def _threshold(fraction: float) -> str:
    t = int(round(min(max(fraction, 0.0), 1.0) * _HEX_SPACE))
    return format(min(t, _HEX_SPACE - 1), "08x") if t < _HEX_SPACE \
        else "g" * 8  # > any hex char: admits every row


def hash_split(
    df: DataFrame,
    key_cols: Sequence[str],
    fractions: Dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/test/valid/...) by key
    hash. ``fractions`` must sum to <= 1; rows hashing past the last
    cumulative threshold get NULL (dropped fraction). Deterministic in
    the key: the same key lands in the same split in every run and in
    any engine. Zero shuffle — a projection over the scan.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    h = _hash_prefix(key_cols, salt)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cond = h < F.lit(_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    key_cols: Sequence[str],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (downsample
    over-represented strata — e.g. cap a dominant language or source in
    a training mix). Strata absent from ``fractions`` keep
    ``default_fraction``. Zero shuffle.
    """
    h = _hash_prefix(key_cols, salt)
    thr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        t = F.lit(_threshold(frac))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(_threshold(default_fraction)) if thr is None \
        else thr.otherwise(F.lit(_threshold(default_fraction)))
    return df.filter(h < thr)


def group_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    key_cols: Sequence[str],
    salt: str = "",
    rank_col: Optional[str] = None,
    presalt: Optional[int] = None,
) -> DataFrame:
    """Uniform-without-replacement sample of up to ``k`` rows per group:
    rank rows inside each group by key hash (a random-but-deterministic
    order) and keep the first k. One shuffle on the group key.

    Skew: the per-group window sorts a whole group in one task. For
    corpora with hot groups, set ``presalt=S`` to run the classic
    two-stage distributed top-k: stage 1 ranks within (group,
    hash-bucket-of-S) and keeps k per bucket — bounding any task at a
    1/S slice of the hot group — stage 2 re-ranks the <= k*S survivors
    per group. Both stages use the same total order (key hash, then
    key), so the result is EXACTLY the single-stage sample: the global
    k smallest keys of a group are each among the k smallest of their
    bucket, so stage 1 never drops a winner.

    Default policy: single-stage stays the default for the same
    measured reason as ``sessionize``/``asof_join`` (see bench
    ``*_hot10x_*`` rows — sub-10^6-row hot groups sort cheaply in one
    task and the extra stage costs more than it saves); set ``presalt``
    when a single group's rows reach ~10^7+ or a task's memory.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = _hash_prefix(key_cols, salt)
    order = [h.asc(), *[F.col(c).asc() for c in key_cols]]
    if presalt is not None:
        if presalt < 1:
            raise ValueError(f"presalt must be >= 1: {presalt}")
        b = F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols],
                       F.lit(f"gs-presalt-{salt}")),
            F.lit(presalt))
        w1 = Window.partitionBy(
            *[F.col(c) for c in group_cols], F.col("__gsb")
        ).orderBy(*order)
        df = (
            df.withColumn("__gsb", b)
            .withColumn("__rk1", F.row_number().over(w1))
            .filter(F.col("__rk1") <= k)
            .drop("__rk1", "__gsb")
        )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        *order)
    ranked = df.withColumn("__rk", F.row_number().over(w))
    out = ranked.filter(F.col("__rk") <= k)
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")


def pack_chunks(
    df: DataFrame,
    size_col: str,
    budget: int,
    shard_cols: Optional[Sequence[str]] = None,
    order_cols: Optional[Sequence[str]] = None,
    chunk_col: str = "chunk_id",
    offset_col: str = "chunk_offset",
    distributed: bool = False,
) -> DataFrame:
    """Sequential-fill packing: assign rows (documents) to fixed-budget
    chunks — the "concatenate then cut at document boundaries" step
    that turns a cleaned corpus into ~equal token-count training
    shards. A row belongs to the chunk where its first token lands:
    ``chunk_id = floor((cumsum(size) - size) / budget)``, with
    ``chunk_offset`` the row's start position inside the stream.

    Deterministic given ``order_cols``; one shuffle on ``shard_cols``
    (rows pack independently inside each shard — use a hash_split-style
    shard key to bound shard size). Without shard_cols the window is
    global (one reducer).

    ``distributed=True`` runs the classic two-phase distributed prefix
    sum instead, so a giant (or absent) shard no longer serializes:
    range-repartition on (shard, order) — contiguous, ordered slices —
    local cumsum per slice, then a per-(shard, slice) totals rollup
    (one row each) carries each slice's starting offset. Exactly the
    single-phase offsets. Requires ``order_cols`` to be unique within
    a shard (a range boundary between equal keys would split ties
    nondeterministically); the default doc-id ordering satisfies this.

    Default policy: the windowed single-phase plan stays the default
    for the same measured reason as ``sessionize``/``asof_join`` (bench
    ``*_hot10x_*`` rows: the two-phase rollup costs an extra exchange
    that only pays off once a shard's rows exceed a single task's
    sort budget, ~10^7+ rows); flip ``distributed=True`` above that,
    or whenever packing WITHOUT shard_cols at scale (the global window
    is otherwise one reducer).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    order_cols = list(order_cols or [size_col])
    shard_cols = list(shard_cols or [])
    part = [F.col(c) for c in shard_cols]
    order = [F.col(c).asc() for c in order_cols]

    if not distributed:
        w = Window.partitionBy(*part).orderBy(*order) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cum = F.sum(F.col(size_col)).over(w)
        start = (cum - F.col(size_col)).cast("long")
        return (
            df.withColumn(offset_col, start)
            .withColumn(chunk_col,
                        F.floor(start / F.lit(budget)).cast("long"))
        )

    # two-phase distributed scan: RangePartitioner assigns ascending
    # (shard, order) key ranges to ascending partition ids, so a slice
    # id is a valid secondary sort key. Same double-consumption shape
    # as core/prefix.running_sums -> same exchange-reuse requirement.
    from ..core.prefix import require_exchange_reuse

    require_exchange_reuse(df)
    rp = df.repartitionByRange(
        *[F.col(c) for c in shard_cols + order_cols]
    ).withColumn("__slice", F.spark_partition_id())
    w1 = Window.partitionBy(*part, F.col("__slice")).orderBy(*order) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = rp.withColumn(
        "__lcum", F.sum(F.col(size_col)).over(w1))
    totals = local.groupBy(*shard_cols, "__slice").agg(
        F.sum(F.col(size_col)).alias("__stot"))
    w2 = Window.partitionBy(*part).orderBy(F.col("__slice").asc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        *shard_cols, "__slice",
        F.coalesce(F.sum(F.col("__stot")).over(w2), F.lit(0))
        .alias("__soff"))
    start = (F.col("__lcum") - F.col(size_col) + F.col("__soff")) \
        .cast("long")
    return (
        local.join(offsets, on=shard_cols + ["__slice"], how="left")
        .withColumn(offset_col, start)
        .withColumn(chunk_col,
                    F.floor(start / F.lit(budget)).cast("long"))
        .drop("__slice", "__lcum", "__soff")
    )


def mix_sources(
    df: DataFrame,
    weights: Dict[str, float],
    token_budget: int,
    source_col: str = "source",
    key_cols: Sequence[str] = ("doc_id",),
    token_col: Optional[str] = None,
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample each source to hit a target corpus
    MIXTURE: source ``s`` should contribute ``weights[s] * token_budget``
    tokens, so its keep-fraction is ``min(1, target_s / available_s)``
    (a source with fewer tokens than its target keeps everything —
    upsampling/repetition is a separate policy decision). Sources absent
    from ``weights`` are dropped. This is the data-mixing step of a
    pretraining pipeline (Pile/DoReMi-style static mixture) as one
    declarative plan.

    Token counts come from ``token_col`` if given, else whitespace
    tokens of ``text_col``. Selection reuses the md5 hash-prefix
    primitive, but with a DATA-DEPENDENT threshold: per-source
    fractions are computed in-plan (one partial-agg groupBy over
    #sources rows), broadcast-joined back, and rendered to the 8-hex
    threshold with ``floor(frac * 16^8)`` + lpad — floor, not cast,
    because engines disagree on double->int rounding; fractions >= 1
    use a sentinel above every hex digit. Fully reproducible in any
    engine with md5 (the DuckDB oracle recomputes it verbatim).

    Scale shape: one #sources-row aggregate + broadcast join + a
    codegen filter over the scan — the corpus itself never shuffles.
    Expected tokens per kept source = target +- binomial noise
    (keying on documents, not tokens, so documents stay intact).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    toks = (
        F.col(token_col) if token_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    ).cast("double")
    wmap = F.create_map(*[
        x for k, v in weights.items()
        for x in (F.lit(k), F.lit(float(v)))
    ])
    have = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.sum(toks).alias("__have"))
    frac = (
        have.withColumn("__w", wmap[F.col("__src")])
        .filter(F.col("__w").isNotNull())
        .withColumn(
            "__frac",
            # a zero/NULL-token source trivially satisfies any positive
            # target: keep everything (and never divide by zero, which
            # ANSI mode turns into a job abort)
            F.when(
                F.col("__have") > 0,
                F.least(F.lit(1.0),
                        F.col("__w") * F.lit(float(token_budget))
                        / F.col("__have")))
            .otherwise(F.lit(1.0)))
        .withColumn(
            "__thr",
            F.when(F.col("__frac") >= 1.0, F.lit("g" * 8))
            .otherwise(F.lpad(F.lower(F.hex(
                F.floor(F.col("__frac") * F.lit(float(_HEX_SPACE)))
                .cast("long"))), 8, "0")))
        .select("__src", "__thr")
    )
    h = _hash_prefix(key_cols, salt)
    return (
        df.join(F.broadcast(frac),
                df[source_col] == frac["__src"], "inner")
        .filter(h < F.col("__thr"))
        .drop("__src", "__thr")
    )


def assemble_chunks(
    packed: DataFrame,
    text_col: str = "text",
    chunk_col: str = "chunk_id",
    shard_cols: Optional[Sequence[str]] = None,
    order_cols: Optional[Sequence[str]] = None,
    separator: str = "\n\n",
    out_col: str = "chunk_text",
) -> DataFrame:
    """Materialize the training-shard text that ``pack_chunks``
    assigned: one row per (shard, chunk) with documents concatenated
    in pack order, ``separator``-joined, plus ``n_docs`` and
    ``chunk_chars``.

    Deterministic given ``order_cols`` (same contract as
    ``pack_chunks`` — pass the same columns). One groupBy on
    (shard, chunk): the aggregation collects (order-key, text) structs
    and sorts WITHIN each chunk, so ordering cost is bounded by a
    chunk's document count (budget-bounded by construction), never a
    window over the shard. When the packing shuffle's partitioning is
    still live the groupBy reuses it.
    """
    shard_cols = list(shard_cols or [])
    order_cols = list(order_cols or [])
    if not order_cols:
        raise ValueError(
            "order_cols is required: concatenation order must be "
            "deterministic (use the same columns pack_chunks ordered "
            "by)")
    pairs = F.struct(*[F.col(c) for c in order_cols],
                     F.col(text_col).alias("__t"))
    grouped = packed.groupBy(*shard_cols, chunk_col).agg(
        F.array_sort(F.collect_list(pairs)).alias("__docs"))
    texts = F.transform(F.col("__docs"), lambda s: s["__t"])
    joined = grouped.select(
        *shard_cols, chunk_col,
        F.array_join(texts, separator).alias(out_col),
        F.size("__docs").alias("n_docs"))
    return joined.withColumn("chunk_chars", F.length(F.col(out_col)))


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    budget: float,
    weight_col: Optional[str] = None,
    quality_col: Optional[str] = None,
    id_cols: Sequence[str] = ("doc_id",),
    text_col: str = "text",
    distributed: bool = False,
) -> DataFrame:
    """Per-group weight quota: within each ``group_cols`` group, keep
    rows in priority order (``quality_col`` DESC when given, then
    ``id_cols`` ASC as the deterministic tie-break; ``id_cols`` alone
    otherwise) until the group's kept weight reaches ``budget``.

    This is the domain-budget step of a curation pipeline ("at most N
    tokens per registered domain, best documents first" — the C4 /
    RefinedWeb host-level cap): it bounds any single domain's share of
    the corpus no matter how over-represented it is in the crawl.

    The keep rule is on the EXCLUSIVE running weight (``cum_before <
    budget``): a group's highest-priority row is always kept, even when
    it alone exceeds the budget — a quota that could emit an empty
    group silently is a footgun. Weight is ``weight_col`` when given,
    else the whitespace token count of ``text_col``; null weights
    count 0.

    Scale: the default plan is ONE hash-partitioned window keyed by the
    group — per-group work parallelizes across groups, so it is the
    right shape for many modest groups (millions of domains). When a
    handful of groups hold a large share of all rows (source-level
    budgets, viral hosts), ``distributed=True`` switches to the repo's
    two-phase range-partitioned prefix sum (``core.prefix``) keyed by
    (group, slice): no task ever sorts more than its slice of a giant
    group. Its rollup frame is ``#groups x #shuffle-partitions`` rows
    and is broadcast — use it for FEW giant groups, not millions of
    small ones.
    """
    from whylogs_spark.core.prefix import (require_exchange_reuse,
                                           slice_rollup)

    group_cols = list(group_cols)
    id_cols = list(id_cols)
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if not id_cols:
        raise ValueError(
            "id_cols must be non-empty: the priority order needs a "
            "unique tie-break to be deterministic")
    if weight_col is not None:
        w = F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
    else:
        w = F.coalesce(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
            .cast("double"), F.lit(0.0))
        # split('') yields [''] -> size 1; empty text must weigh 0
        w = F.when(F.coalesce(F.trim(F.col(text_col)), F.lit("")) == "",
                   F.lit(0.0)).otherwise(w)
    order = ([F.col(quality_col).desc_nulls_last()]
             if quality_col is not None else []) \
        + [F.col(c).asc() for c in id_cols]

    if not distributed:
        win = (Window.partitionBy(*[F.col(c) for c in group_cols])
               .orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, -1))
        cum_before = F.coalesce(F.sum(w).over(win), F.lit(0.0))
        return (df.withColumn("__cb", cum_before)
                .filter(F.col("__cb") < float(budget))
                .drop("__cb"))

    require_exchange_reuse(df)
    range_keys = [F.col(c) for c in group_cols] + order
    rp = (df.withColumn("__w", w)
          .repartitionByRange(*range_keys)
          .withColumn("__slice", F.spark_partition_id()))
    wloc = (Window.partitionBy(*[F.col(c) for c in group_cols],
                               F.col("__slice"))
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1))
    local = rp.withColumn(
        "__lcb", F.coalesce(F.sum(F.col("__w")).over(wloc), F.lit(0.0)))
    totals = rp.groupBy(*group_cols, "__slice").agg(
        F.sum("__w").alias("__w"))
    roll = slice_rollup(totals, ["__w"], partition_cols=group_cols)
    joined = local.join(F.broadcast(roll), group_cols + ["__slice"])
    return (joined
            .filter(F.col("__lcb") + F.col("__o___w") < float(budget))
            .select(*[F.col(c) for c in df.columns]))


def balance_classes(
    df: DataFrame,
    class_cols: Sequence[str],
    key_cols: Sequence[str] = ("doc_id",),
    salt: str = "",
    target: Optional[int] = None,
) -> DataFrame:
    """Deterministically downsample every class to the size of the
    smallest one (or to an explicit ``target``) — the class-rebalance
    step before training a classifier on skewed labels. Within each
    class the kept rows are the ``target`` smallest key hashes (the
    module's md5-prefix order), so the subsample is uniform, stable
    across runs/engines/partitionings, and a superset-consistent
    shrink of any larger ``target``.

    Plan shape: the min class size is a broadcast 1-row branch off the
    class-count aggregate (no driver round-trip), and selection is one
    rank window keyed by the class — identical skew profile to
    ``group_sample`` (see its ``presalt`` notes for classes beyond
    ~10^7 rows). Classes smaller than ``target`` keep everything.
    """
    class_cols = list(class_cols)
    key_cols = list(key_cols)
    if not class_cols:
        raise ValueError("class_cols must be non-empty")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if target is not None and target < 1:
        raise ValueError(f"target must be >= 1, got {target}")
    if target is None:
        tgt = (df.groupBy(*class_cols).agg(F.count("*").alias("__n"))
               .agg(F.min("__n").alias("__target")))
    else:
        spark = df.sparkSession
        tgt = spark.range(1).select(
            F.lit(int(target)).cast("long").alias("__target"))
    h = _hash_prefix(key_cols, salt)
    w = (Window.partitionBy(*[F.col(c) for c in class_cols])
         .orderBy(h.asc(), *[F.col(c).asc() for c in key_cols]))
    ranked = df.withColumn("__rk", F.row_number().over(w))
    return (ranked.crossJoin(F.broadcast(tgt))
            .filter(F.col("__rk") <= F.col("__target"))
            .select(*[F.col(c) for c in df.columns]))


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: ``k`` rows where each
    row's inclusion probability is proportional to its weight (the
    Efraimidis–Spirakis A-ES scheme: draw u ~ U(0,1] per row, keep the
    top-k by ``u^(1/w)`` — computed as ``ln(u)/w`` for stability).
    The curation workhorse: sample training documents proportional to
    a quality score instead of uniformly.

    Deterministic: u derives from the md5 hash prefix of ``key_cols``
    (+ ``salt``), so the same corpus yields the same sample in every
    run and any engine (the DuckDB oracle recomputes it verbatim);
    change ``salt`` to redraw. Rows with null/NaN/non-positive weight
    are excluded (a zero-weight row can never win), as are rows with
    any NULL key component (no identity -> no reproducible draw).

    Scale shape: the sample key is a pure codegen projection; top-k is
    ``orderBy().limit(k)`` — TakeOrderedAndProject, a per-partition
    heap + driver merge of k rows, never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty: without a row identity every "
            "row hashes identically and the draw degenerates to "
            "lowest-weight top-k")
    w = F.col(weight_col).cast("double")
    # u in (0, 1]: +1 lifts the integer hash off zero so ln(u) is finite
    u = ((F.conv(_hash_prefix(key_cols, salt), 16, 10)
          .cast("double") + F.lit(1.0)) / F.lit(float(_HEX_SPACE)))
    key = F.log(u) / w
    ok = w.isNotNull() & ~F.isnan(w) & (w > 0)
    # a null key component collapses distinct rows onto one hash
    # (concat_ws skips nulls) — exclude them like null weights
    for c in key_cols:
        ok = ok & F.col(c).isNotNull()
    return (
        df.filter(ok)
        .withColumn("__es_key", key)
        .orderBy(F.desc("__es_key"),
                 *[F.col(c) for c in key_cols])
        .limit(k)
        .drop("__es_key")
    )


def kfold_assign(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int,
    salt: str = "",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: every row
    gets a fold in ``[0, k)`` from the md5 of its key — the same key
    lands in the same fold in every run and any engine, and keying on
    a GROUP column (user id, document source) gives grouped k-fold
    for free (all of a group's rows share a fold, so folds never
    leak a group across the train/test boundary).

    Zero shuffle — a projection over the scan, same machinery as
    :func:`hash_split` (fold i covers the hex-prefix interval
    [i/k, (i+1)/k), so fold sizes are uniform in expectation)."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    h = _hash_prefix(key_cols, salt)
    expr = None
    for i in range(k):
        cond = h < F.lit(_threshold((i + 1) / k))
        branch = F.lit(i)
        expr = F.when(cond, branch) if expr is None \
            else expr.when(cond, branch)
    return df.withColumn(fold_col, expr.otherwise(F.lit(k - 1)))


def rolling_origin_splits(
    df: DataFrame,
    time_col: str,
    n_splits: int,
    horizon_sec: float,
) -> DataFrame:
    """Rolling-origin (expanding-window) backtest splits for
    time-series models: split ``i`` (1..n) trains on everything
    strictly before its test window and tests on the next
    ``horizon_sec`` seconds, with split n's window ending at the
    data's max timestamp:

        test_i = [t_max − (n−i+1)·h, t_max − (n−i)·h)

    (split n's window is closed on the right so the max row itself
    is testable).  Returns the input columns plus ``split_id`` and
    ``role`` ('train' | 'test'); a row appears once per split where
    it participates, so output size is ≤ n_splits × rows — budget
    accordingly (the point of backtesting is refitting n models
    anyway).

    Scale shape: the max timestamp is a 1-row broadcast aggregate;
    the split spec is an in-plan exploded sequence (n rows) joined
    by broadcast with a codegen role predicate — no shuffle of the
    data at all."""
    from whylogs_spark.ops.features import _epoch_seconds

    if n_splits < 1:
        raise ValueError(f"n_splits must be >= 1: {n_splits}")
    if horizon_sec <= 0:
        raise ValueError(f"horizon_sec must be > 0: {horizon_sec}")
    t = _epoch_seconds(df, time_col)
    base = df.filter(t.isNotNull()).withColumn("__ep", t)
    tmax = base.agg(F.max("__ep").alias("__tmax"))
    spec = (tmax.select(
        "__tmax",
        F.explode(F.sequence(F.lit(1), F.lit(int(n_splits))))
        .alias("split_id"))
        .select(
            "split_id",
            (F.col("__tmax")
             - F.lit(float(horizon_sec))
             * (F.lit(int(n_splits)) - F.col("split_id") + 1))
            .alias("__t0"),
            (F.col("__tmax")
             - F.lit(float(horizon_sec))
             * (F.lit(int(n_splits)) - F.col("split_id")))
            .alias("__t1")))
    j = base.join(F.broadcast(spec), F.lit(True))
    is_last = F.col("split_id") == F.lit(int(n_splits))
    in_test = (F.col("__ep") >= F.col("__t0")) & (
        F.when(is_last, F.col("__ep") <= F.col("__t1"))
        .otherwise(F.col("__ep") < F.col("__t1")))
    role = F.when(F.col("__ep") < F.col("__t0"), F.lit("train")) \
        .when(in_test, F.lit("test"))
    return (j.withColumn("role", role)
            .filter(F.col("role").isNotNull())
            .select(*df.columns, "split_id", "role"))


def negative_sampling(
    df: DataFrame,
    user_col: str,
    item_col: str,
    n_neg: int = 4,
    max_catalog: int = 100_000,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training
    (recommendation / retrieval two-tower models): for every observed
    positive (user, item) pair, draw ``n_neg`` candidate items the
    user did NOT interact with, sampled uniformly from the
    ``max_catalog`` most-popular items.

    Returns ``(user, item, neg_item, neg_rank)``.  Draws are md5 of
    (user, item, draw index, salt) — reproducible across runs and
    engines.  Accidental positives are REMOVED, not resampled, so a
    pair can yield fewer than ``n_neg`` rows (the standard cheap
    convention; resampling would need an unbounded loop).

    Scale shape: the catalog is capped at ``max_catalog`` items by
    (count desc, item) — a TakeOrderedAndProject, collected once
    (bounded by the cap) and re-broadcast with a dense index for the
    modulo draw; the anti-join against positives shuffles only the
    drawn candidates.  Interactions are deduplicated to distinct
    pairs first (partial-agg)."""
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1: {n_neg}")
    if max_catalog < 2:
        raise ValueError(f"max_catalog must be >= 2: {max_catalog}")
    spark = df.sparkSession
    u = F.col(user_col).cast("string")
    it = F.col(item_col).cast("string")
    pos = df.filter(u.isNotNull() & it.isNotNull()) \
        .select(u.alias("user"), it.alias("item")).distinct()
    top = (pos.groupBy("item").agg(F.count(F.lit(1)).alias("__n"))
           .orderBy(F.desc("__n"), F.col("item"))
           .limit(int(max_catalog))
           .select("item").collect())
    items = [r["item"] for r in top]
    m = len(items)
    if m < 2:
        raise ValueError("catalog has fewer than 2 distinct items")
    catalog = spark.createDataFrame(
        list(enumerate(items)), "__idx bigint, neg_item string")
    drawn = (pos
             .select("user", "item",
                     F.explode(F.sequence(
                         F.lit(1), F.lit(int(n_neg)))).alias("neg_rank"))
             .withColumn(
                 "__idx",
                 F.conv(F.substring(F.md5(F.concat_ws(
                     "|", F.col("user"), F.col("item"),
                     F.col("neg_rank").cast("string"),
                     F.lit(salt))), 1, 15), 16, 10)
                 .cast("bigint") % F.lit(m)))
    cand = drawn.join(F.broadcast(catalog), "__idx").drop("__idx")
    # drop draws that are real positives for that user
    return cand.join(
        pos.select(F.col("user").alias("__pu"),
                   F.col("item").alias("__pi")),
        (F.col("user") == F.col("__pu"))
        & (F.col("neg_item") == F.col("__pi")),
        "left_anti")


def ipf_weights(
    df: DataFrame,
    row_col: str,
    col_col: str,
    row_targets: dict,
    col_targets: dict,
    iterations: int = 5,
    max_cells: int = 100_000,
) -> DataFrame:
    """Iterative proportional fitting (raking, Deming & Stephan 1940):
    per-cell weights that reweight the (row_col × col_col) mix toward
    BOTH target marginals at once — the standard survey-weighting /
    corpus-rebalancing move when independent per-axis weights would
    fight each other.  Targets are SHARES (they are normalized to sum
    to 1; categories absent from a target get share 0 and weight 0).

    One row per observed cell: ``(row_col, col_col, n, weight,
    weighted_share)`` where ``weight`` multiplies each ROW of that
    cell and Σ n·w = 1 after the final row-axis step; run more
    ``iterations`` for tighter column-axis agreement (IPF converges
    geometrically for strictly positive tables).

    Scale shape: ONE partial-agged groupBy builds the contingency
    cells; the IPF loop itself runs driver-side on the COLLECTED cell
    table (bounded by ``max_cells`` — a guard raises past it, the
    isotonic/k-means bounded-collect precedent) and the result ships
    back as a small DataFrame to broadcast-join onto the corpus.
    The data is scanned once; nothing data-sized leaves executors.
    """
    cells = (df.filter(F.col(row_col).isNotNull()
                       & F.col(col_col).isNotNull())
             .groupBy(row_col, col_col)
             .agg(F.count(F.lit(1)).alias("n")))
    rows = cells.limit(max_cells + 1).collect()
    if len(rows) > max_cells:
        raise ValueError(
            f"ipf_weights: > {max_cells} contingency cells; raise "
            "max_cells or coarsen the categories")

    rt_total = float(sum(row_targets.values())) or 1.0
    ct_total = float(sum(col_targets.values())) or 1.0
    rt = {k: v / rt_total for k, v in row_targets.items()}
    ct = {k: v / ct_total for k, v in col_targets.items()}

    total = float(sum(r["n"] for r in rows)) or 1.0
    state = {(r[row_col], r[col_col]): r["n"] / total for r in rows}
    for _ in range(int(iterations)):
        for axis, targets in ((0, rt), (1, ct)):
            sums: dict = {}
            for key, w in state.items():
                sums[key[axis]] = sums.get(key[axis], 0.0) + w
            state = {
                key: (w * targets.get(key[axis], 0.0)
                      / sums[key[axis]] if sums[key[axis]] > 0
                      else 0.0)
                for key, w in state.items()
            }
    spark = df.sparkSession
    out_rows = [
        (k[0], k[1], int(dict_n), float(state[k] / dict_n))
        for k, dict_n in (((r[row_col], r[col_col]), r["n"])
                          for r in rows)
    ]
    schema = df.select(row_col, col_col).schema
    result = spark.createDataFrame(
        [(a, b, n, w) for a, b, n, w in out_rows],
        schema=(f"{schema[0].name} {schema[0].dataType.simpleString()}, "
                f"{schema[1].name} {schema[1].dataType.simpleString()}, "
                "n long, weight double"))
    return result.select(
        row_col, col_col, "n", "weight",
        (F.col("weight") * F.col("n")).alias("weighted_share"))
