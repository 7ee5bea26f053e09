"""Link-graph analytics over an edge table: degree statistics and
PageRank — the corpus-curation signals (site authority, crawl-frontier
prioritization, spam-farm detection) a web-scale training pipeline
derives from its link structure.  Complements ``dedup.
connected_components`` (single-link closure) with importance scoring.

Scale shape: PageRank is the canonical iterative join workload — each
iteration is ONE equi-join of the rank vector against the edge list
(shuffle keyed by node id; skew bound = one node's out-edges) plus a
groupBy-sum, with dangling mass folded in from a 1-row broadcast
aggregate.  Iterations localCheckpoint the (node-sized) rank vector so
lineage stays O(1) — the edge table itself is scanned once per
iteration and never re-derived.  Degree stats are single partial-agged
aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degree_stats", "pagerank", "stationary_distribution",
           "label_propagation"]


def degree_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node out/in degree over a distinct-edge view: ``(node,
    out_degree, in_degree)`` with 0 for a side the node never appears
    on.  Null endpoints are dropped; duplicate (src, dst) rows count
    once (graph semantics, not multigraph).

    Two partial-agged aggregations + one outer join on node id."""
    e = edges.filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).select(F.col(src).alias("__s"), F.col(dst).alias("__d")) \
        .distinct()
    outd = e.groupBy(F.col("__s").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    ind = e.groupBy(F.col("__d").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (
        outd.join(ind, "node", "outer")
        .select("node",
                F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """Power-iteration PageRank with uniform dangling-mass
    redistribution: ``(node, rank)``, ranks summing to 1.

    The fixed-iteration form (not convergence-tested) so the result
    is a deterministic function of the edge set — replayable in any
    engine by unrolling the same ``iterations`` steps:

        r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/out(u) + dangling/N)

    where ``dangling = Σ r(u)`` over nodes with no out-edges.
    Duplicate edges count once; null endpoints drop.

    Per iteration: one broadcast of the 1-row dangling aggregate, one
    rank⋈edges equi-join keyed by src (the only data-sized shuffle),
    one groupBy-sum.  The rank vector is node-sized and
    localCheckpointed each step, so plan depth and lineage stay O(1)
    regardless of ``iterations``.
    """
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1]: {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    # materialize the distinct-edge view ONCE: every iteration joins
    # against it, and without the checkpoint the raw-edge scan +
    # dedup shuffle would re-run per iteration
    e = edges.filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).select(F.col(src).alias("__s"), F.col(dst).alias("__d")) \
        .distinct().localCheckpoint()
    nodes = (e.select(F.col("__s").alias("node"))
             .union(e.select(F.col("__d").alias("node")))
             .distinct().localCheckpoint())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outd = e.groupBy(F.col("__s").alias("node")).agg(
        F.count(F.lit(1)).alias("__out"))
    # (node, out_degree, rank); out_degree null marks a dangling node
    state = nodes.join(outd, "node", "left").select(
        "node", "__out",
        F.lit(1.0 / n_nodes).alias("rank")).localCheckpoint()

    d = float(damping)
    for _ in range(int(iterations)):
        state = _pagerank_step(state, e, n_nodes, d).localCheckpoint()
    return state.select("node", "rank")


def _pagerank_step(state: DataFrame, e: DataFrame, n_nodes: int,
                   d: float) -> DataFrame:
    """One power-iteration update (un-checkpointed — the audit reads
    this plan directly, since the checkpoint in :func:`pagerank`
    erases the iteration's physical plan from the returned frame)."""
    base = (1.0 - d) / n_nodes
    dang = state.agg(
        F.coalesce(F.sum(F.when(F.col("__out").isNull(),
                                F.col("rank"))),
                   F.lit(0.0)).alias("__dang"))
    contrib = (
        state.filter(F.col("__out").isNotNull())
        .join(e, state["node"] == e["__s"])
        .select(F.col("__d").alias("node"),
                (F.col("rank") / F.col("__out")).alias("__c"))
        .groupBy("node").agg(F.sum("__c").alias("__in"))
    )
    return (
        state.select("node", "__out").join(contrib, "node", "left")
        .crossJoin(F.broadcast(dang))
        .select(
            "node", "__out",
            (F.lit(base)
             + F.lit(d) * (F.coalesce(F.col("__in"), F.lit(0.0))
                           + F.col("__dang") / F.lit(float(n_nodes))))
            .alias("rank"))
    )


def stationary_distribution(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "probability",
    iterations: int = 30,
    damping: float = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Stationary distribution of a weighted Markov chain by fixed
    power iteration: ``(state, probability)``, probabilities summing
    to 1 — where does a behavioral process spend its time in the long
    run (feed it ``ops.events.transition_matrix`` output).

    π' = π P with per-source weight re-normalization (so count
    matrices work as well as probability matrices) and the mass of
    DANGLING states (appearing only as destinations) redistributed
    uniformly, exactly :func:`pagerank`'s convention at damping 1.
    With ``damping`` set, the damped recurrence
    pr' = (1−d)/N + d·(πP + dangling/N) — the WEIGHTED PageRank that
    TextRank runs over word co-occurrence graphs.
    Fixed iterations keep the result a deterministic function of the
    edge set (a periodic chain oscillates rather than converges —
    callers picking ``iterations`` choose their averaging; the
    default 30 settles every aperiodic chain of practical size).

    Same scale shape as :func:`pagerank`: the (re-normalized) edge
    frame is checkpointed once, each iteration is one equi-join +
    groupBy-sum with the dangling mass folded in from a 1-row
    broadcast, and the state vector checkpoints every
    ``checkpoint_every`` steps (lineage depth bounded at that many
    joins).  Steps between checkpoints are lazily ``persist()``-ed —
    each step references its predecessor three times (dangling agg,
    contribution join, carry-through), so an unpersisted lazy chain
    would recompute 3^k subtrees.  Wall time at small scale is
    job-count-bound (one materialization job per checkpoint), so a
    larger ``checkpoint_every`` trades scheduler round-trips against
    plan depth; numerically identical either way.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    if damping is not None and not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1]: {damping}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1: {checkpoint_every}")
    w = F.col(weight).cast("double")
    raw = edges.filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
        & w.isNotNull() & (w > 0)
    ).select(F.col(src).alias("__s"), F.col(dst).alias("__d"),
             w.alias("__w"))
    tot = raw.groupBy("__s").agg(F.sum("__w").alias("__tw"))
    e = (raw.join(tot, "__s")
         .select("__s", "__d", (F.col("__w") / F.col("__tw"))
                 .alias("__p"))
         .localCheckpoint())
    nodes = (e.select(F.col("__s").alias("state"))
             .union(e.select(F.col("__d").alias("state")))
             .distinct().localCheckpoint())
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("state", F.lit(0.0).alias("probability"))
    has_out = e.select(F.col("__s").alias("state")).distinct() \
        .withColumn("__o", F.lit(True))
    state = nodes.join(has_out, "state", "left").select(
        "state", "__o",
        F.lit(1.0 / n_nodes).alias("probability")).localCheckpoint()
    d = None if damping is None else float(damping)
    it = int(iterations)
    ck = int(checkpoint_every)
    pending = []
    for i in range(it):
        dang = state.agg(
            F.coalesce(F.sum(F.when(F.col("__o").isNull(),
                                    F.col("probability"))),
                       F.lit(0.0)).alias("__dang"))
        contrib = (
            state.join(e, state["state"] == e["__s"])
            .select(F.col("__d").alias("state"),
                    (F.col("probability") * F.col("__p"))
                    .alias("__c"))
            .groupBy("state").agg(F.sum("__c").alias("__in"))
        )
        flow = (F.coalesce(F.col("__in"), F.lit(0.0))
                + F.col("__dang") / F.lit(float(n_nodes)))
        if d is not None:
            # damped (TextRank/PageRank-style) variant of the same
            # recurrence: pr' = (1-d)/N + d * flow
            flow = (F.lit((1.0 - d) / n_nodes) + F.lit(d) * flow)
        nxt = (
            state.select("state", "__o").join(contrib, "state", "left")
            .crossJoin(F.broadcast(dang))
            .select("state", "__o", flow.alias("probability"))
        )
        if (i + 1) % ck == 0 or i + 1 == it:
            state = nxt.localCheckpoint()
            # the checkpoint cut the lineage, so the lazily persisted
            # intermediates it consumed can be released
            for p in pending:
                p.unpersist()
            pending = []
        else:
            # lazy persist: the next step references this frame three
            # times; without it the chain recomputes 3^k subtrees
            state = nxt.persist()
            pending.append(state)
    return state.select("state", "probability")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), deterministic variant: ``(node, community)``.

    Every node starts with its own id as label; each iteration every
    node adopts the most frequent label among its neighbors, ties
    broken by the SMALLEST label — a total order, so the fixed
    ``iterations`` output is a pure function of the edge set
    (replayable in any engine; synchronous LPA on bipartite
    structures can oscillate rather than converge, which fixed
    iterations also make well-defined).  The graph is treated as
    undirected (edges symmetrized), duplicate edges count once,
    self-loops and null endpoints drop.  Isolated update targets
    keep their previous label.

    Scale shape: :func:`pagerank`'s discipline — the symmetrized
    distinct edge set is materialized once, each iteration is ONE
    labels⋈edges equi-join plus two partial-agged aggregations
    ((node, label) counts, then a struct-min argmax per node), and
    the node-sized label vector localCheckpoints per step (O(1)
    lineage; per-step cadence measured optimal — see PLANS.md).
    A celebrity node's in-messages partial-aggregate map-side per
    (node, label), so hub skew ships one row per partition per
    distinct neighbor label, never its degree.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    base = edges.filter(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
        & (F.col(src) != F.col(dst))
    ).select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    und = (base.union(base.select(F.col("__d").alias("__s"),
                                  F.col("__s").alias("__d")))
           .distinct().localCheckpoint())
    nodes = und.select(F.col("__s").alias("node")).distinct() \
        .localCheckpoint()
    labels = nodes.select("node", F.col("node").alias("community"))
    for _ in range(int(iterations)):
        msgs = (labels.join(und, labels["node"] == und["__s"])
                .select(F.col("__d").alias("node"), "community"))
        cnt = msgs.groupBy("node", "community").agg(
            F.count(F.lit(1)).alias("__c"))
        pick = cnt.groupBy("node").agg(
            F.min(F.struct((F.lit(0) - F.col("__c")).alias("nc"),
                           F.col("community").alias("lab")))
            .alias("__m"))
        labels = (labels.join(pick, "node", "left")
                  .select("node",
                          F.coalesce(F.col("__m.lab"),
                                     F.col("community"))
                          .alias("community"))
                  ).localCheckpoint()
    return labels
