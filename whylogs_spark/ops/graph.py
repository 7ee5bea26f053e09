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

__all__ = ["degree_stats", "pagerank"]


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
