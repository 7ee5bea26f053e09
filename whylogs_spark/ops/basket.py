"""Pairwise association rules (market-basket affinity) at scale.

``association_rules`` mines A -> B rules over per-user item sets:
support / confidence / lift for every ordered pair that clears
``min_support``. The classic use on an events stream: which
event types co-occur in the same user's history far above chance
(feature-adoption affinity, funnel shortcuts, abuse signatures).

Scale shape: one shuffle to the user key builds bounded per-user
DISTINCT item sets (skew bound = one user's distinct items, capped by
``max_items_per_user`` exactly like the LSH family caps degenerate
buckets); in-plan higher-order functions expand each basket's ordered
pairs (no self cross-join); one partial-agg shuffle counts pairs.
Item marginals come from the same basket frame, and the user total is
a 1-row broadcast. Nothing corpus-sized is ever collected.

The reference has no basket analysis; this extends the behavioral
family (funnel / retention / transitions) with the co-occurrence
dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    user_col: str = "user_id",
    item_col: str = "event_type",
    min_support: float = 0.01,
    max_items_per_user: int = 1024,
) -> DataFrame:
    """Ordered pairwise rules ``antecedent -> consequent`` over
    per-user distinct item sets.

    Returns one row per ordered pair with joint support >=
    ``min_support``:

    * ``n_both, n_ant, n_cons`` — users holding both / the
      antecedent / the consequent
    * ``support = n_both / n_users``
    * ``confidence = n_both / n_ant``
    * ``lift = confidence / (n_cons / n_users)`` (> 1: positive
      association)

    Null users/items are excluded. Baskets larger than
    ``max_items_per_user`` are dropped whole (a bot touching every
    item would otherwise expand O(n_items^2) pairs AND link
    everything to everything; the cap is the same degenerate-key
    policy as the LSH bucket cap — documented, not silent:
    ``n_users`` counts only kept baskets).
    """
    if not 0.0 < min_support <= 1.0:
        raise ValueError(
            f"min_support must be in (0, 1]: {min_support}")
    if max_items_per_user < 2:
        raise ValueError(
            f"max_items_per_user must be >= 2: {max_items_per_user}")
    baskets = (
        df.filter(F.col(user_col).isNotNull()
                  & F.col(item_col).isNotNull())
        .groupBy(user_col)
        .agg(F.array_sort(F.collect_set(F.col(item_col)))
             .alias("__items"))
        .filter(F.size("__items") <= max_items_per_user)
    )
    n_users = baskets.agg(
        F.count(F.lit(1)).alias("__n_users"))
    # marginals: one explode of the basket frame (already distinct
    # per user), partial-agg counts
    marg = (
        baskets.select(F.explode("__items").alias("item"))
        .groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    )
    # ordered pair expansion in-plan: for i != j emit (items[i],
    # items[j]) — both directions at once, no self-join
    pair_arr = F.filter(
        F.flatten(F.transform(
            F.col("__items"),
            lambda x: F.transform(
                F.col("__items"),
                lambda y: F.struct(x.alias("antecedent"),
                                   y.alias("consequent"))),
        )),
        lambda p: p["antecedent"] != p["consequent"],
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.antecedent").alias("antecedent"),
                 F.col("p.consequent").alias("consequent"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ant = marg.select(F.col("item").alias("antecedent"),
                      F.col("n_item").alias("n_ant"))
    cons = marg.select(F.col("item").alias("consequent"),
                       F.col("n_item").alias("n_cons"))
    out = (
        pairs.join(F.broadcast(ant), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(n_users))
    )
    nu = F.col("__n_users").cast("double")
    support = F.col("n_both").cast("double") / nu
    confidence = F.col("n_both").cast("double") \
        / F.col("n_ant").cast("double")
    lift = confidence / (F.col("n_cons").cast("double") / nu)
    return (
        out.withColumn("support", support)
        .filter(F.col("support") >= F.lit(float(min_support)))
        .select(
            "antecedent", "consequent", "n_both", "n_ant", "n_cons",
            F.col("__n_users").alias("n_users"), "support",
            confidence.alias("confidence"), lift.alias("lift"),
        )
    )
