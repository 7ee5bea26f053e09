"""Group fairness metrics for a binary classifier: selection rates,
demographic parity, disparate impact, equalized-odds gaps — the model
governance companion to ``core.model_perf``.

The reference ships model performance metrics (confusion matrix,
ROC/AUC: python/whylogs/core/metrics/model_metrics.py); regulated
deployments additionally need the SAME confusion-matrix inputs sliced
by a protected attribute and compared across groups.  Everything here
reduces over ONE aggregation per group (eight conditional sums), then
joins the 1-row reference group back by broadcast — no second scan, no
window, group-cardinality-bounded output at any data size.

Definitions (positive prediction = selected):

* ``selection_rate``   = P(pred = 1 | group)
* ``base_rate``        = P(label = 1 | group)
* ``demographic_parity_diff`` = selection_rate − selection_rate_ref
* ``disparate_impact`` = selection_rate / selection_rate_ref (the
  four-fifths-rule ratio; null when the reference selects nobody)
* ``tpr`` / ``fpr``    = recall / false-positive rate per group
* ``equalized_odds_gap`` = max(|tpr − tpr_ref|, |fpr − fpr_ref|)
* ``precision_gap``    = precision − precision_ref
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fairness_report"]


def fairness_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    group_col: str,
    reference_group: Optional[str] = None,
) -> DataFrame:
    """One row per protected-attribute group with rates, confusion
    counts, and gaps vs the reference group.

    ``reference_group`` names the privileged group explicitly; when
    omitted, the LARGEST group (ties broken by group name, so the
    choice is deterministic) is the reference — the common audit
    convention.  A named reference group absent from the data (typo,
    or filtered out with the null rows) does NOT empty the report:
    every group row survives with null ``reference_group`` and null
    gap columns.  Rows with a null group, label, or prediction are
    excluded; labels/predictions are truthy via ``cast("boolean")``
    (0/1 ints, booleans, doubles all work).

    Scale shape: groupBy(group) with eight conditional-sum aggregates
    (partial-agg before the exchange, skew bound = nothing — every
    row reduces map-side), the reference row is selected with ONE
    more tiny aggregation over the group table and broadcast-joined
    back.  Output rows = number of groups.
    """
    y = F.col(label_col).cast("boolean")
    p = F.col(pred_col).cast("boolean")
    base = df.filter(
        F.col(group_col).isNotNull() & y.isNotNull() & p.isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("group"),
        y.cast("int").alias("__y"), p.cast("int").alias("__p"))

    g = base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("__pos"),
        F.sum("__p").alias("__sel"),
        F.sum(F.col("__y") * F.col("__p")).alias("tp"),
        F.sum((1 - F.col("__y")) * F.col("__p")).alias("fp"),
        F.sum(F.col("__y") * (1 - F.col("__p"))).alias("fn"),
        F.sum((1 - F.col("__y")) * (1 - F.col("__p"))).alias("tn"),
    )
    nd = F.col("n").cast("double")
    g = g.select(
        "group", "n", "tp", "fp", "fn", "tn",
        (F.col("__sel") / nd).alias("selection_rate"),
        (F.col("__pos") / nd).alias("base_rate"),
        F.try_divide(F.col("tp").cast("double"),
                     (F.col("tp") + F.col("fn")).cast("double"))
        .alias("tpr"),
        F.try_divide(F.col("fp").cast("double"),
                     (F.col("fp") + F.col("tn")).cast("double"))
        .alias("fpr"),
        F.try_divide(F.col("tp").cast("double"),
                     (F.col("tp") + F.col("fp")).cast("double"))
        .alias("precision"),
    )

    if reference_group is not None:
        ref = g.filter(F.col("group") == F.lit(str(reference_group)))
    else:
        # deterministic default: the largest group, smallest-name
        # tiebreak — ONE tiny agg over the (groups)-sized table, then
        # a broadcast filter + bounded limit
        top_n = g.agg(F.max("n").alias("__mx"))
        ref = (g.join(F.broadcast(top_n),
                      F.col("n") == F.col("__mx"))
               .orderBy("group").limit(1).drop("__mx"))
    ref = ref.select(
        F.col("selection_rate").alias("__sel_ref"),
        F.col("tpr").alias("__tpr_ref"),
        F.col("fpr").alias("__fpr_ref"),
        F.col("precision").alias("__prec_ref"),
        F.col("group").alias("reference_group"))

    # LEFT join (not crossJoin): a named reference_group absent from
    # the data yields an empty ref frame, and a cross join would
    # silently return zero rows — the left join keeps every group row
    # with null reference_group / gap columns instead
    out = g.join(F.broadcast(ref), F.lit(True), "left")
    return out.select(
        "group", "n", "base_rate", "selection_rate",
        "tp", "fp", "fn", "tn", "tpr", "fpr", "precision",
        "reference_group",
        (F.col("selection_rate") - F.col("__sel_ref"))
        .alias("demographic_parity_diff"),
        F.try_divide(F.col("selection_rate"),
                     F.when(F.col("__sel_ref") > 0, F.col("__sel_ref")))
        .alias("disparate_impact"),
        F.when(
            F.col("tpr").isNotNull() & F.col("__tpr_ref").isNotNull()
            & F.col("fpr").isNotNull() & F.col("__fpr_ref").isNotNull(),
            F.greatest(F.abs(F.col("tpr") - F.col("__tpr_ref")),
                       F.abs(F.col("fpr") - F.col("__fpr_ref"))))
        .alias("equalized_odds_gap"),
        (F.col("precision") - F.col("__prec_ref"))
        .alias("precision_gap"),
    )
