"""Inter-annotator agreement for labeling pipelines: Cohen's kappa
(plain and linear/quadratic weighted) between two raters, and
Krippendorff's alpha (nominal) for any number of raters with missing
ratings — the statistics that decide whether a labeling workforce's
output is trainable data or noise.

Everything reduces over contingency/coincidence tables whose size is
bounded by the CATEGORY cardinality, never the data: one
groupBy(rating_a, rating_b) for kappa, one groupBy(item, rating) +
per-item pair expansion for alpha (the expansion is over category
counts per item — at most categories² rows per item, tiny).  Margins
and totals are 1-row aggregates broadcast back.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cohens_kappa", "krippendorff_alpha"]


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    weights: Optional[str] = None,
) -> DataFrame:
    """Cohen's kappa between two rating columns; one output row:
    ``(n_items, n_categories, po, pe, kappa)``.

    ``weights=None`` is the classic nominal kappa (observed agreement
    = the diagonal).  ``weights='linear'`` / ``'quadratic'`` compute
    weighted kappa for ORDINAL ratings: the ratings are cast to
    double and disagreement ``|a − b|`` (or its square) is normalized
    by the maximum category distance, ``kappa = 1 − Σw·obs / Σw·exp``
    — the standard ordinal-credit form.  Rows where either rating is
    null are excluded (pairwise-complete).

    Scale shape: ONE groupBy over the (a, b) contingency table
    (categories² rows max) with map-side partial aggregation; margins
    come from the same table, the expected matrix is the margin
    cross join — all bounded by category cardinality.
    """
    if weights not in (None, "linear", "quadratic"):
        raise ValueError(
            f"weights must be None|'linear'|'quadratic': {weights!r}")
    a = F.col(rater_a)
    b = F.col(rater_b)
    if weights is None:
        a = a.cast("string")
        b = b.cast("string")
    else:
        a = a.cast("double")
        b = b.cast("double")
    obs = (
        df.filter(a.isNotNull() & b.isNotNull())
        .select(a.alias("__a"), b.alias("__b"))
        .groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__ct"))
    )
    tot = obs.agg(
        F.sum("__ct").alias("__n"),
        F.count_distinct("__a").alias("__ka"),
        F.count_distinct("__b").alias("__kb"))
    ma = obs.groupBy("__a").agg(F.sum("__ct").alias("__na"))
    mb = obs.groupBy("__b").agg(F.sum("__ct").alias("__nb"))

    if weights is None:
        po = obs.filter(F.col("__a") == F.col("__b")) \
            .agg(F.coalesce(F.sum("__ct"), F.lit(0)).alias("__agree"))
        pe = (
            ma.join(mb, ma["__a"] == mb["__b"])
            .agg(F.sum(F.col("__na").cast("double") * F.col("__nb"))
                 .alias("__pe_num"))
        )
        row = tot.crossJoin(F.broadcast(po)).crossJoin(F.broadcast(pe))
        n = F.col("__n").cast("double")
        po_c = F.col("__agree").cast("double") / n
        pe_c = F.coalesce(F.col("__pe_num"), F.lit(0.0)) / (n * n)
        return row.select(
            F.col("__n").alias("n_items"),
            F.greatest("__ka", "__kb").alias("n_categories"),
            po_c.alias("po"), pe_c.alias("pe"),
            F.when(pe_c < 1.0, (po_c - pe_c) / (1.0 - pe_c))
            .alias("kappa"))

    # weighted: disagreement weights over the numeric category span
    span = obs.agg(
        (F.greatest(F.max("__a"), F.max("__b"))
         - F.least(F.min("__a"), F.min("__b"))).alias("__span"))
    power = 1 if weights == "linear" else 2

    def w(x, y):
        d = F.abs(x - y) / F.when(F.col("__span") > 0,
                                  F.col("__span"))
        return d if power == 1 else d * d

    obs_w = obs.crossJoin(F.broadcast(span)).agg(
        F.sum(w(F.col("__a"), F.col("__b"))
              * F.col("__ct").cast("double")).alias("__wo"))
    exp_w = (
        ma.crossJoin(mb).crossJoin(F.broadcast(span))
        .agg(F.sum(w(F.col("__a"), F.col("__b"))
                   * F.col("__na").cast("double") * F.col("__nb"))
             .alias("__we_num"))
    )
    row = tot.crossJoin(F.broadcast(obs_w)) \
        .crossJoin(F.broadcast(exp_w)).crossJoin(F.broadcast(span))
    n = F.col("__n").cast("double")
    wo = F.col("__wo") / n
    we = F.col("__we_num") / (n * n)
    return row.select(
        F.col("__n").alias("n_items"),
        F.greatest("__ka", "__kb").alias("n_categories"),
        # for weighted kappa report agreement complements
        (F.lit(1.0) - wo).alias("po"),
        (F.lit(1.0) - we).alias("pe"),
        F.when(we > 0, F.lit(1.0) - wo / we).alias("kappa"))


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    rating_col: str,
) -> DataFrame:
    """Krippendorff's alpha (nominal data) over an (item, rating) long
    frame — any number of raters, missing ratings allowed; one output
    row ``(n_items, n_ratings, n_categories, do, de, alpha)``.

    The canonical coincidence-matrix formulation: within an item with
    m ratings, every ordered pair of DISTINCT rating slots
    contributes weight 1/(m−1); nominal disagreement is the fraction
    of cross-category pairs.  Items with a single rating carry no
    pair and drop out (standard).  ``alpha = 1 − Do/De`` with the
    expected disagreement from the pooled category totals.

    Scale shape: groupBy(item, rating) category counts (bounded per
    item), per-item pair terms are plain column arithmetic on that
    table, the category totals are a second bounded aggregation —
    the only exchanges are keyed by item / category.
    """
    it = F.col(item_col)
    r = F.col(rating_col).cast("string")
    counts = (
        df.filter(it.isNotNull() & r.isNotNull())
        .select(it.alias("__i"), r.alias("__r"))
        .groupBy("__i", "__r").agg(F.count(F.lit(1)).alias("__c"))
    )
    per_item = counts.groupBy("__i").agg(
        F.sum("__c").alias("__m"),
        F.sum(F.col("__c") * F.col("__c")).alias("__sq"))
    # within-item coincidence: same-category pairs = sum c(c-1),
    # total pairs = m(m-1); each weighted by 1/(m-1)
    pairable = per_item.filter(F.col("__m") >= 2)
    obs = pairable.agg(
        F.sum((F.col("__m").cast("double") * F.col("__m")
               - F.col("__sq")) / (F.col("__m") - 1))
        .alias("__do_num"),
        F.sum(F.col("__m").cast("double")).alias("__n_pairable"),
        F.count(F.lit(1)).alias("__n_items"))
    # pooled category totals over PAIRABLE items only (the
    # coincidence matrix definition)
    cat = counts.join(pairable.select("__i"), "__i", "left_semi") \
        .groupBy("__r").agg(F.sum("__c").alias("__nc"))
    exp = cat.agg(
        F.sum(F.col("__nc").cast("double") * F.col("__nc"))
        .alias("__sum_sq"),
        F.count(F.lit(1)).alias("__n_categories"))
    row = obs.crossJoin(F.broadcast(exp))
    n = F.col("__n_pairable").cast("double")
    # __do_num already sums the DISAGREEING coincidences
    # (m² − Σc²)/(m−1) per item; the matrix total is n = Σ m
    do = F.col("__do_num") / n
    de = F.when(n > 1,
                F.lit(1.0) - (F.col("__sum_sq") - n) / (n * (n - 1)))
    return row.select(
        F.col("__n_items").alias("n_items"),
        F.col("__n_pairable").cast("long").alias("n_ratings"),
        "__n_categories",
        do.alias("do"), de.alias("de"),
        F.when(de > 0, F.lit(1.0) - do / de).alias("alpha"),
    ).withColumnRenamed("__n_categories", "n_categories")
