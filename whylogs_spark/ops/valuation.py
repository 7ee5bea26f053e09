"""Data valuation: exact KNN-Shapley scores per training example.

Curation wants a PER-EXAMPLE number for "how much does this row help a
classifier" — to drop harmful/mislabeled rows and to weight the rest.
The exact Shapley value of a training point under the KNN utility has
a closed form (Jia et al., PVLDB 2019): sort training points by
distance to a test point (ascending, x_(1) nearest), then

    s_(N) = 1[y_(N) = y] / N
    s_(i) = s_(i+1) + (1[y_(i) = y] - 1[y_(i+1) = y]) / K * min(K, i) / i

and a point's value is its s averaged over the test set.  The whole
thing is rank arithmetic — no model training — which makes it both a
natural Spark plan and exactly replayable by the SQL oracle.

Scale shape: the pair frame is |train| x |test| rows with the test
side BROADCAST (``max_test`` caps it at plan build); per-test ranking
and the suffix recursion are windows PARTITIONED BY the test id, so
one partition holds all |train| rows for one test point —
``max_train`` guards that documented bound at plan build (re-grain by
sampling train or lowering max_test before raising it).  The suffix
sum is an ordered within-partition prefix — both engines accumulate
in the same sequence, so the recursion replays bit-for-bit; only the
final cross-test average (unordered float sum) needs decimal pinning
in gate projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["knn_shapley"]


def knn_shapley(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    emb_col: str,
    label_col: str,
    k: int = 5,
    max_test: int = 1000,
    max_train: int = 2_000_000,
) -> DataFrame:
    """-> one row per training example: ``(<id_col>, <label_col>,
    shapley_value, n_test)``, where ``shapley_value`` is the exact
    KNN-Shapley score averaged over the ``test`` frame.

    Distances are squared L2 over ``emb_col`` (monotone in L2, so the
    ranking — all that matters — is identical), computed as the
    elementwise ``(x - y)^2`` left fold so the oracle can spell the
    same IEEE sequence.  Rank ties break on ``id_col``.  Positive
    scores mark helpful neighbors, negatives mark label noise /
    contamination candidates.  Test rows are NOT excluded from
    ``train`` automatically — dedupe upstream if the frames overlap
    and that matters for your use.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    n_test = test.count()
    if n_test == 0:
        raise ValueError("test frame is empty")
    if n_test > max_test:
        raise ValueError(
            f"test frame has {n_test} rows > max_test={max_test}; "
            "sample it down (the pair frame is |train| x |test|)")
    n_train = train.count()
    if n_train == 0:
        raise ValueError("train frame is empty")
    if n_train > max_train:
        raise ValueError(
            f"train frame has {n_train} rows > max_train={max_train}: "
            "one window partition holds all train rows for one test "
            "point — sample train or raise the guard knowingly")

    # array<double> up front: float32 elementwise math would round
    # differently per engine; the widening cast is exact
    tr = train.select(
        F.col(id_col).alias("__tid"),
        F.col(label_col).alias("__ty"),
        F.col(emb_col).cast("array<double>").alias("__te"))
    te = test.select(
        F.col(id_col).alias("__qid"),
        F.col(label_col).alias("__qy"),
        F.col(emb_col).cast("array<double>").alias("__qe"))
    pairs = tr.crossJoin(F.broadcast(te))
    d2 = F.aggregate(
        F.zip_with("__te", "__qe",
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("__qid").orderBy(
        F.col("__d2").asc(), F.col("__tid").asc())
    ranked = (pairs
              .select("__tid", "__ty", "__qid", "__qy",
                      d2.alias("__d2"))
              .select("__tid", "__ty", "__qid",
                      F.row_number().over(w).cast("long").alias("__i"),
                      (F.col("__ty") == F.col("__qy"))
                      .cast("double").alias("__m"),
                      F.lead((F.col("__ty") == F.col("__qy"))
                             .cast("double")).over(w).alias("__mn")))
    kf = F.lit(float(k))
    nf = F.lit(float(n_train))
    inc = F.when(
        F.col("__mn").isNull(), F.col("__m") / nf
    ).otherwise(
        (F.col("__m") - F.col("__mn")) / kf
        * F.least(kf, F.col("__i").cast("double"))
        / F.col("__i").cast("double"))
    ws = (Window.partitionBy("__qid")
          .orderBy(F.col("__i").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    s = ranked.select(
        "__tid", "__ty", F.sum(inc).over(ws).alias("__s"))
    # __ty is constant per __tid (ids assumed unique in train), so
    # grouping on both carries the label without a join back
    return (s.groupBy("__tid", "__ty")
            .agg((F.sum("__s") / F.lit(float(n_test)))
                 .alias("shapley_value"),
                 F.count(F.lit(1)).alias("n_test"))
            .select(F.col("__tid").alias(id_col),
                    F.col("__ty").alias(label_col),
                    "shapley_value", "n_test"))
