"""Predicate DSL + ranking metrics vs hand-computed oracles."""

import math

import pytest
from pyspark.sql import functions as F

from whylogs_spark.core import ranking
from whylogs_spark.core.relations import Require, parse_predicate


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "alice", 31.0, "F"), (2, "bob", 17.0, "O"),
         (3, "carol", 150.0, "F"), (4, None, 45.0, "P")],
        ["id", "name", "price", "status"],
    )


def test_fluent_predicates(people):
    assert people.filter(
        Require("price").greater_than(30)).count() == 3
    assert people.filter(
        Require("name").matches("a")).count() == 1       # anchored
    assert people.filter(
        Require("name").search("a")).count() == 2        # anywhere (null skipped)
    assert people.filter(
        Require("status").fullmatch("F")).count() == 2
    assert people.filter(Require("name").is_null()).count() == 1


def test_prefix_parser(people):
    c = parse_predicate("and > price 20 < price 100")
    assert people.filter(c).count() == 2
    c2 = parse_predicate("or == status P ~ name ^a")
    assert people.filter(c2).count() == 2
    c3 = parse_predicate("not == status F")
    assert people.filter(c3).count() == 2


def test_prefix_parser_errors():
    with pytest.raises(ValueError):
        parse_predicate("bogus x 1")
    with pytest.raises(ValueError):
        parse_predicate("> price")
    with pytest.raises(ValueError):
        parse_predicate("> price 1 extra")


@pytest.fixture(scope="module")
def rank_df(spark):
    # predictions ranked best-first; targets = relevant set
    return spark.createDataFrame(
        [
            (1, [1, 2, 3, 4], [1, 4]),     # hits at ranks 1,4
            (2, [5, 6, 7, 8], [9]),        # no hits
            (3, [10, 11], [11, 12, 13]),   # hit at rank 2
        ],
        ["row_id", "predictions", "targets"],
    )


def test_ranking_metrics_exact(rank_df):
    rows = {r["row_id"]: r
            for r in ranking.with_ranking_metrics(rank_df).collect()}
    r1 = rows[1]
    assert r1["recall_k"] == pytest.approx(1.0)          # 2/2
    assert r1["precision_k"] == pytest.approx(0.5)       # 2/4
    assert r1["top_rank"] == 1
    assert r1["mrr"] == pytest.approx(1.0)
    # AP = mean(prec@1, prec@4) = mean(1, 0.5) = 0.75
    assert r1["average_precision_k"] == pytest.approx(0.75)
    # DCG = 1/log2(2) + 1/log2(5); IDCG = 1/log2(2) + 1/log2(3)
    dcg = 1.0 + 1.0 / math.log2(5)
    idcg = 1.0 + 1.0 / math.log2(3)
    assert r1["ndcg_k"] == pytest.approx(dcg / idcg)

    r2 = rows[2]
    assert r2["recall_k"] == 0.0
    assert r2["top_rank"] == 0
    assert r2["mrr"] == 0.0
    assert r2["average_precision_k"] == 0.0
    assert r2["ndcg_k"] == 0.0

    r3 = rows[3]
    assert r3["recall_k"] == pytest.approx(1 / 3)
    assert r3["precision_k"] == pytest.approx(0.5)
    assert r3["top_rank"] == 2
    assert r3["mrr"] == pytest.approx(0.5)


def test_ranking_k_slice(rank_df):
    rows = {r["row_id"]: r
            for r in ranking.with_ranking_metrics(rank_df, k=2).collect()}
    assert rows[1]["precision_k"] == pytest.approx(0.5)  # [1,2] -> 1 hit /2
    assert rows[1]["recall_k"] == pytest.approx(0.5)     # 1 of 2 relevant


def test_ranking_summary(rank_df):
    s = ranking.ranking_summary(rank_df).collect()[0]
    assert s["n"] == 3
    assert s["mean_reciprocal_rank"] == pytest.approx((1.0 + 0 + 0.5) / 3)


# --------------------------------------------- calibration + ROC-AUC

def test_roc_auc_exact_against_bruteforce(spark):
    import random

    from whylogs_spark.core import model_perf as M

    rng = random.Random(11)
    rows = []
    for _ in range(600):
        y = rng.random() < 0.3
        s = round(min(max(rng.gauss(0.7 if y else 0.4, 0.25), 0), 1), 2)
        rows.append((float(s), 1 if y else 0))
    df = spark.createDataFrame(rows, "score double, label int")
    r = M.roc_auc_exact(df, "score", "label").collect()[0]
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    wins = sum(1 for p in pos for n in neg if p > n) \
        + 0.5 * sum(1 for p in pos for n in neg if p == n)
    assert r.auc == pytest.approx(wins / (len(pos) * len(neg)),
                                  abs=1e-12)
    assert (r.n_positive, r.n_negative) == (len(pos), len(neg))


def test_roc_auc_perfect_and_random_separation(spark):
    from whylogs_spark.core import model_perf as M

    perfect = spark.createDataFrame(
        [(0.9, 1)] * 5 + [(0.1, 0)] * 5, "score double, label int")
    assert M.roc_auc_exact(perfect, "score", "label") \
        .collect()[0].auc == pytest.approx(1.0)
    allsame = spark.createDataFrame(
        [(0.5, 1)] * 5 + [(0.5, 0)] * 5, "score double, label int")
    assert M.roc_auc_exact(allsame, "score", "label") \
        .collect()[0].auc == pytest.approx(0.5)


def test_expected_calibration_error(spark):
    from whylogs_spark.core import model_perf as M

    # perfectly calibrated at bin granularity: conf 0.25 bin has 25%
    # positives, conf 0.75 bin has 75%
    rows = ([(0.25, 1)] * 1 + [(0.25, 0)] * 3
            + [(0.75, 1)] * 3 + [(0.75, 0)] * 1)
    df = spark.createDataFrame(rows, "score double, label int")
    r = M.expected_calibration_error(df, "score", "label",
                                     n_bins=4).collect()[0]
    assert r.ece == pytest.approx(0.0, abs=1e-12)
    # grossly over-confident: all scores 0.95, half positive
    bad = spark.createDataFrame(
        [(0.95, 1)] * 5 + [(0.95, 0)] * 5, "score double, label int")
    r2 = M.expected_calibration_error(bad, "score", "label").collect()[0]
    assert r2.ece == pytest.approx(0.45, abs=1e-12)
    assert r2.mce == pytest.approx(0.45, abs=1e-12)


def test_roc_auc_single_class_returns_null_not_error(spark):
    from whylogs_spark.core import model_perf as M

    allpos = spark.createDataFrame(
        [(0.3, 1), (0.6, 1)], "score double, label int")
    r = M.roc_auc_exact(allpos, "score", "label").collect()[0]
    assert r.auc is None
    assert r.n_positive == 2 and r.n_negative == 0


# --------------------------------------------- sketch-backed AUC

def test_roc_auc_from_sketches_exact_at_small_n(spark):
    """Below the KLL compaction threshold the sketch holds every value
    at weight 1, so the sketch AUC IS the exact AUC."""
    import random

    from whylogs_spark.core import model_perf as M
    from whylogs_spark.core.sketches import KllSketch

    import numpy as np

    rng = random.Random(23)
    pos = [rng.gauss(0.7, 0.2) for _ in range(120)]
    neg = [rng.gauss(0.4, 0.2) for _ in range(90)]
    sp_, sn = KllSketch(256), KllSketch(256)
    sp_.update_batch(np.array(pos))
    sn.update_batch(np.array(neg))
    got = M.roc_auc_from_sketches(sp_, sn)
    wins = sum(1.0 for p in pos for n in neg if p > n) \
        + 0.5 * sum(1.0 for p in pos for n in neg if p == n)
    assert got == pytest.approx(wins / (len(pos) * len(neg)),
                                abs=1e-12)


def test_roc_auc_from_sketches_empty_class_nan(spark):
    import math

    from whylogs_spark.core import model_perf as M
    from whylogs_spark.core.sketches import KllSketch

    import numpy as np

    a = KllSketch(256)
    a.update_batch(np.array([0.5, 0.6]))
    assert math.isnan(M.roc_auc_from_sketches(a, KllSketch(256)))


def test_roc_auc_sketch_close_to_exact(spark):
    """The production sketch path (per-partition KLL + monoid merge)
    tracks roc_auc_exact within the sketch's rank-error budget on a
    continuous-score corpus spread over many partitions."""
    import random

    from whylogs_spark.core import model_perf as M

    rng = random.Random(31)
    rows = []
    for _ in range(4000):
        y = rng.random() < 0.35
        rows.append((rng.gauss(0.65 if y else 0.35, 0.25),
                     1 if y else 0))
    df = spark.createDataFrame(
        rows, "score double, label int").repartition(11)
    exact = M.roc_auc_exact(df, "score", "label").collect()[0].auc
    approx = M.roc_auc_sketch(df, "score", "label", k=256)
    assert approx == pytest.approx(exact, abs=0.02)


def test_roc_auc_from_segmented_profile(spark):
    """AUC off a label-segmented profile view — the piece auc_between
    composes with the store."""
    import random

    import whylogs_spark as wsp
    from whylogs_spark.core import model_perf as M

    rng = random.Random(41)
    rows = []
    for _ in range(1500):
        y = rng.random() < 0.4
        rows.append((rng.gauss(0.7 if y else 0.35, 0.2), 1 if y else 0))
    df = spark.createDataFrame(rows, "score double, label int")
    view = wsp.profile(df, segment_by=["label"])
    got = M.roc_auc_from_profile(view, "score", "label")
    exact = M.roc_auc_exact(df, "score", "label").collect()[0].auc
    assert got == pytest.approx(exact, abs=0.03)
    # missing class -> NaN, not an error
    import math
    assert math.isnan(
        M.roc_auc_from_profile(view, "score", "label", pos_value="7"))


def _np_average_precision(scores, labels):
    """Step-sum AP with one threshold per distinct score (sklearn's
    average_precision_score convention)."""
    import numpy as np
    s = np.asarray(scores, float)
    y = np.asarray(labels, float)
    P = y.sum()
    if P == 0:
        return None
    ap = 0.0
    prev_r = 0.0
    for t in sorted(set(s), reverse=True):
        tp = y[s >= t].sum()
        fp = (1 - y)[s >= t].sum()
        r = tp / P
        ap += (r - prev_r) * (tp / (tp + fp))
        prev_r = r
    return ap


def test_pr_auc_exact_against_bruteforce(spark):
    import numpy as np

    from whylogs_spark.core.model_perf import pr_auc_exact

    rng = np.random.default_rng(23)
    n = 600
    y = (rng.random(n) < 0.3).astype(float)
    # ties included: quantize some scores
    s = np.where(rng.random(n) < 0.5,
                 np.round(rng.random(n), 2), rng.random(n))
    s = s + y * 0.35  # informative signal
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(s, y)],
        "score double, label double").repartition(4)
    row = pr_auc_exact(df, "score", "label").first()
    assert row.average_precision == pytest.approx(
        _np_average_precision(s, y), abs=1e-12)
    assert row.n_positive == int(y.sum())
    assert row.n_negative == n - int(y.sum())


def test_pr_auc_exact_edges(spark):
    from whylogs_spark.core.model_perf import pr_auc_exact

    # perfect separation -> AP = 1
    rows = [(float(i), 1.0 if i >= 5 else 0.0) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, label double")
    assert pr_auc_exact(df, "score", "label").first() \
        .average_precision == pytest.approx(1.0)
    # no positives -> NULL, not a divide-by-zero
    neg_only = spark.createDataFrame(
        [(0.3, 0.0), (0.7, 0.0)], "score double, label double")
    assert pr_auc_exact(neg_only, "score", "label").first() \
        .average_precision is None
    # binned approximation stays close on smooth scores
    import numpy as np
    rng = np.random.default_rng(3)
    y = (rng.random(2000) < 0.4).astype(float)
    s = rng.random(2000) * 0.6 + y * 0.4
    big = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(s, y)],
        "score double, label double")
    exact = pr_auc_exact(big, "score", "label").first() \
        .average_precision
    binned = pr_auc_exact(big, "score", "label", n_bins=256).first() \
        .average_precision
    assert binned == pytest.approx(exact, abs=0.02)


def test_pr_auc_from_sketches_and_profile(spark):
    import numpy as np

    import whylogs_spark as wsp
    from whylogs_spark.core.model_perf import (pr_auc_exact,
                                               pr_auc_from_profile)

    rng = np.random.default_rng(11)
    n = 4000
    y = (rng.random(n) < 0.25).astype(float)
    s = np.clip(rng.normal(0.4 + 0.3 * y, 0.15), 0, 1)
    df = spark.createDataFrame(
        [(float(a), int(b)) for a, b in zip(s, y)],
        "score double, label int")
    exact = pr_auc_exact(df, "score", "label").first() \
        .average_precision
    view = wsp.profile(df.select("score", "label"),
                       segment_by=["label"])
    approx = pr_auc_from_profile(view, "score", "label")
    assert approx == pytest.approx(exact, abs=0.03)
    # absent class segment -> nan
    import math
    only_pos = wsp.profile(
        df.filter("label = 1").select("score", "label"),
        segment_by=["label"])
    assert math.isnan(pr_auc_from_profile(only_pos, "score", "label"))
