import numpy as np
import pytest

from whylogs_spark.ops.cluster import cluster_silhouette, kmeans
from whylogs_spark.ops.conformal import split_conformal
from whylogs_spark.ops.labelqc import confident_joint, label_issues


def _mk_probs(rng, true_cls, classes, sharp=0.8):
    p = rng.dirichlet([1.0] * len(classes))
    p = (1 - sharp) * p
    p[classes.index(true_cls)] += sharp
    return [float(x) for x in p]


def test_confident_joint_finds_planted_flips(spark):
    """Plant 10% label flips behind confident predictions of the TRUE
    class: the confident joint's off-diagonal mass isolates them."""
    rng = np.random.RandomState(4)
    classes = ["a", "b", "c"]
    rows = []
    flipped = set()
    for i in range(600):
        true = classes[i % 3]
        given = true
        if rng.rand() < 0.1:
            given = classes[(classes.index(true) + 1) % 3]
            flipped.add(i)
        rows.append((i, given, *_mk_probs(rng, true, classes)))
    df = spark.createDataFrame(
        rows, "id long, label string, pa double, pb double, pc double")
    pc = {"a": "pa", "b": "pb", "c": "pc"}
    cj = {(r.given_label, r.suggested_label): r.n
          for r in confident_joint(df, "label", pc).collect()}
    off = sum(v for (i, j), v in cj.items() if i != j)
    diag = sum(v for (i, j), v in cj.items() if i == j)
    # off-diagonal mass ~= the planted 10%
    assert 0.05 < off / (off + diag) < 0.2
    issues = label_issues(df, "label", pc).collect()
    flagged = {r.id for r in issues}
    # most planted flips are flagged and most flags are planted
    assert len(flagged & flipped) / len(flipped) > 0.8
    assert len(flagged & flipped) / max(len(flagged), 1) > 0.8
    assert all(r.margin > 0 for r in issues)
    with pytest.raises(ValueError, match="classes"):
        confident_joint(df, "label", {"a": "pa"})


def test_split_conformal_matches_numpy(spark):
    rng = np.random.RandomState(8)
    rows = []
    for g, n in (("u", 200), ("v", 57)):
        for _ in range(n):
            y = float(rng.normal())
            rows.append((g, y, y + float(rng.normal(0, 0.5))))
    df = spark.createDataFrame(rows, "g string, y double, yhat double")
    out = {r.g: r for r in split_conformal(
        df, "y", "yhat", alpha=0.1, group_cols=["g"]).collect()}
    for g in ("u", "v"):
        res = np.sort([abs(y - p) for gg, y, p in rows if gg == g])
        n = len(res)
        k = int(np.ceil((n + 1) * 0.9))
        assert out[g].n == n
        assert out[g].qhat == pytest.approx(res[k - 1])
        assert out[g].coverage >= 0.9
        assert out[g].coverage == pytest.approx(
            (res <= res[k - 1]).mean())
    # too few rows for the alpha -> infinite interval -> null qhat
    tiny = spark.createDataFrame(
        [("t", 1.0, 1.5)] * 5, "g string, y double, yhat double")
    row = split_conformal(tiny, "y", "yhat", alpha=0.05).collect()[0]
    assert row.qhat is None and row.coverage is None
    with pytest.raises(ValueError, match="alpha"):
        split_conformal(df, "y", "yhat", alpha=1.5)


def test_cluster_silhouette_separated_vs_overlapping(spark):
    rng = np.random.RandomState(12)
    far = []
    for c, center in enumerate(([0.0] * 8, [10.0] * 8)):
        for i in range(40):
            far.append((c * 100 + i,
                        [float(x) for x in
                         np.asarray(center) + rng.normal(0, 0.2, 8)]))
    df = spark.createDataFrame(far, ["vec_id", "embedding"])
    _, cents = kmeans(df, k=2, n_iter=3)
    sil = {r.cluster: r for r in
           cluster_silhouette(df, cents).collect()}
    assert all(r.mean_silhouette > 0.9 for r in sil.values())
    assert sum(r.n for r in sil.values()) == 80
    # overlapping blobs -> silhouette collapses toward 0
    near = [(i, [float(x) for x in rng.normal(0, 1, 8)])
            for i in range(80)]
    df2 = spark.createDataFrame(near, ["vec_id", "embedding"])
    _, cents2 = kmeans(df2, k=2, n_iter=3)
    sil2 = cluster_silhouette(df2, cents2).collect()
    assert all(r.mean_silhouette < 0.6 for r in sil2)
    with pytest.raises(ValueError, match="centroids"):
        cluster_silhouette(df, [cents[0]])
