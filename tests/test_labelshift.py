"""label_shift_bbse: numpy cross-implementation parity and planted
prior-shift recovery through a noisy synthetic classifier."""

import numpy as np
import pytest

from whylogs_spark.ops.labelshift import label_shift_bbse


def _make_frames(spark, rng, p_src, p_tgt, conf, n_src, n_tgt):
    """Draw labels from the priors and predictions from the fixed
    per-class confusion rows ``conf[y][i] = P(y_hat=i | y)`` — the
    label-shift assumption (p(x|y), hence conf, fixed)."""
    k = len(p_src)

    def draw(priors, n):
        y = rng.choice(k, size=n, p=priors)
        p = np.array([rng.choice(k, p=conf[yi]) for yi in y])
        return y, p

    ys, ps = draw(p_src, n_src)
    yt, pt = draw(p_tgt, n_tgt)
    src = spark.createDataFrame(
        [(f"c{a}", f"c{b}") for a, b in zip(ys, ps)],
        "y string, pred string")
    tgt = spark.createDataFrame(
        [(f"c{b}",) for b in pt], "pred string")
    return src, tgt, (ys, ps, pt)


def test_bbse_matches_numpy_twin(spark):
    rng = np.random.RandomState(17)
    conf = np.array([[0.8, 0.15, 0.05],
                     [0.1, 0.8, 0.1],
                     [0.05, 0.15, 0.8]])
    src, tgt, (ys, ps, pt) = _make_frames(
        spark, rng, [0.5, 0.3, 0.2], [0.2, 0.3, 0.5], conf,
        4000, 4000)
    out = {r["label"]: r for r in label_shift_bbse(
        src, tgt, "y", "pred").collect()}

    # independent numpy replay from the same draws
    k = 3
    C = np.zeros((k, k))
    for a, b in zip(ys, ps):
        C[b, a] += 1
    C /= len(ys)
    mu = np.bincount(pt, minlength=k) / len(pt)
    w = np.clip(np.linalg.solve(C, mu), 0, None)
    p_src = C.sum(axis=0)
    p_t = w * p_src
    p_t = p_t / p_t.sum()
    for i in range(k):
        r = out[f"c{i}"]
        assert r["weight"] == pytest.approx(w[i], abs=1e-9)
        assert r["p_source"] == pytest.approx(p_src[i], abs=1e-12)
        assert r["p_target_est"] == pytest.approx(p_t[i], abs=1e-9)
        assert r["n_source"] == 4000 and r["n_target"] == 4000


def test_bbse_recovers_planted_shift(spark):
    rng = np.random.RandomState(23)
    conf = np.array([[0.85, 0.1, 0.05],
                     [0.08, 0.84, 0.08],
                     [0.05, 0.1, 0.85]])
    true_tgt = [0.6, 0.1, 0.3]
    src, tgt, _ = _make_frames(
        spark, rng, [1 / 3, 1 / 3, 1 / 3], true_tgt, conf,
        20000, 20000)
    out = {r["label"]: r for r in label_shift_bbse(
        src, tgt, "y", "pred").collect()}
    for i, want in enumerate(true_tgt):
        assert out[f"c{i}"]["p_target_est"] == pytest.approx(
            want, abs=0.04), i
    # weights move the right way: class 0 up, class 1 down
    assert out["c0"]["weight"] > 1.3
    assert out["c1"]["weight"] < 0.7


def test_bbse_validation(spark):
    src = spark.createDataFrame(
        [("a", "a")], "y string, pred string")
    tgt = spark.createDataFrame([("a",)], "pred string")
    with pytest.raises(ValueError, match="max_classes"):
        label_shift_bbse(src, tgt, "y", "pred", max_classes=0)
    empty = spark.createDataFrame([], "y string, pred string")
    with pytest.raises(ValueError, match="no labeled rows"):
        label_shift_bbse(empty, tgt, "y", "pred")
