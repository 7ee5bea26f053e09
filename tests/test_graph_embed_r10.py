import math

import numpy as np
import pytest

from whylogs_spark.core.embeddings import (embedding_mmd, pca_fit,
                                           pca_project)
from whylogs_spark.ops.graph import label_propagation


def _ref_lpa(edges, iterations):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    nodes = sorted({u for u, _ in und})
    lab = {u: u for u in nodes}
    for _ in range(iterations):
        new = {}
        for u in nodes:
            neigh = [lab[v] for (s, v) in und if s == u]
            if not neigh:
                new[u] = lab[u]
                continue
            from collections import Counter
            c = Counter(neigh)
            new[u] = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def test_label_propagation_matches_reference(spark):
    # two cliques joined by one bridge edge
    cliqueA = [(f"a{i}", f"a{j}") for i in range(5) for j in range(i)]
    cliqueB = [(f"b{i}", f"b{j}") for i in range(5) for j in range(i)]
    edges = cliqueA + cliqueB + [("a0", "b0"), ("x", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.community for r in
           label_propagation(df, iterations=5).collect()}
    ref = _ref_lpa(edges, 5)
    assert got == ref
    # the two cliques resolve to separate communities
    assert len({got[f"a{i}"] for i in range(1, 5)}) == 1
    assert len({got[f"b{i}"] for i in range(1, 5)}) == 1
    assert got["a1"] != got["b1"]
    # self-loop-only node drops entirely
    assert "x" not in got
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(df, iterations=0)


def test_embedding_mmd_matches_numpy(spark):
    rng = np.random.RandomState(13)
    dim, d_feat = 8, 32
    a = rng.randn(300, dim)
    b = rng.randn(300, dim) + 0.8          # shifted corpus
    c = rng.randn(300, dim)                # same distribution as a
    mk = lambda x: spark.createDataFrame(
        [(row.tolist(),) for row in x], "embedding array<double>")
    out = embedding_mmd(mk(a), mk(b), n_features=d_feat,
                        sigma=2.0, seed=7).collect()[0]

    # numpy replay with the identical constants
    rs = np.random.RandomState(7)
    w = rs.randn(d_feat, dim) / 2.0
    bb = rs.uniform(0, 2 * math.pi, d_feat)
    phi = lambda x: math.sqrt(2.0 / d_feat) * np.cos(x @ w.T + bb)
    ref = float(((phi(a).mean(0) - phi(b).mean(0)) ** 2).sum())
    assert out.n_target == 300 and out.n_reference == 300
    assert out.mmd2 == pytest.approx(ref, rel=1e-9)
    # same-distribution control is much smaller than the shift
    null = embedding_mmd(mk(a), mk(c), n_features=d_feat,
                         sigma=2.0, seed=7).collect()[0]
    assert null.mmd2 < out.mmd2 / 10
    with pytest.raises(ValueError, match="sigma"):
        embedding_mmd(mk(a), mk(b), sigma=0.0)


def test_pca_matches_numpy(spark):
    rng = np.random.RandomState(4)
    # anisotropic cloud: variance concentrated in 2 directions
    basis = rng.randn(6, 6)
    x = rng.randn(400, 6) * np.array([5, 3, 1, 0.5, 0.2, 0.1]) @ basis
    df = spark.createDataFrame([(r.tolist(),) for r in x],
                               "embedding array<double>")
    m = pca_fit(df, k=3)
    mu = x.mean(0)
    cov = np.cov(x, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    assert np.allclose(m["mean"], mu, atol=1e-9)
    for i, idx in enumerate(order):
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        assert np.allclose(m["components"][i], v, atol=1e-7)
        assert m["explained_variance"][i] == pytest.approx(
            vals[idx], rel=1e-9)
    assert sum(m["explained_variance_ratio"]) <= 1.0 + 1e-9
    # projection: scores = (x - mu) @ C.T
    proj = pca_project(df, m).collect()
    ref = (x - mu) @ np.array(m["components"]).T
    got = np.array([r.pca for r in proj])
    assert np.allclose(got, ref, atol=1e-8)
    # null / wrong-dim vectors get null scores
    bad = spark.createDataFrame([([1.0, 2.0],), (None,)],
                                "embedding array<double>")
    rows = pca_project(bad, m).collect()
    assert all(r.pca is None for r in rows)
    with pytest.raises(ValueError, match="exceeds"):
        pca_fit(df, k=7)
