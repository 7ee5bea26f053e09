import numpy as np
import pytest

from whylogs_spark.ops.graph import degree_stats, pagerank


def _ref_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    adj = []
    for u, v in set(edges):
        out[idx[u]] += 1
        adj.append((idx[u], idx[v]))
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[out == 0].sum()
        nxt = np.full(n, (1 - d) / n) + d * dang / n
        for u, v in adj:
            nxt[v] += d * r[u] / out[u]
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy(spark):
    rng = np.random.RandomState(17)
    edges = [(int(rng.randint(0, 30)), int(rng.randint(0, 30)))
             for _ in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    # add a guaranteed dangling node (only in-edges)
    edges.append((0, 999))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iterations=8).collect()}
    ref = _ref_pagerank(edges, iters=8)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0)
    # duplicate edges count once
    df2 = spark.createDataFrame(edges + edges[:10], "src long, dst long")
    got2 = {r.node: r.rank for r in
            pagerank(df2, iterations=8).collect()}
    for k in ref:
        assert got2[k] == pytest.approx(ref[k], abs=1e-12)


def test_pagerank_validation_and_two_node(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    # 1 -> 2, 2 dangling: closed form per iteration is replayed by
    # the numpy reference; sanity: dst outranks src
    got = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    assert got[2] > got[1]
    assert got[1] + got[2] == pytest.approx(1.0)


def test_degree_stats(spark):
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 2), (None, 4), (5, None)],
        "src long, dst long")
    got = {r.node: (r.out_degree, r.in_degree)
           for r in degree_stats(df).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (0, 2)}
