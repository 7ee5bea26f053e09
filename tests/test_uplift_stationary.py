import numpy as np
import pytest

from whylogs_spark.ops.abtest import auuc, uplift_curve
from whylogs_spark.ops.graph import stationary_distribution


def _ref_uplift(rows):
    """Independent numpy reference: per-distinct-score descending
    cumulative qini/uplift."""
    by_score = {}
    for t, y, s in rows:
        e = by_score.setdefault(s, [0, 0, 0.0, 0.0])
        if t:
            e[0] += 1
            e[2] += y
        else:
            e[1] += 1
            e[3] += y
    out = {}
    nt = nc = 0
    yt = yc = 0.0
    for s in sorted(by_score, reverse=True):
        a = by_score[s]
        nt += a[0]
        nc += a[1]
        yt += a[2]
        yc += a[3]
        uplift = (yt / nt - yc / nc) if nt and nc else None
        qini = (yt - yc * nt / nc) if nc else None
        out[s] = (nt, nc, yt, yc, uplift, qini)
    return out


def test_uplift_curve_matches_numpy(spark):
    rng = np.random.RandomState(21)
    rows = []
    for _ in range(400):
        s = float(rng.randint(0, 20)) / 20.0
        t = bool(rng.rand() < 0.5)
        # planted signal: treatment helps more at high scores
        p = 0.2 + (0.4 * s if t else 0.0)
        rows.append((t, float(rng.rand() < p), s))
    df = spark.createDataFrame(rows, "t boolean, y double, s double")
    got = {r.score: r for r in
           uplift_curve(df, "t", "y", "s").collect()}
    ref = _ref_uplift(rows)
    assert set(got) == set(ref)
    for s, (nt, nc, yt, yc, uplift, qini) in ref.items():
        r = got[s]
        assert (r.cum_n_t, r.cum_n_c) == (nt, nc)
        assert r.cum_y_t == pytest.approx(yt)
        assert r.cum_y_c == pytest.approx(yc)
        if uplift is None:
            assert r.uplift is None
        else:
            assert r.uplift == pytest.approx(uplift, abs=1e-12)
        if qini is None:
            assert r.qini is None
        else:
            assert r.qini == pytest.approx(qini, abs=1e-12)
    row = auuc(df, "t", "y", "s").collect()[0]
    n = sum(1 for _ in rows)
    # null-qini depths (no control yet) contribute the n_c->0 limit
    # cum_y_t to the area, mirroring the op's coalesce
    a = sum((ref[s][5] if ref[s][5] is not None else ref[s][2])
            * sum(1 for r in rows if r[2] == s)
            for s in ref) / n
    last = ref[min(ref)][5]
    assert row.n == n
    assert row.auuc == pytest.approx(a, abs=1e-9)
    assert row.qini_total == pytest.approx(last, abs=1e-9)
    assert row.qini_coefficient == pytest.approx(a - last / 2,
                                                 abs=1e-9)
    # a GOOD model beats random targeting on this planted signal
    assert row.qini_coefficient > 0


def test_auuc_credits_treated_only_prefix(spark):
    """A model that ranks treated units first has null qini at the
    top depths; the area term credits cum_y_t there instead of
    treating those depths as zero incremental outcome."""
    rows = [
        (True, 1.0, 0.9), (True, 1.0, 0.8),   # treated-only prefix
        (False, 0.0, 0.5), (True, 0.0, 0.5),
        (False, 1.0, 0.1),
    ]
    df = spark.createDataFrame(rows, "t boolean, y double, s double")
    row = auuc(df, "t", "y", "s").collect()[0]
    # depths: s=.9 (yt=1, qini null) s=.8 (yt=2, null)
    # s=.5: nt=3 nc=1 yt=2 yc=0 -> qini 2; s=.1: nt=3 nc=2 -> 2-1*1.5=.5
    assert row.auuc == pytest.approx(
        (1.0 * 1 + 2.0 * 1 + 2.0 * 2 + 0.5 * 1) / 5.0, abs=1e-12)
    assert row.qini_total == pytest.approx(0.5, abs=1e-12)


def _ref_stationary(edges, iters):
    states = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    P = np.zeros((n, n))
    for u, v, w in edges:
        P[idx[u], idx[v]] += w
    rs = P.sum(axis=1)
    out_mask = rs > 0
    P[out_mask] /= rs[out_mask, None]
    pi = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = pi[~out_mask].sum()
        pi = pi @ np.where(out_mask[:, None], P, 0.0) + dang / n
    return {states[i]: pi[i] for i in range(n)}


def test_stationary_distribution_matches_numpy(spark):
    edges = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "a", 1.0),
             ("b", "c", 1.0), ("c", "a", 3.0),
             # d is dangling (destination only)
             ("c", "d", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, p double")
    got = {r.state: r.probability for r in stationary_distribution(
        df, weight="p", iterations=25).collect()}
    ref = _ref_stationary(edges, 25)
    assert set(got) == set(ref)
    for s in ref:
        assert got[s] == pytest.approx(ref[s], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0)
    # count-matrix input renormalizes identically to probabilities
    df2 = spark.createDataFrame(
        [(u, v, w * 7) for u, v, w in edges],
        "src string, dst string, p double")
    got2 = {r.state: r.probability for r in stationary_distribution(
        df2, weight="p", iterations=25).collect()}
    for s in ref:
        assert got2[s] == pytest.approx(ref[s], abs=1e-12)
    with pytest.raises(ValueError, match="iterations"):
        stationary_distribution(df, weight="p", iterations=0)


def test_textrank_keywords_matches_numpy(spark):
    """Damped weighted PageRank over the word co-occurrence graph,
    window 2, vs an independent numpy power iteration."""
    import re

    from whylogs_spark.ops.text import textrank_keywords

    docs = [
        "spark shuffles data between executors during wide joins",
        "wide joins shuffle data and spill when executors are small",
        "the optimizer prunes columns before the shuffle stage",
        "executors cache data partitions for repeated scans",
        None,
        "aa bb",   # tokens under min_len drop entirely
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = textrank_keywords(df, window=2, iterations=12, k=10).collect()

    # numpy reference
    tok_docs = [
        [t for t in re.split(r"[^a-z0-9]+", (d or "").lower())
         if len(t) >= 3] for d in docs]
    from collections import Counter
    edges = Counter()
    for toks in tok_docs:
        for o in (1, 2):
            for i in range(len(toks) - o):
                edges[(toks[i], toks[i + o])] += 1
                edges[(toks[i + o], toks[i])] += 1
    words = sorted({w for e in edges for w in e})
    idx = {w: i for i, w in enumerate(words)}
    n = len(words)
    W = np.zeros((n, n))
    for (u, v), c in edges.items():
        W[idx[u], idx[v]] += c
    rs = W.sum(axis=1)
    P = W / rs[:, None]   # every word has out-edges here
    pi = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(12):
        pi = (1 - d) / n + d * (pi @ P)
    # rank desc, word ASC on ties — matching the op's deterministic
    # (probability desc, state) cutoff order
    ref = sorted(((-pi[idx[w]], w) for w in words))

    got = [(r.word, r.rank) for r in out]
    for (rw, rr), (negrv, w) in zip(got, ref[:10]):
        assert rw == w
        assert rr == pytest.approx(-negrv, abs=1e-12)
    nd = {r.word: r.n_docs for r in out}
    assert nd["data"] == 3 and nd["shuffle"] == 2
    with pytest.raises(ValueError, match="window"):
        textrank_keywords(df, window=0)
