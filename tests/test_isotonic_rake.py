import re
from collections import Counter, defaultdict

import numpy as np
import pytest

from whylogs_spark.core.model_perf import isotonic_calibration
from whylogs_spark.ops.text import RAKE_STOPWORDS, rake_keywords


def _ref_isotonic(pairs):
    """Max-min characterization: fit(i) = max_{j<=i} min_{k>=i}
    mean(y over scores j..k) — independent of the PAVA stack."""
    from collections import OrderedDict
    agg = OrderedDict()
    for s, y in sorted(pairs):
        n, t = agg.get(s, (0, 0.0))
        agg[s] = (n + 1, t + y)
    ss = list(agg)
    n = np.array([agg[s][0] for s in ss], dtype=float)
    t = np.array([agg[s][1] for s in ss], dtype=float)
    cn = np.concatenate([[0], np.cumsum(n)])
    ct = np.concatenate([[0], np.cumsum(t)])
    m = len(ss)
    fit = []
    for i in range(m):
        best = -np.inf
        for j in range(i + 1):
            lo = min((ct[k + 1] - ct[j]) / (cn[k + 1] - cn[j])
                     for k in range(i, m))
            best = max(best, lo)
        fit.append(best)
    return ss, n, t, fit


def test_isotonic_matches_maxmin_reference(spark):
    rng = np.random.RandomState(17)
    pairs = []
    for _ in range(800):
        s = float(rng.randint(0, 25)) / 25.0
        y = float(rng.rand() < 0.15 + 0.7 * s + 0.1 * np.sin(9 * s))
        pairs.append((s, y))
    df = spark.createDataFrame(pairs, "s double, y double")
    got = {r.score: r for r in
           isotonic_calibration(df, "s", "y").collect()}
    ss, n, t, fit = _ref_isotonic(pairs)
    assert set(got) == set(ss)
    prev = -1.0
    for i, s in enumerate(ss):
        r = got[s]
        assert r.n == int(n[i])
        assert r.y_rate == pytest.approx(t[i] / n[i], abs=1e-12)
        assert r.calibrated == pytest.approx(fit[i], abs=1e-12)
        # monotone non-decreasing
        assert r.calibrated >= prev - 1e-12
        prev = r.calibrated
    # weighted means are preserved (PAVA projects, never biases)
    tot_fit = sum(got[s].calibrated * got[s].n for s in ss)
    assert tot_fit == pytest.approx(t.sum(), abs=1e-9)
    with pytest.raises(ValueError, match="n_bins"):
        isotonic_calibration(df, "s", "y", n_bins=1)
    with pytest.raises(ValueError, match="distinct"):
        isotonic_calibration(df, "s", "y", max_distinct=3)
    # n_bins quantization collapses the score space
    b = isotonic_calibration(df, "s", "y", n_bins=5).collect()
    assert len(b) <= 5


def _ref_rake(texts, k, min_len, max_words):
    stop = set(RAKE_STOPWORDS)
    phrases = []
    for t in texts:
        # punctuation delimits phrases; whitespace separates tokens
        segments = re.split(r"[^a-z0-9\s]+", (t or "").lower())
        toks = []
        for seg in segments:
            toks.extend(w for w in seg.split() if w)
            toks.append("__end__")
        run = []
        for w in toks + ["__end__"]:
            if w == "__end__" or w in stop or len(w) < min_len:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
    phrases = [p for p in phrases if len(p) <= max_words]
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    wscore = {w: deg[w] / freq[w] for w in freq}
    occ = Counter(" ".join(p) for p in phrases)
    scored = {ph: sum(wscore[w] for w in ph.split(" "))
              for ph in occ}
    top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {ph: (sc, occ[ph]) for ph, sc in top}


def test_rake_matches_reference(spark):
    texts = [
        "Spark shuffles data between executor nodes during wide "
        "joins, and wide joins can spill to disk.",
        "The query optimizer prunes unused columns before any "
        "shuffle stage runs.",
        "Executor nodes cache hot data partitions; the optimizer "
        "reuses cached partitions for repeated scans.",
        "wide joins, wide joins, wide joins!",
        None,
        "a an of to in it is",   # stopwords only -> no phrases
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r.phrase: (r.score, r.n_occurrences)
           for r in rake_keywords(df, k=10).collect()}
    ref = _ref_rake(texts, 10, 3, 4)
    assert set(got) == set(ref)
    for ph, (sc, occ) in ref.items():
        assert got[ph][0] == pytest.approx(sc, abs=1e-12)
        assert got[ph][1] == occ
    # the hammered phrase is present with its multiplicity
    assert got["wide joins"][1] == 5
    with pytest.raises(ValueError, match="min_len"):
        rake_keywords(df, min_len=1)
