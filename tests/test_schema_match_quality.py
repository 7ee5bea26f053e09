import math

import numpy as np
import pytest

from whylogs_spark.ops.cluster import clustering_agreement
from whylogs_spark.ops.schema_match import column_matches
from whylogs_spark.ops.survival import km_survival, nelson_aalen


def _ref_indices(cl, lb):
    """Independent numpy reference: purity, NMI (arithmetic mean),
    ARI from the contingency table."""
    cs = sorted(set(cl))
    ls = sorted(set(lb))
    m = np.zeros((len(cs), len(ls)))
    for c, y in zip(cl, lb):
        m[cs.index(c), ls.index(y)] += 1
    n = m.sum()
    a = m.sum(axis=1)
    b = m.sum(axis=0)
    purity = m.max(axis=1).sum() / n
    mi = sum((m[i, j] / n) * math.log(n * m[i, j] / (a[i] * b[j]))
             for i in range(len(cs)) for j in range(len(ls))
             if m[i, j] > 0)
    ha = -sum((x / n) * math.log(x / n) for x in a if x > 0)
    hb = -sum((x / n) * math.log(x / n) for x in b if x > 0)
    nmi = 2 * mi / (ha + hb) if ha + hb > 0 else None
    sij = (m * (m - 1) / 2).sum()
    sa = (a * (a - 1) / 2).sum()
    sb = (b * (b - 1) / 2).sum()
    npairs = n * (n - 1) / 2
    exp = sa * sb / npairs
    den = (sa + sb) / 2 - exp
    ari = (sij - exp) / den if abs(den) > 0 else None
    return purity, nmi, ari


def test_clustering_agreement_matches_numpy(spark):
    rng = np.random.RandomState(31)
    cl = [int(x) for x in rng.randint(0, 4, 300)]
    # labels agree with clusters 70% of the time
    lb = [c if rng.rand() < 0.7 else int(rng.randint(0, 3))
          for c in cl]
    df = spark.createDataFrame(list(zip(cl, lb)),
                               "cluster int, label int")
    row = clustering_agreement(df, "label").collect()[0]
    purity, nmi, ari = _ref_indices(cl, lb)
    assert row.n == 300
    assert row.purity == pytest.approx(purity, abs=1e-12)
    assert row.nmi == pytest.approx(nmi, abs=1e-12)
    assert row.ari == pytest.approx(ari, abs=1e-12)
    # perfect agreement
    df2 = spark.createDataFrame([(c, c) for c in cl],
                                "cluster int, label int")
    r2 = clustering_agreement(df2, "label").collect()[0]
    assert r2.purity == 1.0 and r2.nmi == pytest.approx(1.0)
    assert r2.ari == pytest.approx(1.0)
    # single block both sides -> nmi/ari undefined
    df3 = spark.createDataFrame([(1, 1)] * 5, "cluster int, label int")
    r3 = clustering_agreement(df3, "label").collect()[0]
    assert r3.nmi is None and r3.ari is None and r3.purity == 1.0


def test_column_matches_finds_shared_columns(spark):
    a = spark.createDataFrame(
        [(i, f"city{i % 7}", float(i)) for i in range(50)],
        "user_id long, city string, amount double")
    b = spark.createDataFrame(
        [(i + 25, f"city{(i + 3) % 7}", f"x{i}") for i in range(50)],
        "uid long, town string, misc string")
    out = {(r.col_a, r.col_b): r for r in
           column_matches(a, b, sample_distinct=100).collect()}
    # same-class pairs only
    assert ("amount", "uid") not in out
    assert ("user_id", "uid") in out and ("city", "town") in out
    # city/town share all 7 values -> jaccard 1 despite name distance
    ct = out[("city", "town")]
    assert ct.value_jaccard == pytest.approx(1.0)
    assert ct.n_a == 7 and ct.n_b == 7 and ct.n_common == 7
    # user_id/uid overlap 25 of 75 distinct ids
    ui = out[("user_id", "uid")]
    assert ui.n_common == 25
    assert ui.value_jaccard == pytest.approx(25 / 75)
    # string vs string with zero overlap
    cm = out[("city", "misc")]
    assert cm.value_jaccard == pytest.approx(0.0)
    # fractional columns: name/type only, jaccard null
    am = out[("amount", "amount")] if ("amount", "amount") in out \
        else None
    assert am is None  # b has no fractional column
    with pytest.raises(ValueError, match="sample_distinct"):
        column_matches(a, b, sample_distinct=0)


def test_column_matches_cap_is_deterministic(spark):
    a = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    r1 = column_matches(a, b, sample_distinct=50).collect()[0]
    r2 = column_matches(a, b, sample_distinct=50).collect()[0]
    # identical tables, md5-capped to the same 50 values each side
    assert r1.n_a == 50 and r1.n_common == 50
    assert r1.value_jaccard == 1.0
    assert (r1.n_a, r1.n_common) == (r2.n_a, r2.n_common)


def test_nelson_aalen_matches_reference(spark):
    rows = [(2.0, 1), (3.0, 0), (3.0, 1), (5.0, 1), (5.0, 1),
            (7.0, 0), (9.0, 1)]
    df = spark.createDataFrame(rows, "t double, e int")
    out = {r.t: r for r in nelson_aalen(df, "t", "e").collect()}
    # hand-walked: n_risk at 2,3,5,7,9 = 7,6,4,2,1
    n_risk = {2.0: 7, 3.0: 6, 5.0: 4, 7.0: 2, 9.0: 1}
    d = {2.0: 1, 3.0: 1, 5.0: 2, 7.0: 0, 9.0: 1}
    h = 0.0
    v = 0.0
    for t in sorted(n_risk):
        h += d[t] / n_risk[t]
        v += d[t] / n_risk[t] ** 2
        assert out[t].n_risk == n_risk[t]
        assert out[t].cum_hazard == pytest.approx(h, abs=1e-12)
        assert out[t].se == pytest.approx(math.sqrt(v), abs=1e-12)
    # consistency: exp(-H) tracks the KM curve loosely from above
    km = {r.t: r.survival for r in km_survival(df, "t", "e").collect()}
    for t in n_risk:
        assert math.exp(-out[t].cum_hazard) >= km[t] - 1e-12
