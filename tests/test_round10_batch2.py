"""Round-10 second-batch operators vs independent numpy references:
CUSUM changepoint, WOE/IV, calibration curve + Brier decomposition,
gains table, mutual information, Gini concentration, diversity report,
Zipf fit, time-weighted average, golden record."""

import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F


def _score_label(o):
    s = (F.col("o_orderkey") % 97).cast("double") / 97.0
    y = ((F.col("o_orderkey") * 31 + F.col("o_custkey")) % 100
         < 20 + 60 * s).cast("double")
    return o.select(s.alias("s"), y.alias("y"))


def test_cusum_changepoint_matches_numpy(events):
    from whylogs_spark.ops.trend import cusum_changepoint

    d = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    got = {r.event_type: r for r in
           cusum_changepoint(d, "day", "v", ["event_type"]).collect()}

    pdf = d.toPandas()
    for et, grp in pdf.groupby("event_type"):
        v = grp.sort_values("day")["v"].to_numpy(float)
        n = len(v)
        mu, sig = v.mean(), v.std()
        S = np.cumsum(v - mu)
        absS = np.abs(S[:-1])
        k = int(np.argmax(absS)) + 1
        r = got[et]
        assert r.n == n and r.cp_index == k
        assert abs(r.cusum_abs - absS.max()) < 1e-9
        lam = absS.max() / (sig * np.sqrt(n))
        assert abs(r.cusum_stat - lam) < 1e-12
        p = 2 * sum((-1) ** (j + 1) * np.exp(-2 * j * j * lam * lam)
                    for j in range(1, 6))
        assert abs(r.p_value - min(1.0, max(0.0, p))) < 1e-12
        assert abs(r.mean_before - v[:k].mean()) < 1e-9
        assert abs(r.mean_after - v[k:].mean()) < 1e-9


def test_cusum_constant_series_null_stat(spark):
    from whylogs_spark.ops.trend import cusum_changepoint

    d = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], "t double, v double")
    r = cusum_changepoint(d, "t", "v").collect()[0]
    assert r.std == 0.0
    assert r.cusum_stat is None and r.p_value is None


def test_cusum_single_point_group_emits_null_row(spark):
    # round-11 ADVICE fix: a group whose collapsed series has length
    # 1 must still appear (one row per group), with null cp fields
    from whylogs_spark.ops.trend import cusum_changepoint

    d = spark.createDataFrame(
        [("a", 0.0, 1.0), ("a", 1.0, 2.0), ("a", 2.0, 9.0),
         ("b", 5.0, 4.0)], "g string, t double, v double")
    out = {r.g: r for r in
           cusum_changepoint(d, "t", "v", ["g"]).collect()}
    assert set(out) == {"a", "b"}
    b = out["b"]
    assert b.n == 1 and b.mean == 4.0
    assert b.cp_index is None and b.cp_time is None
    assert b.cusum_abs is None and b.cusum_stat is None
    assert b.p_value is None and b.shift is None
    assert out["a"].cp_index is not None


def test_mann_kendall_max_points_guard(spark):
    from whylogs_spark.ops.trend import mann_kendall

    d = spark.createDataFrame(
        [("a", float(i), float(i % 7)) for i in range(50)],
        "g string, t double, v double")
    with pytest.raises(ValueError, match="max_points"):
        mann_kendall(d, "t", "v", ["g"], max_points=10)
    # explicit raise or None disables the guard
    assert mann_kendall(d, "t", "v", ["g"],
                        max_points=None).count() == 1


def test_woe_iv_matches_numpy(orders):
    from whylogs_spark.ops.encode import woe_iv

    d = orders.select(
        F.col("o_totalprice").alias("x"),
        (F.col("o_orderstatus") == "F").cast("double").alias("y"))
    got = {r.bin: r for r in woe_iv(d, "x", "y", bins=8).collect()}

    pdf = d.toPandas()
    xv, yv = pdf.x.to_numpy(float), pdf.y.to_numpy(float)
    cuts = np.quantile(xv, [i / 8 for i in range(1, 8)], method="linear")
    b = np.array([(xi > cuts).sum() for xi in xv])
    tp, tn = yv.sum(), (1 - yv).sum()
    for bi in sorted(set(b)):
        m = b == bi
        r = got[bi]
        assert r.n == int(m.sum())
        npos, nneg = yv[m].sum(), (1 - yv[m]).sum()
        assert r.n_pos == int(npos)
        if npos > 0 and nneg > 0:
            woe = np.log((npos / tp) / (nneg / tn))
            assert abs(r.woe - woe) < 1e-9
            assert abs(r.iv_contrib - (npos / tp - nneg / tn) * woe) < 1e-12
        else:
            assert r.woe is None and r.iv_contrib == 0.0


def test_woe_iv_rejects_single_bin(orders):
    from whylogs_spark.ops.encode import woe_iv

    with pytest.raises(ValueError):
        woe_iv(orders, "o_totalprice", "o_custkey", bins=1)


def test_calibration_and_brier_match_numpy(orders):
    from whylogs_spark.core.model_perf import (brier_decomposition,
                                               calibration_curve)

    d = _score_label(orders)
    pdf = d.toPandas()
    sv, yv = pdf.s.to_numpy(), pdf.y.to_numpy()
    b = np.clip(np.floor(sv * 10), 0, 9).astype(int)
    n_total, ybar = len(sv), yv.mean()

    for r in calibration_curve(d, "s", "y", 10).collect():
        m = b == r.bin
        assert r.n == int(m.sum())
        assert abs(r.conf - sv[m].mean()) < 1e-12
        assert abs(r.acc - yv[m].mean()) < 1e-12
        assert abs(r.gap - (yv[m].mean() - sv[m].mean())) < 1e-12

    r = brier_decomposition(d, "s", "y", 10).collect()[0]
    assert r.n == n_total
    assert abs(r.brier - ((sv - yv) ** 2).mean()) < 1e-12
    rel = sum(m.sum() * (sv[m].mean() - yv[m].mean()) ** 2
              for m in (b == i for i in set(b))) / n_total
    res = sum(m.sum() * (yv[m].mean() - ybar) ** 2
              for m in (b == i for i in set(b))) / n_total
    assert abs(r.reliability - rel) < 1e-12
    assert abs(r.resolution - res) < 1e-12
    assert abs(r.uncertainty - ybar * (1 - ybar)) < 1e-12


def test_gains_table_matches_numpy(orders):
    from whylogs_spark.core.model_perf import gains_table

    d = _score_label(orders)
    got = {r.bucket: r for r in gains_table(d, "s", "y", 5).collect()}
    pdf = d.toPandas()
    sv, yv = pdf.s.to_numpy(), pdf.y.to_numpy()
    cuts = np.quantile(sv, [i / 5 for i in range(1, 5)], method="linear")
    b = 4 - np.array([(x > cuts).sum() for x in sv])
    n_total, p_total = len(sv), yv.sum()
    cn = cp = 0
    for bi in sorted(set(b)):
        m = b == bi
        cn += m.sum()
        cp += yv[m].sum()
        r = got[bi]
        assert r.n == int(m.sum()) and r.n_pos == int(yv[m].sum())
        assert abs(r.capture_rate - cp / p_total) < 1e-12
        assert abs(r.cum_lift - (cp / p_total) / (cn / n_total)) < 1e-12
    # monotone capture, lift ends at 1
    assert got[max(got)].capture_rate == pytest.approx(1.0)
    assert got[max(got)].cum_lift == pytest.approx(1.0)


def test_mutual_information_matches_numpy(orders):
    from whylogs_spark.ops.stats import mutual_information

    r = mutual_information(
        orders, "o_orderstatus", "o_orderpriority").collect()[0]
    pdf = orders.select("o_orderstatus", "o_orderpriority") \
        .toPandas().dropna()

    def H(s):
        p = s.value_counts(normalize=True).to_numpy()
        return -(p * np.log(p)).sum()

    ha, hb = H(pdf.o_orderstatus), H(pdf.o_orderpriority)
    hab = H(pdf.o_orderstatus + "\x00" + pdf.o_orderpriority)
    assert r.n == len(pdf)
    assert abs(r.h_a - ha) < 1e-9 and abs(r.h_b - hb) < 1e-9
    assert abs(r.mi - (ha + hb - hab)) < 1e-9
    assert abs(r.nmi - (ha + hb - hab) / ((ha + hb) / 2)) < 1e-9


def test_mutual_information_independent_vs_identical(spark):
    from whylogs_spark.ops.stats import mutual_information

    rows = [(i % 4, (i // 4) % 4, i % 4) for i in range(160)]
    d = spark.createDataFrame(rows, "a int, b int, c int")
    ind = mutual_information(d, "a", "b").collect()[0]
    assert abs(ind.mi) < 1e-9 and abs(ind.nmi) < 1e-9
    same = mutual_information(d, "a", "c").collect()[0]
    assert same.nmi == pytest.approx(1.0)


def test_gini_concentration_matches_numpy(lineitem):
    from whylogs_spark.ops.stats import gini_concentration

    got = {r.l_returnflag: r for r in gini_concentration(
        lineitem, "l_partkey", "l_extendedprice",
        ["l_returnflag"]).collect()}
    pdf = lineitem.select(
        "l_returnflag", "l_partkey", "l_extendedprice").toPandas()
    for fl, grp in pdf.groupby("l_returnflag"):
        x = grp.groupby("l_partkey").l_extendedprice.sum().to_numpy()
        x.sort()
        n, total = len(x), x.sum()
        r = got[fl]
        assert r.n_entities == n
        gini = 2 * np.sum(np.arange(1, n + 1) * x) / (n * total) \
            - (n + 1) / n
        assert abs(r.gini - gini) < 1e-9
        assert abs(r.hhi - np.sum((x / total) ** 2)) < 1e-12
        assert abs(r.top1_share - x[-1] / total) < 1e-12
        k = int(np.ceil(n / 10))
        assert abs(r.top10pct_share - x[-k:].sum() / total) < 1e-12


def test_gini_uniform_vs_concentrated(spark):
    from whylogs_spark.ops.stats import gini_concentration

    uni = spark.createDataFrame(
        [(i, 1.0) for i in range(100)], "e int, v double")
    g_uni = gini_concentration(uni, "e", "v").collect()[0]
    assert abs(g_uni.gini) < 1e-9  # perfectly equal
    conc = spark.createDataFrame(
        [(i, 0.0 if i else 100.0) for i in range(100)],
        "e int, v double")
    g_conc = gini_concentration(conc, "e", "v").collect()[0]
    assert g_conc.gini == pytest.approx(0.99)  # (n-1)/n
    assert g_conc.top1_share == pytest.approx(1.0)


def test_diversity_report_matches_numpy(documents):
    from whylogs_spark.ops.stats import diversity_report

    got = {r.column: r for r in
           diversity_report(documents, ["lang", "source"]).collect()}
    pdf = documents.select("lang", "source").toPandas()
    for c in ["lang", "source"]:
        s = pdf[c]
        p = s.value_counts(normalize=True).to_numpy()
        H = -(p * np.log(p)).sum()
        r = got[c]
        assert r.n == len(s) and r.n_null == int(s.isna().sum())
        assert r.categories == s.nunique()
        assert abs(r.entropy - H) < 1e-9
        assert abs(r.norm_entropy - H / np.log(s.nunique())) < 1e-9
        assert abs(r.simpson - (p * p).sum()) < 1e-12
        assert abs(r.effective_categories - np.exp(H)) < 1e-9
        assert abs(r.top_share - p.max()) < 1e-12


def test_diversity_nulls_and_constant(spark):
    from whylogs_spark.ops.stats import diversity_report

    d = spark.createDataFrame(
        [("a",), ("a",), (None,), ("a",)], "c string")
    r = diversity_report(d, ["c"]).collect()[0]
    assert r.n == 4 and r.n_null == 1 and r.categories == 1
    assert r.entropy == 0.0 and r.norm_entropy is None
    assert r.simpson == 1.0 and r.top_share == 1.0


def test_zipf_fit_matches_numpy(documents):
    from whylogs_spark.ops.text import zipf_fit

    r = zipf_fit(documents, "text", top_v=500).collect()[0]
    cnt = Counter()
    for t in documents.select("text").toPandas().text.dropna():
        cnt.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    lr = np.log(np.arange(1, len(items) + 1))
    lf = np.log([c for _, c in items])
    slope, inter = np.polyfit(lr, lf, 1)
    assert r.n_types == len(cnt)
    assert r.n_tokens == sum(cnt.values())
    assert r.v_fit == len(items)
    assert abs(r.slope - slope) < 1e-9
    assert abs(r.intercept - inter) < 1e-9
    assert abs(r.r2 - np.corrcoef(lr, lf)[0, 1] ** 2) < 1e-9


def test_zipf_two_phase_cap_equals_global(documents, spark):
    """The per-partition pre-cap must not change the fitted head."""
    from whylogs_spark.ops.text import zipf_fit

    many = documents.repartition(7)
    one = documents.coalesce(1)
    a = zipf_fit(many, "text", top_v=20).collect()[0]
    b = zipf_fit(one, "text", top_v=20).collect()[0]
    assert a.v_fit == b.v_fit
    assert a.slope == pytest.approx(b.slope, abs=1e-12)


def test_time_weighted_average_matches_numpy(events):
    from whylogs_spark.ops.events import time_weighted_average

    got = {r.event_type: r for r in time_weighted_average(
        events, "ts", "value", ["event_type"]).collect()}
    pdf = events.select("event_type", "ts", "value").toPandas().dropna()
    for et, g in pdf.groupby("event_type"):
        g = g.copy()
        g["t"] = g.ts.astype("int64") / 1e9
        col = g.groupby("t").value.mean().sort_index()
        t, v = col.index.to_numpy(), col.to_numpy()
        r = got[et]
        assert r.n == len(v)
        twa = (v[:-1] * np.diff(t)).sum() / (t[-1] - t[0])
        assert abs(r.twa - twa) < 1e-9
        assert abs(r.simple_mean - v.mean()) < 1e-9


def test_twa_irregular_sampling_bias(spark):
    """Burst sampling biases the simple mean; TWA is immune."""
    from whylogs_spark.ops.events import time_weighted_average

    # value 10 for [0, 100), sampled once; value 0 for [100, 200),
    # sampled 99 times
    rows = [(0.0, 10.0)] + [(100.0 + i, 0.0) for i in range(100)]
    d = spark.createDataFrame(rows, "t double, v double")
    r = time_weighted_average(d, "t", "v").collect()[0]
    assert r.twa == pytest.approx(10 * 100 / 199.0)
    assert r.simple_mean == pytest.approx(10.0 / 101.0)


def test_golden_record_survivorship(spark):
    from whylogs_spark.ops.linkage import golden_record

    rows = [
        (1, 1.0, "a@x.com", None),     # oldest: email only
        (1, 2.0, None, "Alice"),       # newer: name only, null email
        (1, 3.0, None, None),          # newest: all null
        (2, 1.0, "b@x.com", "Bob"),
        (2, 1.0, "c@x.com", "Bob"),    # same ts: value tie-break (max)
    ]
    d = spark.createDataFrame(rows, "k int, ts double, email string, name string")
    got = {r.k: r for r in
           golden_record(d, ["k"], "ts", ["email", "name"]).collect()}
    # latest NON-NULL per field: newer null must not erase older value
    assert got[1].email == "a@x.com" and got[1].name == "Alice"
    assert got[1].n_records == 3 and got[1].last_ts == 3.0
    assert got[2].email == "c@x.com"  # deterministic tie-break


def test_golden_record_events(events):
    from whylogs_spark.ops.linkage import golden_record

    out = golden_record(events, ["user_id"], "ts",
                        ["event_type", "value"])
    pdf = events.toPandas()
    pdf = pdf[pdf.ts.notna()]
    got = {r.user_id: r for r in out.limit(1000).collect()}
    for uid, g in list(pdf.groupby("user_id"))[:20]:
        gg = g[g.event_type.notna()].sort_values(["ts", "event_type"])
        assert got[uid].event_type == gg.event_type.iloc[-1]
        assert got[uid].n_records == len(g)
