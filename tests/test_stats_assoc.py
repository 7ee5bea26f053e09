"""Tests for cross-column association (ops.stats), segment distinct
overlap (ops.overlap), boilerplate-line removal (ops.dedup), and
seasonal decomposition (ops.events.seasonal_decompose)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.stats import (
    association_report,
    correlation_matrix,
    cramers_v,
    target_leakage_report,
)
from whylogs_spark.ops.overlap import (
    distinct_sample,
    segment_distinct_overlap,
)
from whylogs_spark.ops.dedup import (
    line_document_frequency,
    remove_boilerplate,
)
from whylogs_spark.ops.events import seasonal_decompose


# ------------------------------------------------- correlation matrix

def test_correlation_matrix_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.normal(size=200)
    y = 2.0 * x + rng.normal(scale=0.5, size=200)
    z = rng.normal(size=200)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r.col_x, r.col_y): r
           for r in correlation_matrix(df, ["x", "y", "z"]).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    for (a, b), r in out.items():
        v = {"x": x, "y": y, "z": z}
        expect = float(np.corrcoef(v[a], v[b])[0, 1])
        assert r.n == 200
        assert abs(r.corr - expect) < 1e-9


def test_correlation_matrix_nan_null_pairwise(spark):
    # NaN and NULL are both "missing"; n counts pairwise-complete rows
    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0),
            (float("nan"), 1.0), (None, 5.0), (9.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = correlation_matrix(df, ["x", "y"]).collect()[0]
    assert r.n == 4
    assert abs(r.corr - 1.0) < 1e-12


def test_correlation_matrix_constant_column_null(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)],
                               "x double, c double")
    r = correlation_matrix(df, ["x", "c"]).collect()[0]
    assert r.corr is None or math.isnan(r.corr)


def test_correlation_matrix_validation(spark):
    df = spark.createDataFrame([(1.0, "a")], "x double, s string")
    with pytest.raises(ValueError, match="at least 2"):
        correlation_matrix(df, ["x"])
    with pytest.raises(ValueError, match="duplicate"):
        correlation_matrix(df, ["x", "x"])
    with pytest.raises(ValueError, match="not numeric"):
        correlation_matrix(df, ["x", "s"])
    with pytest.raises(ValueError, match="not found"):
        correlation_matrix(df, ["x", "missing"])
    wide = spark.createDataFrame(
        [tuple(float(i) for i in range(5))],
        ", ".join(f"c{i} double" for i in range(5)))
    with pytest.raises(ValueError, match="max_pairs"):
        correlation_matrix(wide, [f"c{i}" for i in range(5)],
                           max_pairs=3)


# ------------------------------------------------- Cramér's V

def _chi2_v(table):
    """Independent chi2 / Cramér's V from a dict {(a,b): count}."""
    rs, cs = sorted({k[0] for k in table}), sorted({k[1] for k in table})
    n = sum(table.values())
    chi2 = 0.0
    for a in rs:
        ra = sum(v for k, v in table.items() if k[0] == a)
        for b in cs:
            cb = sum(v for k, v in table.items() if k[1] == b)
            e = ra * cb / n
            o = table.get((a, b), 0)
            chi2 += (o - e) ** 2 / e
    v = math.sqrt(chi2 / (n * (min(len(rs), len(cs)) - 1)))
    return chi2, v


def test_cramers_v_matches_hand_chi2(spark):
    table = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 5,
             ("b", "y"): 45, ("c", "x"): 20, ("c", "y"): 20}
    rows = [(a, b) for (a, b), c in table.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    chi2, v = _chi2_v(table)
    assert r.n == 130
    assert (r.r_categories, r.c_categories) == (3, 2)
    assert abs(r.chi2 - chi2) < 1e-9
    assert abs(r.cramers_v - v) < 1e-12


def test_cramers_v_perfect_and_constant(spark):
    # perfect 1:1 association -> V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10 + [("c", "z")] * 10
    df = spark.createDataFrame(rows, "u string, w string")
    assert abs(cramers_v(df, "u", "w").collect()[0].cramers_v
               - 1.0) < 1e-12
    # constant side -> dof 0 -> null V (chi2 still 0)
    const = spark.createDataFrame([("a", "x"), ("b", "x")],
                                  "u string, w string")
    r = cramers_v(const, "u", "w").collect()[0]
    assert r.cramers_v is None
    assert abs(r.chi2) < 1e-9


def test_association_report_pairwise_nulls_and_pairs(spark):
    rows = [("a", "x", "p"), ("a", None, "q"), ("b", "y", None),
            ("b", "y", "p")]
    df = spark.createDataFrame(rows, "u string, w string, t string")
    out = {(r.col_a, r.col_b): r
           for r in association_report(df, ["u", "w", "t"]).collect()}
    assert set(out) == {("u", "w"), ("u", "t"), ("w", "t")}
    assert out[("u", "w")].n == 3  # null w row dropped for this pair
    assert out[("u", "t")].n == 3
    assert out[("w", "t")].n == 2


def test_association_max_categories_sentinel(spark):
    rows = [(str(i), str(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "u string, w string")
    r = association_report(df, ["u", "w"], max_categories=10).collect()[0]
    assert r.r_categories == 40
    assert r.cramers_v is None  # guarded, not a meaningless number


def _mi_h(table):
    """Independent MI / marginal entropies from {(a,b): count}."""
    n = sum(table.values())
    ra = {}
    cb = {}
    for (a, b), c in table.items():
        ra[a] = ra.get(a, 0) + c
        cb[b] = cb.get(b, 0) + c
    mi = sum(c / n * math.log(c * n / (ra[a] * cb[b]))
             for (a, b), c in table.items())
    h_a = -sum(v / n * math.log(v / n) for v in ra.values())
    h_b = -sum(v / n * math.log(v / n) for v in cb.values())
    return mi, h_a, h_b


def test_mutual_information_matches_hand_calc(spark):
    table = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 5,
             ("b", "y"): 45, ("c", "x"): 20, ("c", "y"): 20}
    rows = [(a, b) for (a, b), c in table.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    mi, h_a, h_b = _mi_h(table)
    assert abs(r.mi - mi) < 1e-12
    assert abs(r.h_a - h_a) < 1e-12
    assert abs(r.h_b - h_b) < 1e-12
    assert abs(r.nmi - mi / min(h_a, h_b)) < 1e-12


def test_mutual_information_extremes(spark):
    # perfect 1:1 mapping: MI == H(A) == H(B), NMI == 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 20
    df = spark.createDataFrame(rows, "u string, w string")
    r = cramers_v(df, "u", "w").collect()[0]
    assert abs(r.mi - r.h_a) < 1e-12
    assert abs(r.nmi - 1.0) < 1e-12
    # independence: MI ~ 0 (clamped at exactly >= 0)
    rows = [(a, b) for a in "ab" for b in "xy" for _ in range(25)]
    ind = cramers_v(spark.createDataFrame(rows, "u string, w string"),
                    "u", "w").collect()[0]
    assert 0.0 <= ind.mi < 1e-12
    # constant side: H = 0 -> NMI null
    const = spark.createDataFrame([("a", "x"), ("b", "x")],
                                  "u string, w string")
    assert cramers_v(const, "u", "w").collect()[0].nmi is None


def test_correlation_matrix_segmented(spark):
    rng = np.random.RandomState(5)
    rows = []
    series = {}
    for seg in ("s1", "s2"):
        x = rng.normal(size=80)
        y = (2 if seg == "s1" else -3) * x + rng.normal(
            scale=0.1, size=80)
        series[seg] = (x, y)
        rows += [(seg, float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "seg string, x double, y double")
    out = {r.seg: r for r in correlation_matrix(
        df, ["x", "y"], segment_cols=["seg"]).collect()}
    for seg, (x, y) in series.items():
        expect = float(np.corrcoef(x, y)[0, 1])
        assert out[seg].n == 80
        assert abs(out[seg].corr - expect) < 1e-9
    assert out["s1"].corr > 0.99 and out["s2"].corr < -0.99
    with pytest.raises(ValueError, match="overlap"):
        correlation_matrix(df, ["x", "y"], segment_cols=["x"])


def test_chi2_no_overflow_on_dominant_cell(spark):
    # 2.1M rows in one cell: o*o*n over int64 would abort under ANSI
    df = (spark.range(2_100_000)
          .select(F.lit("a").alias("u"),
                  (F.col("id") % 2).cast("string").alias("w")))
    r = cramers_v(df, "u", "w").collect()[0]
    assert r.n == 2_100_000
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)  # u is constant


def test_association_emits_zero_pairs(spark):
    rows = [("a", "x", None), ("b", "y", None)]
    df = spark.createDataFrame(rows, "u string, w string, t string")
    out = {(r.col_a, r.col_b): r
           for r in association_report(df, ["u", "w", "t"]).collect()}
    assert set(out) == {("u", "w"), ("u", "t"), ("w", "t")}
    dead = out[("u", "t")]
    assert dead.n == 0 and dead.r_categories == 0
    assert dead.chi2 is None and dead.cramers_v is None
    assert dead.mi is None and dead.nmi is None


# ------------------------------------------------- target leakage

def test_target_leakage_flags_copy(spark):
    rng = np.random.RandomState(3)
    y = rng.normal(size=100)
    leak = y * 3.0 + 1.0
    noise = rng.normal(size=100)
    rows = [(float(a), float(b), float(c))
            for a, b, c in zip(leak, noise, y)]
    df = spark.createDataFrame(rows, "leak double, noise double, y double")
    out = {r.feature: r for r in
           target_leakage_report(df, ["leak", "noise"], "y").collect()}
    assert out["leak"].flagged and abs(out["leak"].abs_corr - 1) < 1e-9
    assert not out["noise"].flagged
    with pytest.raises(ValueError, match="label_col"):
        target_leakage_report(df, ["leak", "y"], "y")
    with pytest.raises(ValueError, match="non-empty"):
        target_leakage_report(df, [], "y")


# ------------------------------------------------- segment overlap

def test_segment_overlap_exact_at_p1(spark):
    rows = ([("a", i) for i in range(100)]
            + [("b", i) for i in range(50, 150)]
            + [("c", i) for i in range(200, 210)]
            + [("a", i) for i in range(100)])  # repeats don't count
    df = spark.createDataFrame(rows, "seg string, v long")
    out = {(r.segment_a, r.segment_b): r
           for r in segment_distinct_overlap(df, "seg", "v",
                                             p=1.0).collect()}
    ab = out[("a", "b")]
    assert (ab.sampled_a, ab.sampled_b, ab.sampled_common) == (100, 100, 50)
    assert ab.est_intersection == 50.0
    assert ab.est_union == 150.0
    assert abs(ab.est_jaccard - 50 / 150) < 1e-6  # rounded to 6dp
    ac = out[("a", "c")]
    assert ac.sampled_common == 0 and ac.est_jaccard == 0.0
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_segment_overlap_sample_deterministic_and_unbiased(spark):
    rows = ([("a", i) for i in range(2000)]
            + [("b", i) for i in range(1000, 3000)])
    df = spark.createDataFrame(rows, "seg string, v long")
    r1 = segment_distinct_overlap(df, "seg", "v", p=0.25).collect()[0]
    r2 = segment_distinct_overlap(df, "seg", "v", p=0.25).collect()[0]
    assert r1 == r2  # hash-deterministic
    # true distinct 2000 each, intersection 1000; ~4x relative SE bound
    assert abs(r1.est_distinct_a - 2000) < 4 * math.sqrt(0.75 * 2000 / 0.25)
    assert abs(r1.est_intersection - 1000) < 4 * math.sqrt(0.75 * 1000 / 0.25)


def test_segment_overlap_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), (None, 2), ("b", 1)],
        "seg string, v long")
    s = distinct_sample(df, "seg", "v", p=1.0).collect()
    assert sorted((r.segment, r.value) for r in s) == [
        ("a", "1"), ("b", "1")]
    with pytest.raises(ValueError, match="p must be"):
        segment_distinct_overlap(df, "seg", "v", p=0.0)
    with pytest.raises(ValueError, match="p must be"):
        segment_distinct_overlap(df, "seg", "v", p=1.5)


def test_segment_overlap_keeps_unsampled_segments(spark):
    # 'tiny' has one value hashing above a minuscule threshold most
    # of the time; with the data-driven segment spine it must still
    # appear in every pair with sampled 0 (or its true count)
    rows = ([("big", i) for i in range(2000)] + [("tiny", 999_999)])
    df = spark.createDataFrame(rows, "seg string, v long")
    out = {(r.segment_a, r.segment_b): r
           for r in segment_distinct_overlap(df, "seg", "v",
                                             p=0.001).collect()}
    assert ("big", "tiny") in out  # present regardless of sampling
    r = out[("big", "tiny")]
    assert r.sampled_b in (0, 1)
    assert r.est_jaccard is not None or (
        r.sampled_a + r.sampled_b == 0)


# ------------------------------------------------- boilerplate removal

_BANNER = "ACCEPT COOKIES TO CONTINUE"


def _mk_docs(spark):
    docs = []
    for i in range(20):
        body = f"unique content {i}\n\nsecond para {i}"
        docs.append((i, f"{_BANNER}\n{body}"))
    # one rare duplicated line (2/21 docs, below the ratio threshold)
    docs.append((20, f"{_BANNER}\nunique content 0\nrare dup"))
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_remove_boilerplate_drops_template_everywhere(spark):
    df = _mk_docs(spark)
    out = {r.doc_id: r for r in
           remove_boilerplate(df, min_docs=2,
                              min_df_ratio=0.5).collect()}
    assert len(out) == 21
    for i in range(20):
        assert _BANNER not in out[i].text
        # blank line and order preserved
        assert out[i].text == f"unique content {i}\n\nsecond para {i}"
        assert out[i].n_lines == 4 and out[i].n_kept == 3
    # "unique content 0" is in 2 docs but only 2/21 < 0.5 -> kept
    assert "unique content 0" in out[20].text
    assert "rare dup" in out[20].text


def test_remove_boilerplate_min_docs_gate(spark):
    # high ratio on a tiny corpus: min_docs prevents nuking singletons
    df = spark.createDataFrame([(0, "only doc line")],
                               "doc_id long, text string")
    out = remove_boilerplate(df, min_docs=2, min_df_ratio=0.01).collect()
    assert out[0].text == "only doc line"
    # with min_docs=1 + ratio 0.01 every non-blank line is boilerplate
    out2 = remove_boilerplate(df, min_docs=1, min_df_ratio=0.01,
                              drop_empty_docs=True).collect()
    assert out2 == []


def test_line_document_frequency_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [(0, "x\nx\nx\ny"), (1, "x\nz"), (2, "   \nz")],
        "doc_id long, text string")
    out = {r.line: r.doc_freq
           for r in line_document_frequency(df).collect()}
    assert out == {"x": 2, "y": 1, "z": 2}  # blanks never counted


def test_remove_boilerplate_null_text_and_literal_delim(spark):
    # NULL text keeps its output row (empty document)
    df = spark.createDataFrame([(0, None), (1, "a|b|a"), (2, "a|c")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_boilerplate(df, min_docs=2, min_df_ratio=0.5,
                              delim="|").collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].text == "" and out[0].n_kept == 1  # one blank line
    # '|' is literal, not a regex alternation: 'a' is in 2/3 docs
    # (>= 0.5) -> removed everywhere; 'b', 'c' survive
    assert out[1].text == "b" and out[2].text == "c"
    freq = {r.line: r.doc_freq for r in line_document_frequency(
        df, delim="|").collect()}
    assert freq == {"a": 2, "b": 1, "c": 1}


def test_remove_boilerplate_validation(spark):
    df = spark.createDataFrame([(0, "t")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate(df, min_docs=0)
    with pytest.raises(ValueError, match="min_df_ratio"):
        remove_boilerplate(df, min_df_ratio=0.0)


# ------------------------------------------------- seasonal decompose

def _np_decompose(ts_idx, vals, period):
    """Independent numpy reimplementation of the documented algorithm
    (bucket means assumed already applied; range window on the index)."""
    idx = np.asarray(ts_idx)
    y = np.asarray(vals, dtype=float)
    half = period // 2
    width = 2 * half + 1
    trend = np.full(len(y), np.nan)
    for k, i in enumerate(idx):
        m = (idx >= i - half) & (idx <= i + half)
        if m.sum() == width:
            trend[k] = y[m].mean()
    detr = y - trend
    slots = idx % period
    s_raw = {}
    for s in np.unique(slots):
        m = (slots == s) & ~np.isnan(detr)
        if m.any():
            s_raw[s] = detr[m].mean()
    mean_idx = np.mean(list(s_raw.values()))
    seasonal = np.array([s_raw.get(s, np.nan) - mean_idx for s in slots])
    return trend, seasonal, y - trend - seasonal


def test_seasonal_decompose_matches_numpy(spark):
    import datetime as dt

    period = 24
    base = dt.datetime(2024, 3, 1)
    rng = np.random.RandomState(11)
    rows = []
    for h in range(24 * 10):
        t = base + dt.timedelta(hours=h)
        val = 100 + 0.1 * h + 5 * math.sin(2 * math.pi * (h % 24) / 24)
        # two observations per bucket; bucket mean == val
        rows.append((t, val + 1.0))
        rows.append((t + dt.timedelta(minutes=30), val - 1.0))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = (seasonal_decompose(df, "ts", "value", grain="hour",
                              period=period)
           .orderBy("bucket").collect())
    assert len(out) == 240
    assert all(r.n_obs == 2 for r in out)
    idx = [int(r.bucket.timestamp() // 3600) for r in out]
    ys = [r.y for r in out]
    trend, seasonal, resid = _np_decompose(idx, ys, period)
    for k, r in enumerate(out):
        if np.isnan(trend[k]):
            assert r.trend is None and r.residual is None
        else:
            assert abs(r.trend - trend[k]) < 1e-9
            assert abs(r.residual - resid[k]) < 1e-9
        assert abs(r.seasonal - seasonal[k]) < 1e-9
    # edges: first/last half-window have null trend
    assert out[0].trend is None and out[-1].trend is None
    assert out[12].trend is not None


def test_seasonal_decompose_gap_nulls_trend(spark):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(hours=h), 10.0)
            for h in range(72) if h != 36]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    base_idx = int(base.timestamp() // 3600)
    out = {int(r.bucket.timestamp() // 3600) - base_idx: r for r in
           seasonal_decompose(df, "ts", "value", grain="hour",
                              period=4).collect()}
    # buckets within half-window (2) of the missing hour 36 lose trend
    for h in (34, 35, 37, 38):
        assert out[h].trend is None
    assert out[30].trend == pytest.approx(10.0)
    assert out[30].seasonal == pytest.approx(0.0)
    assert out[30].residual == pytest.approx(0.0)


def test_autocorrelation_matches_numpy(spark):
    """ACF/Ljung-Box vs a numpy reference (statsmodels-style biased
    estimator) on an AR(1) series — exact agreement."""
    import datetime as dt

    from whylogs_spark.ops.events import autocorrelation

    rng = np.random.RandomState(5)
    base = dt.datetime(2024, 3, 1)
    n = 200
    y = [0.0]
    for _ in range(1, n):
        y.append(0.7 * y[-1] + rng.normal())
    rows = [(base + dt.timedelta(hours=i), float(v))
            for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.lag: r for r in
           autocorrelation(df, max_lag=5).collect()}
    ya = np.array(y)
    mu = ya.mean()
    denom = ((ya - mu) ** 2).sum()
    q = 0.0
    for k in range(1, 6):
        r_k = ((ya[:-k] - mu) * (ya[k:] - mu)).sum() / denom
        q += r_k * r_k / (n - k)
        o = out[k]
        assert o.n_pairs == n - k
        assert o.acf == pytest.approx(r_k, abs=1e-10)
        assert o.qstat == pytest.approx(n * (n + 2) * q, abs=1e-7)
    # the AR(1) signal is decisively non-white
    from whylogs_spark.core.drift import chi2_sf
    assert chi2_sf(out[5].qstat, 5) < 1e-10
    with pytest.raises(ValueError, match="max_lag"):
        autocorrelation(df, max_lag=0)


def test_autocorrelation_gaps_keys_constant(spark):
    import datetime as dt

    from whylogs_spark.ops.events import autocorrelation

    base = dt.datetime(2024, 3, 1)
    rng = np.random.RandomState(9)
    rows = [("a", base + dt.timedelta(hours=i), float(rng.normal()))
            for i in range(100) if i % 7 != 3]   # gapped series
    rows += [("c", base + dt.timedelta(hours=i), 5.0)
             for i in range(30)]                 # constant series
    df = spark.createDataFrame(rows,
                               "k string, ts timestamp, value double")
    out = autocorrelation(df, key_cols=["k"], max_lag=3).collect()
    a = {r.lag: r for r in out if r.k == "a"}
    # a gap removes pairs at every lag it anchors: hour h missing
    # kills (h-l, h) and (h, h+l) for each lag l
    n_a = len([r for r in rows if r[0] == "a"])
    for lag in (1, 2, 3):
        assert a[lag].n_pairs < n_a - lag
        assert a[lag].acf is not None
    # constant series: zero variance -> null acf, qstat 0 via coalesce
    c = {r.lag: r for r in out if r.k == "c"}
    assert all(c[lag].acf is None for lag in (1, 2, 3))
    assert all(c[lag].qstat == 0.0 for lag in (1, 2, 3))


def test_autocorrelation_lag_at_or_past_bucket_count(spark):
    """A gappy series can pair buckets at a lag >= the bucket count n;
    the Ljung-Box n-k term is then <= 0 and must contribute nothing
    (previously an ANSI DIVIDE_BY_ZERO at n == k, a negative qstat
    contribution past it)."""
    import datetime as dt

    from whylogs_spark.ops.events import autocorrelation

    base = dt.datetime(2024, 3, 1)
    # buckets at hours {0, 2} only: n = 2, surviving pair at lag 2
    rows = [(base, 1.0), (base + dt.timedelta(hours=2), 3.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r.lag: r for r in autocorrelation(df, max_lag=3).collect()}
    assert out[2].n_pairs == 1
    assert out[2].qstat == 0.0          # excluded lag contributes 0
    # the lag spine emits EVERY lag 1..max_lag, so qstat's chi2 dof
    # convention (dof = lag) stays honest on gappy series: pair-less
    # lags surface with n_pairs 0 / null acf instead of vanishing
    assert set(out) == {1, 2, 3}
    assert out[1].n_pairs == 0 and out[1].acf is None
    assert out[3].n_pairs == 0 and out[3].acf is None
    # buckets {0, 3}: lag 3 == n + 1 territory (n - k negative)
    rows2 = [(base, 1.0), (base + dt.timedelta(hours=3), 3.0)]
    df2 = spark.createDataFrame(rows2, "ts timestamp, value double")
    out2 = {r.lag: r for r in
            autocorrelation(df2, max_lag=3).collect()}
    assert out2[3].qstat >= 0.0


def test_cross_correlation_recovers_planted_lead(spark):
    """y_t = x_{t-3} + noise: the cross-correlation must peak at
    lag 3 and agree with numpy at every lag."""
    import datetime as dt

    from whylogs_spark.ops.events import cross_correlation

    rng = np.random.RandomState(8)
    base = dt.datetime(2024, 3, 1)
    n = 300
    x = rng.normal(0, 1, n)
    y = np.roll(x, 3) + rng.normal(0, 0.1, n)
    rows = [(base + dt.timedelta(hours=i), float(x[i]), float(y[i]))
            for i in range(n)]
    df = spark.createDataFrame(rows,
                               "ts timestamp, value double, value2 double")
    out = {r.lag: (r.n_pairs, r.xcorr) for r in
           cross_correlation(df, max_lag=5).collect()}
    assert set(out) == set(range(-5, 6))
    for k in out:
        xa, ya = (x[:n - k], y[k:]) if k >= 0 else (x[-k:], y[:n + k])
        assert out[k][0] == n - abs(k)
        assert out[k][1] == pytest.approx(np.corrcoef(xa, ya)[0, 1],
                                          abs=1e-9)
    assert max(out, key=lambda k: out[k][1]) == 3
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(df, max_lag=0)


def test_cross_correlation_constant_and_sparse(spark):
    import datetime as dt

    from whylogs_spark.ops.events import cross_correlation

    base = dt.datetime(2024, 3, 1)
    # y constant -> null xcorr; x present only every other hour so
    # n_pairs shrinks per lag parity
    rows = [(base + dt.timedelta(hours=i),
             float(i) if i % 2 == 0 else None, 5.0)
            for i in range(40)]
    df = spark.createDataFrame(rows,
                               "ts timestamp, value double, value2 double")
    out = {r.lag: r for r in cross_correlation(df, max_lag=2).collect()}
    assert all(r.xcorr is None for r in out.values())
    assert out[0].n_pairs == 20       # x exists in 20 buckets
    assert out[1].n_pairs == 20       # y exists everywhere
    assert out[2].n_pairs == 19       # tail truncation


def test_seasonal_decompose_pre_epoch_slots(spark):
    """Pre-1970 timestamps have negative bucket indexes; slot must be
    pmod(idx, period) in 0..period-1, not Spark's sign-following %,
    so a series straddling the epoch keeps one seasonal index per
    phase instead of splitting it across +/- slot keys."""
    import datetime as dt

    base = dt.datetime(1969, 12, 31, 12)   # 36 h before epoch end
    rows = [(base + dt.timedelta(hours=h),
             10.0 + (h % 4)) for h in range(72)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = (seasonal_decompose(df, "ts", "value", grain="hour",
                              period=4).orderBy("bucket").collect())
    assert len(out) == 72
    assert all(0 <= r.slot < 4 for r in out)
    # base is 1969-12-31T12Z = epoch hour -36, so hour h has
    # idx = h - 36 and phase pmod(h - 36, 4) == h % 4
    for r in out:
        h = int((r.bucket - base).total_seconds() // 3600)
        assert r.slot == h % 4, (h, r.slot)
    # one seasonal index per phase (4 distinct values, zero-mean) —
    # with sign-following % the pre-epoch half would contribute
    # negative slots and split each phase's index in two
    by_slot = {}
    for r in out:
        by_slot.setdefault(r.slot, set()).add(round(r.seasonal, 9))
    assert set(by_slot) == {0, 1, 2, 3}
    assert all(len(v) == 1 for v in by_slot.values())
    assert sum(next(iter(v)) for v in by_slot.values()) == \
        pytest.approx(0.0, abs=1e-9)


def test_seasonal_decompose_nan_treated_as_missing(spark):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = [(base + dt.timedelta(hours=h), 10.0) for h in range(48)]
    rows.append((base + dt.timedelta(hours=5, minutes=30),
                 float("nan")))  # would poison every slot if averaged
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = seasonal_decompose(df, "ts", "value", grain="hour",
                             period=4).collect()
    assert len(out) == 48
    assert all(not math.isnan(r.seasonal) for r in out)
    interior = [r for r in out if r.trend is not None]
    assert interior and all(r.trend == pytest.approx(10.0)
                            for r in interior)


def test_seasonal_decompose_keys_and_validation(spark):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    for key, level in (("a", 10.0), ("b", 50.0)):
        rows += [(key, base + dt.timedelta(hours=h), level)
                 for h in range(12)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = (seasonal_decompose(df, "ts", "value", key_cols=["k"],
                              grain="hour", period=4)
           .filter("trend is not null").collect())
    assert {r.k for r in out} == {"a", "b"}
    for r in out:
        assert r.trend == pytest.approx(10.0 if r.k == "a" else 50.0)
    with pytest.raises(ValueError, match="grain"):
        seasonal_decompose(df, "ts", "value", grain="fortnight")
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "ts", "value", period=1)


def test_seasonal_naive_backtest_matches_reference(spark):
    """MAE/RMSE/MAPE/bias vs a python reference, with a gap dropping
    both the missing bucket and its period-later dependent."""
    import datetime as dt

    from whylogs_spark.ops.events import seasonal_naive_backtest

    rng = np.random.RandomState(4)
    base = dt.datetime(2024, 3, 1)
    rows, vals = [], {}
    for h in range(96):
        v = 10 + 5 * math.sin(2 * math.pi * (h % 24) / 24) \
            + rng.normal(0, 0.5)
        if h == 40:
            continue
        rows.append((base + dt.timedelta(hours=h), float(v)))
        vals[h] = v
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    r = seasonal_naive_backtest(df, period=24).collect()[0]
    errs = [(vals[h] - vals[h - 24], vals[h])
            for h in vals if h - 24 in vals]
    assert r.n_evaluated == len(errs) == 70
    assert r.mae == pytest.approx(
        np.mean([abs(e) for e, _ in errs]), abs=1e-10)
    assert r.rmse == pytest.approx(
        math.sqrt(np.mean([e * e for e, _ in errs])), abs=1e-10)
    assert r.bias == pytest.approx(
        np.mean([e for e, _ in errs]), abs=1e-10)
    assert r.mape == pytest.approx(
        np.mean([abs(e) / abs(a) for e, a in errs if a != 0]),
        abs=1e-10)
    with pytest.raises(ValueError, match="period"):
        seasonal_naive_backtest(df, period=0)


def test_seasonal_naive_backtest_keys_and_zero_actuals(spark):
    import datetime as dt

    from whylogs_spark.ops.events import seasonal_naive_backtest

    base = dt.datetime(2024, 3, 1)
    # key "z": actual 0 at every evaluated bucket -> mape null
    rows = [("z", base + dt.timedelta(hours=h),
             0.0 if h >= 2 else 1.0) for h in range(6)]
    rows += [("k", base + dt.timedelta(hours=h), float(h))
             for h in range(6)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = {r.g: r for r in seasonal_naive_backtest(
        df, key_cols=["g"], period=2).collect()}
    assert out["k"].n_evaluated == 4
    assert out["k"].mae == pytest.approx(2.0)   # y(t)-y(t-2) == 2
    assert out["k"].bias == pytest.approx(2.0)
    assert out["z"].mape is None                # all actuals zero
