"""Round-10 third-batch operators vs independent references:
pattern profile, delta-method ratio CI, Hill tail index, IPF raking."""

import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_pattern_profile_matches_pandas(spark):
    from whylogs_spark.ops.schema_infer import pattern_profile

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    got = defaultdict(dict)
    for r in pattern_profile(cust, ["c_name", "c_mktsegment"],
                             top_k=3).collect():
        got[r.column][r.mask] = r

    pdf = cust.select("c_name", "c_mktsegment").toPandas()
    for c in ["c_name", "c_mktsegment"]:
        s = pdf[c].astype(str).str[:40]
        masks = s.map(lambda v: re.sub(
            "[0-9]", "9", re.sub("[a-z]", "a", re.sub("[A-Z]", "A", v))))
        g = (pd.DataFrame({"mask": masks, "v": s})
             .groupby("mask")
             .agg(n=("v", "size"), nv=("v", "nunique"), ex=("v", "min"))
             .reset_index()
             .sort_values(["n", "mask"], ascending=[False, True])
             .head(3))
        assert set(got[c]) == set(g["mask"])
        for _, row in g.iterrows():
            r = got[c][row["mask"]]
            assert r.n == row.n and r.n_values == row.nv
            assert r.example == row.ex
            assert abs(r.share - row.n / len(s)) < 1e-12


def test_pattern_profile_two_phase_cap_stable(spark):
    from whylogs_spark.ops.schema_infer import pattern_profile

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    a = sorted((r.column, r.mask, r.n) for r in pattern_profile(
        cust.repartition(7), ["c_mktsegment"], top_k=2).collect())
    b = sorted((r.column, r.mask, r.n) for r in pattern_profile(
        cust.coalesce(1), ["c_mktsegment"], top_k=2).collect())
    assert a == b


def test_pattern_profile_nulls(spark):
    from whylogs_spark.ops.schema_infer import pattern_profile

    d = spark.createDataFrame(
        [("A1",), (None,), ("B2",), (None,)], "c string")
    got = {r.mask: r for r in pattern_profile(d, ["c"]).collect()}
    assert got["<null>"].n == 2 and got["<null>"].n_values == 0
    assert got["A9"].n == 2


def test_ratio_delta_ci_matches_numpy(events):
    from whylogs_spark.ops.abtest import ratio_delta_ci

    per_user = events.groupBy("user_id", "event_type").agg(
        F.sum("value").alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"))
    got = {r.event_type: r for r in ratio_delta_ci(
        per_user, "x", "y", ["event_type"]).collect()}
    pdf = per_user.toPandas()
    z = 1.959963984540054
    for et, g in pdf.groupby("event_type"):
        x, y = g.x.to_numpy(float), g.y.to_numpy(float)
        n = len(x)
        ratio = x.mean() / y.mean()
        var = (x.var(ddof=1) - 2 * ratio * np.cov(x, y, ddof=1)[0, 1]
               + ratio * ratio * y.var(ddof=1)) / (n * y.mean() ** 2)
        se = np.sqrt(var)
        r = got[et]
        assert r.n == n
        assert abs(r.ratio - ratio) < 1e-9
        assert abs(r.se - se) < 1e-9
        assert abs(r.ci_lo - (ratio - z * se)) < 1e-9
        assert abs(r.ci_hi - (ratio + z * se)) < 1e-9


def test_ratio_delta_ci_degenerate(spark):
    from whylogs_spark.ops.abtest import ratio_delta_ci

    one = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    r = ratio_delta_ci(one, "x", "y").collect()[0]
    assert r.ratio == 0.5 and r.se is None and r.ci_lo is None


def test_hill_matches_numpy(lineitem):
    from whylogs_spark.ops.stats import hill_tail_index

    got = {r.l_returnflag: r for r in hill_tail_index(
        lineitem, "l_extendedprice", k=50,
        group_cols=["l_returnflag"]).collect()}
    pdf = lineitem.select("l_returnflag", "l_extendedprice").toPandas()
    for fl, g in pdf.groupby("l_returnflag"):
        x = np.sort(g.l_extendedprice.to_numpy(float))[::-1]
        head = x[:51]
        xk, k_used = head[-1], len(head) - 1
        xi = np.mean(np.log(head[:k_used] / xk))
        r = got[fl]
        assert r.n == len(x) and r.k_used == k_used
        assert abs(r.x_k - xk) < 1e-9
        assert abs(r.xi - xi) < 1e-12
        assert abs(r.alpha - 1 / xi) < 1e-6


def test_hill_recovers_pareto_alpha(spark):
    # planted Pareto(alpha=2): inverse-CDF on a deterministic grid
    alpha = 2.0
    vals = [(float((1 - (i + 0.5) / 4000) ** (-1 / alpha)),)
            for i in range(4000)]
    d = spark.createDataFrame(vals, "x double")
    from whylogs_spark.ops.stats import hill_tail_index

    r = hill_tail_index(d, "x", k=400).collect()[0]
    assert r.alpha == pytest.approx(alpha, rel=0.15)


def test_ipf_hits_both_marginals(documents, spark):
    from whylogs_spark.ops.sampling import ipf_weights

    langs = [r.lang for r in documents.select("lang")
             .distinct().collect()]
    srcs = [r.source for r in documents.select("source")
            .distinct().collect()]
    out = ipf_weights(documents, "lang", "source",
                      {x: 1.0 for x in langs},
                      {x: 1.0 for x in srcs}, iterations=20).collect()
    rm, cm = defaultdict(float), defaultdict(float)
    tot = 0.0
    for r in out:
        rm[r.lang] += r.weighted_share
        cm[r.source] += r.weighted_share
        tot += r.weighted_share
    assert tot == pytest.approx(1.0)
    for v in cm.values():  # column axis adjusted last => exact
        assert v == pytest.approx(1.0 / len(srcs), abs=1e-9)
    for v in rm.values():  # row axis converged
        assert v == pytest.approx(1.0 / len(langs), abs=1e-3)


def test_ipf_matches_numpy_replay(documents):
    from whylogs_spark.ops.sampling import ipf_weights

    pdf = documents.select("lang", "source").toPandas()
    langs, srcs = pdf.lang.unique(), pdf.source.unique()
    rt = {x: 1.0 / len(langs) for x in langs}
    ct = {x: 1.0 / len(srcs) for x in srcs}
    got = {(r.lang, r.source): r.weighted_share for r in ipf_weights(
        documents, "lang", "source", rt, ct, iterations=5).collect()}

    cells = pdf.groupby(["lang", "source"]).size()
    state = (cells / cells.sum()).to_dict()
    for _ in range(5):
        for axis, tg in ((0, rt), (1, ct)):
            sums = defaultdict(float)
            for k, w in state.items():
                sums[k[axis]] += w
            state = {k: (w * tg.get(k[axis], 0.0) / sums[k[axis]]
                         if sums[k[axis]] > 0 else 0.0)
                     for k, w in state.items()}
    assert max(abs(got[k] - v) for k, v in state.items()) < 1e-12


def test_ipf_cell_cap(documents):
    from whylogs_spark.ops.sampling import ipf_weights

    with pytest.raises(ValueError):
        ipf_weights(documents, "lang", "source", {"en": 1.0},
                    {"s": 1.0}, max_cells=3)
