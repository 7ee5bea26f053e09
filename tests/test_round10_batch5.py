"""Round-10 fifth-batch operators: RFM segmentation and the
join-relationship classifier, vs pandas/numpy replays."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_rfm_matches_numpy(orders):
    from whylogs_spark.ops.features import rfm_segmentation

    out = rfm_segmentation(orders, "o_custkey", "o_orderdate",
                           "o_totalprice", n_bins=5)
    got = {r.o_custkey: r for r in out.collect()}

    pdf = orders.select("o_custkey", "o_orderdate",
                        "o_totalprice").toPandas()
    pdf["t"] = pdf.o_orderdate.astype("int64") / 1e9
    per = pdf.groupby("o_custkey").agg(
        last_ts=("t", "max"), frequency=("t", "size"),
        monetary=("o_totalprice", "sum"))
    qs = [i / 5 for i in range(1, 5)]
    cr = np.quantile(per.last_ts, qs, method="linear")
    cf = np.quantile(per.frequency.astype(float), qs, method="linear")
    cm = np.quantile(per.monetary, qs, method="linear")
    for ck, row in per.iterrows():
        r = got[ck]
        assert r.frequency == row.frequency
        assert abs(r.monetary - row.monetary) < 1e-6
        assert r.r_score == int((row.last_ts > cr).sum()) + 1
        assert r.f_score == int((float(row.frequency) > cf).sum()) + 1
        assert r.m_score == int((row.monetary > cm).sum()) + 1
        assert r.rfm_cell == f"{r.r_score}{r.f_score}{r.m_score}"


def test_rfm_scores_monotone(spark):
    from whylogs_spark.ops.features import rfm_segmentation

    # entity i has i+1 events of value 10 each, last at time i
    rows = [(i, float(j), 10.0) for i in range(20)
            for j in range(i + 1)]
    d = spark.createDataFrame(rows, "e int, t double, v double")
    out = {r.e: r for r in rfm_segmentation(
        d, "e", "t", "v", n_bins=4).collect()}
    # frequency and monetary rise with e, so scores are nondecreasing
    for i in range(1, 20):
        assert out[i].f_score >= out[i - 1].f_score
        assert out[i].m_score >= out[i - 1].m_score
    assert out[0].f_score == 1 and out[19].f_score == 4


def test_relationship_report_tpch(orders, spark):
    from whylogs_spark.ops.integrity import relationship_report

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    r = relationship_report(orders, cust, "o_custkey",
                            "c_custkey").collect()[0]
    pdf_o = orders.select("o_custkey").toPandas().o_custkey
    pdf_c = cust.select("c_custkey").toPandas().c_custkey
    assert r.left_rows == len(pdf_o) and r.right_rows == len(pdf_c)
    assert r.left_keys == pdf_o.nunique()
    assert r.right_keys == pdf_c.nunique()
    assert r.left_max_multiplicity == pdf_o.value_counts().max()
    assert r.right_max_multiplicity == 1
    assert r.relationship == "many_to_one"
    assert r.left_orphans == int(
        (~pdf_o.isin(set(pdf_c))).sum())
    assert r.right_orphans == int(
        (~pdf_c.isin(set(pdf_o))).sum())


def test_relationship_report_shapes(spark):
    from whylogs_spark.ops.integrity import relationship_report

    a = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    r = relationship_report(a, b, "k", "k").collect()[0]
    assert r.relationship == "one_to_one"
    assert r.left_orphans == 1 and r.right_orphans == 1

    many = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    r2 = relationship_report(many, b, "k", "k").collect()[0]
    assert r2.relationship == "many_to_one"
    r3 = relationship_report(b, many, "k", "k").collect()[0]
    assert r3.relationship == "one_to_many"
    r4 = relationship_report(many, many, "k", "k").collect()[0]
    assert r4.relationship == "many_to_many"


def test_relationship_report_null_keys(spark):
    from whylogs_spark.ops.integrity import relationship_report

    a = spark.createDataFrame([(1,), (None,)], "k int")
    b = spark.createDataFrame([(1,), (None,), (None,)], "k int")
    r = relationship_report(a, b, "k", "k").collect()[0]
    # nulls never join: excluded from rows/keys/orphans entirely
    assert r.left_rows == 1 and r.right_rows == 1
    assert r.left_orphans == 0 and r.right_orphans == 0
