"""Tests for ops/integrity.py: referential integrity, k-anonymity,
Benford's law, snapshot diff — each checked against hand-computed
ground truth on small frames plus null/edge behavior."""

import math

import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.integrity import (
    benford_test,
    k_anonymity_report,
    k_risk_groups,
    orphan_keys,
    referential_integrity,
    snapshot_diff,
    snapshot_diff_summary,
)


# ------------------------------------------------------- referential
def test_referential_integrity_basic(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "d"), (9, "e"), (None, "f")],
        "fk int, v string")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    row = referential_integrity(
        child, parent, ["fk"], ["pk"], relation="t").collect()[0]
    assert row.relation == "t"
    assert row.child_rows == 6
    assert row.null_key_rows == 1
    assert row.matched_rows == 3
    assert row.orphan_rows == 2
    assert row.orphan_keys == 1
    assert row.match_rate == pytest.approx(3 / 5)


@pytest.mark.parametrize("bcast", [False, True])
def test_referential_integrity_composite_counts(spark, bcast):
    child = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (2, "x", 3.0), (1, None, 4.0)],
        "k1 int, k2 string, v double")
    parent = spark.createDataFrame(
        [(1, "x"), (9, "z")], "a int, b string")
    row = referential_integrity(
        child, parent, ["k1", "k2"], ["a", "b"],
        broadcast_parent=bcast).collect()[0]
    assert row.child_rows == 4
    assert row.null_key_rows == 1  # (1, NULL) is neither match nor orphan
    assert row.matched_rows == 1
    assert row.orphan_rows == 2
    assert row.orphan_keys == 2
    assert row.match_rate == pytest.approx(1 / 3)


def test_referential_integrity_empty_child(spark):
    child = spark.createDataFrame([], "fk int, v string")
    parent = spark.createDataFrame([(1,)], "pk int")
    row = referential_integrity(child, parent, ["fk"], ["pk"]).collect()[0]
    assert row.child_rows == 0
    assert row.orphan_rows == 0
    assert row.match_rate is None


def test_referential_integrity_all_null_keys(spark):
    child = spark.createDataFrame(
        [(None, "a"), (None, "b")], "fk int, v string")
    parent = spark.createDataFrame([(1,)], "pk int")
    row = referential_integrity(child, parent, ["fk"], ["pk"]).collect()[0]
    assert row.null_key_rows == 2
    assert row.match_rate is None


def test_referential_integrity_key_arity_mismatch(spark):
    child = spark.createDataFrame([(1,)], "a int")
    parent = spark.createDataFrame([(1,)], "b int")
    with pytest.raises(ValueError, match="arity"):
        referential_integrity(child, parent, ["a"], ["b", "b"])


def test_orphan_keys_detail(spark):
    child = spark.createDataFrame(
        [(9, "a"), (9, "b"), (7, "c"), (1, "d"), (None, "e")],
        "fk int, v string")
    parent = spark.createDataFrame([(1,)], "pk int")
    got = {r.fk: r.child_rows
           for r in orphan_keys(child, parent, ["fk"], ["pk"]).collect()}
    assert got == {9: 2, 7: 1}


def test_referential_integrity_tpch(orders, customer):
    # TPC-H is referentially complete: orders.o_custkey -> customer
    row = referential_integrity(
        orders, customer, ["o_custkey"], ["c_custkey"],
        broadcast_parent=True).collect()[0]
    assert row.orphan_rows == 0
    assert row.null_key_rows == 0
    assert row.match_rate == pytest.approx(1.0)


# -------------------------------------------------------- k-anonymity
def test_k_anonymity_report(spark):
    rows = [("us", "a", 10), ("us", "a", 11), ("us", "a", 12),
            ("us", "b", 10), ("us", "b", 10),
            ("fr", "a", 30)]
    df = spark.createDataFrame(rows, "country string, seg string, y int")
    r = k_anonymity_report(df, ["country", "seg"], k=3,
                           sensitive_col="y").collect()[0]
    assert r.n_rows == 6
    assert r.n_groups == 3
    assert r.k_anonymity == 1
    assert r.groups_below_k == 2  # (us,b)=2, (fr,a)=1
    assert r.rows_below_k == 3
    assert r.singleton_rows == 1
    assert r.pct_rows_below_k == pytest.approx(0.5)
    # l-diversity: (us,a) has {10,11,12}=3, (us,b) has {10}=1, (fr,a)=1
    assert r.l_diversity == 1
    assert r.rows_l1 == 3  # 2 rows in (us,b) + 1 in (fr,a)


def test_k_anonymity_null_quasi_is_a_class(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("x", 3)], "q string, y int")
    r = k_anonymity_report(df, ["q"], k=2).collect()[0]
    assert r.n_groups == 2
    assert r.k_anonymity == 1
    assert r.rows_below_k == 1  # only the ('x') singleton


def test_k_anonymity_without_sensitive_has_no_l_columns(spark):
    df = spark.createDataFrame([("x", 1)], "q string, y int")
    out = k_anonymity_report(df, ["q"], k=2)
    assert "l_diversity" not in out.columns
    assert "rows_l1" not in out.columns


def test_k_risk_groups(spark):
    rows = [("us", 1), ("us", 2), ("fr", 3)]
    df = spark.createDataFrame(rows, "q string, y int")
    got = k_risk_groups(df, ["q"], k=2, sensitive_col="y").collect()
    assert len(got) == 1
    assert got[0].q == "fr"
    assert got[0].group_rows == 1
    assert got[0].distinct_sensitive == 1


def test_k_anonymity_invalid_k(spark):
    df = spark.createDataFrame([("x",)], "q string")
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_report(df, ["q"], k=0)


# ------------------------------------------------------------ benford
def test_benford_digits(spark):
    vals = [1.5, 19.0, 0.0017, -250.0, 9.99, 0.0, None, float("nan")]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = benford_test(df, "x").collect()
    assert [r.digit for r in out] == list(range(1, 10))
    by_d = {r.digit: r.n for r in out}
    # 1.5 -> 1, 19 -> 1, 0.0017 -> 1, -250 -> 2, 9.99 -> 9
    assert by_d[1] == 3
    assert by_d[2] == 1
    assert by_d[9] == 1
    assert sum(by_d.values()) == 5
    assert out[0].n_total == 5


def test_benford_expected_and_chi2(spark):
    # exact-Benford sample by construction: n_d proportional to law
    rows = []
    for d in range(1, 10):
        rows += [(float(d),)] * round(1000 * math.log10(1 + 1 / d))
    df = spark.createDataFrame(rows, "x double")
    out = benford_test(df, "x").collect()
    for r in out:
        assert abs(r.observed_p - r.expected_p) < 2e-3
    assert out[0].mad < 1e-3
    assert out[0].chi2_stat < 1.0


def test_benford_two_digits(spark):
    df = spark.createDataFrame(
        [(12.0,), (0.125,), (994.0,), (10.0,)], "x double")
    out = benford_test(df, "x", digits=2).collect()
    assert len(out) == 90
    by_d = {r.digit: r.n for r in out}
    assert by_d[12] == 2
    assert by_d[99] == 1
    assert by_d[10] == 1
    exp10 = math.log10(1 + 1 / 10)
    assert out[0].expected_p == pytest.approx(exp10, abs=1e-6)


def test_benford_empty_input(spark):
    df = spark.createDataFrame([], "x double")
    out = benford_test(df, "x").collect()
    assert len(out) == 9
    assert all(r.n == 0 and r.observed_p == 0.0 for r in out)
    assert out[0].chi2_stat == 0.0


def test_benford_power_of_ten_edges(spark):
    # values where floor(log10) FP error could push the digit out of
    # range: the clamp keeps them in a valid (adjacent) bucket
    df = spark.createDataFrame(
        [(1000.0,), (0.001,), (1.0,), (9.9999999,)], "x double")
    out = benford_test(df, "x").collect()
    assert sum(r.n for r in out) == 4
    assert all(1 <= r.digit <= 9 for r in out)


def test_benford_invalid_digits(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="digits"):
        benford_test(df, "x", digits=3)


# ------------------------------------------------------ snapshot diff
def _snap(spark, rows):
    return spark.createDataFrame(rows, "id int, text string, lang string")


def test_snapshot_diff_statuses(spark):
    old = _snap(spark, [(1, "a", "en"), (2, "b", "en"), (3, "c", "fr")])
    new = _snap(spark, [(2, "b", "en"), (3, "c2", "fr"), (4, "d", "de")])
    got = {r.id: r.status
           for r in snapshot_diff(old, new, "id",
                                  ["text", "lang"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "added"}


def test_snapshot_diff_null_content_not_confused(spark):
    # (NULL,'x') vs ('x',NULL) must be 'changed' (null-gated hash)
    old = _snap(spark, [(1, None, "x")])
    new = _snap(spark, [(1, "x", None)])
    got = snapshot_diff(old, new, "id", ["text", "lang"]).collect()
    assert got[0].status == "changed"
    # null == null content is 'unchanged'
    old2 = _snap(spark, [(2, None, "en")])
    new2 = _snap(spark, [(2, None, "en")])
    assert snapshot_diff(old2, new2, "id",
                         ["text", "lang"]).collect()[0].status \
        == "unchanged"


def test_snapshot_diff_summary(spark):
    old = _snap(spark, [(1, "a", "en"), (2, "b", "en"), (3, "c", "fr")])
    new = _snap(spark, [(2, "b", "en"), (3, "c2", "fr"), (4, "d", "de"),
                        (5, "e", "en")])
    r = snapshot_diff_summary(old, new, "id",
                              ["text", "lang"]).collect()[0]
    assert (r.added, r.removed, r.changed, r.unchanged) == (2, 1, 1, 1)
    assert r.old_rows == 3
    assert r.new_rows == 4
    assert r.churn_rate == pytest.approx(4 / 4)


def test_snapshot_diff_empty_old(spark):
    old = _snap(spark, [])
    new = _snap(spark, [(1, "a", "en")])
    r = snapshot_diff_summary(old, new, "id",
                              ["text", "lang"]).collect()[0]
    assert (r.added, r.removed, r.changed, r.unchanged) == (1, 0, 0, 0)
    assert r.churn_rate == pytest.approx(1.0)


def test_snapshot_diff_documents_roundtrip(documents):
    # identical snapshots -> all unchanged
    r = snapshot_diff_summary(documents, documents, "doc_id",
                              ["text", "source"]).collect()[0]
    assert r.added == 0 and r.removed == 0 and r.changed == 0
    assert r.unchanged == documents.count()


# ------------------------------------------------ candidate keys

def test_candidate_keys_semantics(spark):
    from whylogs_spark.ops.integrity import candidate_keys

    rows = [(1, "a", "x", None), (2, "b", "x", 5), (3, "c", "y", 5),
            (4, "a", "y", 6)]
    df = spark.createDataFrame(rows,
                               "id long, name string, grp string, v long")
    out = {r.key_columns: r for r in candidate_keys(df).collect()}
    assert len(out) == 4 + 6
    assert out["id"].is_key and out["id"].is_minimal
    assert not out["name"].is_key          # duplicate value
    assert not out["v"].is_key and out["v"].n_nulls == 1
    # composite key that no single column provides: minimal
    assert out["name,grp"].is_key and out["name,grp"].is_minimal
    # superset of a key: a key but NOT minimal
    assert out["id,name"].is_key and not out["id,name"].is_minimal
    # unique combinations with a null member do not certify
    assert out["grp,v"].n_distinct == 4 and not out["grp,v"].is_key
    assert out["name"].uniqueness_ratio == pytest.approx(0.75)


def test_candidate_keys_modes_and_validation(spark):
    from whylogs_spark.ops.integrity import candidate_keys

    df = spark.createDataFrame([(i, i % 3) for i in range(30)],
                               "a long, b long")
    ap = {r.key_columns: r for r in
          candidate_keys(df, distinct="approx").collect()}
    assert all(r.is_key is None and r.is_minimal is None
               for r in ap.values())
    # HLL ratio is in the right ballpark for the true key
    assert 0.9 < ap["a"].uniqueness_ratio < 1.1
    with pytest.raises(ValueError, match="max_columns"):
        wide = spark.createDataFrame(
            [tuple(range(9))], ", ".join(f"c{i} long" for i in range(9)))
        candidate_keys(wide)
    with pytest.raises(ValueError, match="distinct"):
        candidate_keys(df, distinct="hll")
    with pytest.raises(ValueError, match="at least one"):
        candidate_keys(df, columns=[])


def test_candidate_keys_default_skips_nested_columns(spark):
    """The documented default is 'all non-nested columns': a map (or
    struct/array) column is not comparable, so leaving it in the
    default set made count_distinct(struct(...)) fail at analysis."""
    from pyspark.sql import functions as F

    from whylogs_spark.ops.integrity import candidate_keys

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "a long, b long"
    ).withColumn("m", F.create_map(F.lit("k"), F.col("b"))) \
     .withColumn("s", F.struct(F.col("b").alias("x")))
    got = {r.key_columns for r in candidate_keys(df).collect()}
    assert got == {"a", "b", "a,b"}
    # an EXPLICIT nested column is still honored (caller's choice)
    got2 = {r.key_columns for r in
            candidate_keys(df, columns=["a", "m"]).collect()}
    assert got2 == {"a", "m", "a,m"}
