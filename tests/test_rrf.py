"""rrf_fuse: hand-computed fused scores, missing-list nulls, cutoff
determinism, and validation."""

import pytest

from whylogs_spark.ops.search import rrf_fuse


def test_rrf_hand_computed(spark):
    # ranker A ranks 1,2,3; ranker B ranks 3,2,1
    df = spark.createDataFrame(
        [(1, 30.0, 1.0), (2, 20.0, 2.0), (3, 10.0, 3.0)],
        "id long, sa double, sb double")
    out = {r["id"]: r for r in rrf_fuse(
        df, ["id"], ["sa", "sb"], k0=60).collect()}
    # doc 1: rank_sa 1, rank_sb 3 -> 1/61 + 1/63
    assert out[1]["rank_sa"] == 1 and out[1]["rank_sb"] == 3
    assert out[1]["rrf_score"] == pytest.approx(1 / 61 + 1 / 63)
    # doc 2: both rank 2 -> 2/62
    assert out[2]["rrf_score"] == pytest.approx(2 / 62)
    assert all(r["lists_hit"] == 2 for r in out.values())


def test_rrf_missing_from_one_list(spark):
    # doc 3 has a null sa -> only in list b
    df = spark.createDataFrame(
        [(1, 30.0, 1.0), (2, 20.0, 2.0), (3, None, 9.0)],
        "id long, sa double, sb double")
    out = {r["id"]: r for r in rrf_fuse(
        df, ["id"], ["sa", "sb"], k0=60).collect()}
    assert out[3]["rank_sa"] is None
    assert out[3]["rank_sb"] == 1
    assert out[3]["lists_hit"] == 1
    assert out[3]["rrf_score"] == pytest.approx(1 / 61)


def test_rrf_per_list_limit_and_top_k(spark):
    rows = [(i, float(100 - i), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, sa double, sb double")
    out = rrf_fuse(df, ["id"], ["sa", "sb"], k0=60,
                   per_list_limit=5, top_k=4).collect()
    assert len(out) == 4
    # list a top-5 = ids 0..4; list b top-5 = ids 49..45 — disjoint,
    # so candidates pair up by rank: 1/61 for ids {0, 49}, 1/62 for
    # {1, 48}, ...; the top-4 cut breaks each tie on id ascending
    assert [r["id"] for r in out] == [0, 49, 1, 48]
    assert all(r["lists_hit"] == 1 for r in out)


def test_rrf_deterministic_score_ties(spark):
    # equal scores everywhere -> ranks decided by id ascending
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 5.0, 5.0)], "id long, sa double, sb double")
    out = {r["id"]: r for r in rrf_fuse(
        df, ["id"], ["sa", "sb"]).collect()}
    assert out[1]["rank_sa"] == 1 and out[2]["rank_sa"] == 2
    assert out[1]["rank_sb"] == 1 and out[2]["rank_sb"] == 2


def test_rrf_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, s double")
    with pytest.raises(ValueError, match="score_cols"):
        rrf_fuse(df, ["id"], ["s"])
    with pytest.raises(ValueError, match="not in df"):
        rrf_fuse(df, ["id"], ["s", "nope"])
    with pytest.raises(ValueError, match="k0"):
        rrf_fuse(df, ["id"], ["s", "s"], k0=0)
