"""Deterministic sampling operators (ops/sampling.py): reproducibility
under repartitioning, statistical accuracy at modest n, per-group caps,
and zero-shuffle plan shape for the filter-style ops."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops import sampling


@pytest.fixture(scope="module")
def frame(spark):
    return spark.range(0, 40000, 1, 8).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de")
         .otherwise("fr").alias("lang"),
    )


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_hash_split_fractions_and_determinism(spark, frame):
    out = sampling.hash_split(frame, ["k"],
                              {"train": 0.8, "test": 0.1, "valid": 0.1})
    counts = dict(out.groupBy("split").count().collect())
    assert set(counts) == {"train", "test", "valid"}
    assert counts["train"] / 40000 == pytest.approx(0.8, abs=0.02)
    assert counts["test"] / 40000 == pytest.approx(0.1, abs=0.02)
    # pure function of the key: identical assignment after repartition
    again = sampling.hash_split(frame.repartition(3), ["k"],
                                {"train": 0.8, "test": 0.1, "valid": 0.1})
    diff = (out.select("k", "split")
            .join(again.select("k", F.col("split").alias("s2")), "k")
            .filter(F.col("split") != F.col("s2")).count())
    assert diff == 0


def test_hash_split_dropped_fraction_and_salt(spark, frame):
    out = sampling.hash_split(frame, ["k"], {"sample": 0.25})
    kept = out.filter(F.col("split").isNotNull()).count()
    assert kept / 40000 == pytest.approx(0.25, abs=0.02)
    # a different salt reshuffles membership
    salted = sampling.hash_split(frame, ["k"], {"sample": 0.25}, salt="v2")
    moved = (out.filter(F.col("split").isNotNull()).select("k")
             .join(salted.filter(F.col("split").isNotNull()).select("k"),
                   "k").count())
    assert moved / kept == pytest.approx(0.25, abs=0.03)  # independent


def test_hash_split_validation(spark, frame):
    with pytest.raises(ValueError, match="non-empty"):
        sampling.hash_split(frame, ["k"], {})
    with pytest.raises(ValueError, match="> 1"):
        sampling.hash_split(frame, ["k"], {"a": 0.9, "b": 0.2})


def test_stratified_sample_per_stratum(spark, frame):
    out = sampling.stratified_sample(
        frame, "lang", {"en": 0.5, "de": 0.1}, key_cols=["k"])
    counts = dict(out.groupBy("lang").count().collect())
    base = dict(frame.groupBy("lang").count().collect())
    assert counts["en"] / base["en"] == pytest.approx(0.5, abs=0.03)
    assert counts["de"] / base["de"] == pytest.approx(0.1, abs=0.03)
    assert "fr" not in counts  # default_fraction=0 drops unlisted strata
    # zero shuffle: the sample is a scan-side filter
    assert "Exchange" not in _plan(out)


def test_group_sample_caps_and_determinism(spark, frame):
    out = sampling.group_sample(frame, ["grp"], k=3, key_cols=["k"])
    per = out.groupBy("grp").count().collect()
    assert all(r["count"] == 3 for r in per)  # every group has >3 rows
    a = sorted(r["k"] for r in out.collect())
    b = sorted(r["k"] for r in sampling.group_sample(
        frame.repartition(5), ["grp"], k=3, key_cols=["k"]).collect())
    assert a == b
    with pytest.raises(ValueError, match=">= 1"):
        sampling.group_sample(frame, ["grp"], k=0, key_cols=["k"])


def test_group_sample_small_groups_kept_whole(spark):
    df = spark.range(0, 5).select(F.col("id").alias("k"),
                                  F.lit("g").alias("grp"))
    out = sampling.group_sample(df, ["grp"], k=10, key_cols=["k"])
    assert out.count() == 5


def test_group_sample_presalt_equivalent(spark):
    """Two-stage (presalted) top-k must return exactly the single-stage
    sample — same total order in both stages guarantees no winner is
    dropped in stage 1."""
    from pyspark.sql import functions as F

    from whylogs_spark.ops.sampling import group_sample

    df = spark.createDataFrame(
        [(i % 4, i) for i in range(500)], ["g", "id"])
    plain = group_sample(df, ["g"], k=7, key_cols=["id"])
    salted = group_sample(df, ["g"], k=7, key_cols=["id"], presalt=8)
    a = sorted((r["g"], r["id"]) for r in plain.collect())
    b = sorted((r["g"], r["id"]) for r in salted.collect())
    assert a == b
    assert len(a) == 4 * 7
    # stage-1 task bound: the presalted plan's first window keys on
    # (group, bucket), not the group alone
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        salted.explain("formatted")
    assert "__gsb" in buf.getvalue()


def test_pack_chunks_distributed_equivalent(spark):
    """The two-phase distributed prefix sum must produce exactly the
    single-phase offsets/chunk ids — shards spanning several range
    slices included."""
    import random

    from whylogs_spark.ops.sampling import pack_chunks

    rnd = random.Random(5)
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", rnd.randrange(1, 50)) for i in range(400)],
        ["id", "shard", "sz"]).repartition(7)
    plain = pack_chunks(df, "sz", budget=100, shard_cols=["shard"],
                        order_cols=["id"])
    dist = pack_chunks(df, "sz", budget=100, shard_cols=["shard"],
                       order_cols=["id"], distributed=True)
    a = {(r["shard"], r["id"]): (r["chunk_offset"], r["chunk_id"])
         for r in plain.collect()}
    b = {(r["shard"], r["id"]): (r["chunk_offset"], r["chunk_id"])
         for r in dist.collect()}
    assert a == b
    # global (no shard) packing also matches
    g1 = pack_chunks(df, "sz", budget=100, order_cols=["shard", "id"])
    g2 = pack_chunks(df, "sz", budget=100, order_cols=["shard", "id"],
                     distributed=True)
    ga = {(r["shard"], r["id"]): r["chunk_offset"] for r in g1.collect()}
    gb = {(r["shard"], r["id"]): r["chunk_offset"] for r in g2.collect()}
    assert ga == gb
