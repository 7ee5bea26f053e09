"""Cross-implementation interop: read the reference's checked-in v0
golden profile (`/root/reference/python/tests/testdata/v0_profile.bin`
— bytes written by reference whylogs code, not by this engine) with the
repo's stdlib v0 decoder and assert its contents.

Evidence layers:
* structural — 22 columns, the same count the reference's own
  `tests/migration/test_migration_converters.py` asserts after
  `read_v0_to_view`;
* value — scalar metrics (counts, type counts, variance mean/stddev,
  doubles min/max) decoded from the protobuf match hard expectations
  and are mutually consistent (n = typed + null, float32 KLL extrema
  round-trip against the float64 DoublesMessage);
* sketch — the DataSketches HLL blobs estimate correctly through
  Spark's JVM `hll_sketch_estimate` (a third, independent DataSketches
  implementation), and the frequent-items blobs decode to plausible
  heavy hitters through the repo's own FI codec.
"""

import math
import os

import numpy as np
import pytest

from whylogs_spark.io.v0 import read_v0_profile, v0_to_rows

GOLDEN = "/root/reference/python/tests/testdata/v0_profile.bin"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden not present")


@pytest.fixture(scope="module")
def prof():
    return read_v0_profile(GOLDEN)


def test_structure_and_properties(prof):
    # same column count the reference's own migration test asserts
    assert len(prof.columns) == 22
    assert prof.session_id == "31227a1a-0977-4420-ac54-e54ecf790007"
    assert prof.tags == {"name": "profile_2022_02"}
    assert prof.session_timestamp_ms == 1649263096574  # 2022-04-06
    assert prof.data_timestamp_ms == 1649257655165


def test_counts_and_types(prof):
    # every column saw all 153,564 rows
    assert all(c.n == 153564 for c in prof.columns.values())
    make = prof.columns["make"]
    assert make.type_counts == {"string": 153528}
    assert make.null_type_count == 36
    price = prof.columns["price"]
    assert price.type_counts == {"fractional": 152771}
    assert price.null_type_count == 793
    # typed + null partitions n (no unknown/boolean leakage)
    for name in ("make", "price", "mileage", "gearbox", "year"):
        c = prof.columns[name]
        assert sum(c.type_counts.values()) + c.null_type_count == c.n, name


def test_distribution_values(prof):
    year = prof.columns["year"]
    assert year.dist_n == 153520
    assert year.mean == pytest.approx(2011.6551198541003)
    assert year.stddev == pytest.approx(6.447612043615765)
    assert year.dbl_min == 1900.0 and year.dbl_max == 2022.0
    mileage = prof.columns["mileage"]
    assert mileage.dbl_max == 20970007.0
    assert mileage.mean == pytest.approx(152936.2445, abs=1e-3)
    # string column carries no numeric distribution
    assert prof.columns["make"].mean is None


def test_kll_floats_decode(prof):
    year = prof.columns["year"].kll()
    assert year.n == 153520  # same stream the variance message saw
    assert year.min_value == 1900.0 and year.max_value == 2022.0
    q = [year.quantile(p) for p in (0.25, 0.5, 0.75)]
    assert q[0] <= q[1] <= q[2]
    assert year.quantile(0.5) == 2012.0  # KLL median, k=256 on 153k rows
    # the v0 sketch stores float32 items: its extrema must equal the
    # float64 DoublesMessage extrema after float32 rounding — two
    # independently-written trackers agreeing across precisions
    price = prof.columns["price"]
    assert price.kll().max_value == float(np.float32(price.dbl_max))
    assert price.kll().min_value == float(np.float32(price.dbl_min))


def test_frequent_items_decode(prof):
    top = prof.columns["make"].frequent_items().top_k(3)
    assert [t[0] for t in top] == ["opel", "volkswagen", "audi"]
    assert top[0][1] == 12921  # opel upper estimate
    gear = prof.columns["gearbox"].frequent_items()
    gt = dict((k, est) for k, est, _lo, _hi in gear.top_k(4))
    assert gt == {"manual": 104592, "automatic": 48278}
    # exhaustive two-value column: counts sum to the typed stream
    assert sum(gt.values()) == prof.columns["gearbox"].type_counts[
        "string"]


def test_hll_bytes_estimate_via_spark_jvm(spark, prof):
    """Reference-written DataSketches HLL blobs must estimate
    correctly through Spark's JVM hll_sketch_estimate — a third
    DataSketches implementation reading the same wire bytes."""
    from pyspark.sql import functions as F

    rows = [(n, c.hll_bytes) for n, c in sorted(prof.columns.items())
            if c.hll_bytes]
    df = spark.createDataFrame(rows, "column string, hll binary")
    est = {r["column"]: r["est"] for r in df.select(
        "column", F.hll_sketch_estimate("hll").alias("est")).collect()}
    # two-valued flags are exact in coupon mode
    for col in ("gearbox", "new_used", "damaged", "no_accident"):
        assert est[col] == pytest.approx(2.0, abs=0.01), col
    assert est["nr_seats"] == pytest.approx(10.0, abs=0.05)
    assert est["make"] == pytest.approx(109.0, rel=0.01)
    assert est["transmission"] == pytest.approx(5.0, abs=0.05)
    # estimates never exceed the observed row count
    for name, e in est.items():
        assert e <= prof.columns[name].n * 1.05, name


def test_flatten_rows(prof):
    rows = v0_to_rows(prof)
    assert len(rows) == 22
    by = {r["column"]: r for r in rows}
    assert by["year"]["counts/n"] == 153564
    assert by["year"]["distribution/max"] == 2022.0
    assert by["make"]["types/string"] == 153528
    assert by["price"]["counts/null"] == 793
    assert math.isclose(by["mileage"]["distribution/stddev"],
                        113072.6052985, rel_tol=1e-9)
