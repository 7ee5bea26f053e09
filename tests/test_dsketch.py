"""Apache DataSketches wire-format interop (io/dsketch.py), validated
against the REAL datasketches-java library bundled with Spark — the same
binary formats the reference's ``whylogs-sketching`` (datasketches-cpp
fork) reads and writes (reference sketch usage:
python/whylogs/core/metrics/metrics.py:425,446; container fields:
proto/src/whylogs_messages.proto:39-56).

These tests prove, byte-for-byte against the canonical implementation:
  * our KLL serialization heapifies in DataSketches and preserves
    n/min/max/quantiles;
  * DataSketches-written KLL parses into our sketch and survives a
    round trip back;
  * DataSketches can MERGE our sketches (the interop contract a
    reference user actually needs);
  * same in both directions for the frequent-items sketch, with exact
    estimate/bound equality.
"""

import numpy as np
import pytest

from whylogs_spark.core.sketches import FrequentStringsSketch, KllSketch
from whylogs_spark.io.dsketch import (fi_from_ds_bytes, fi_to_ds_bytes,
                                      kll_from_ds_bytes, kll_to_ds_bytes)


@pytest.fixture(scope="module")
def jds(spark):
    jvm = spark._jvm
    return {
        "Mem": jvm.org.apache.datasketches.memory.Memory,
        "Kll": jvm.org.apache.datasketches.kll.KllDoublesSketch,
        "Items": jvm.org.apache.datasketches.frequencies.ItemsSketch,
        "serde": jvm.org.apache.datasketches.common.ArrayOfStringsSerDe(),
    }


def _heapify(jds, b):
    return jds["Kll"].heapify(jds["Mem"].wrap(bytearray(b)))


def _fi_instance(jds, b):
    return jds["Items"].getInstance(
        jds["Mem"].wrap(bytearray(b)), jds["serde"])


@pytest.mark.parametrize("n", [0, 1, 5, 300, 20000])
def test_kll_ours_to_datasketches(spark, jds, n):
    rng = np.random.default_rng(n + 1)
    sk = KllSketch(k=256)
    if n:
        sk.update_batch(rng.normal(size=n) * 100)
    j = _heapify(jds, kll_to_ds_bytes(sk))
    assert j.getN() == sk.n
    assert j.getNumRetained() == sum(a.size for a in sk.levels)
    if n:
        assert j.getMinItem() == sk.min_value
        assert j.getMaxItem() == sk.max_value
    if n >= 300:
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            assert abs(sk.rank(j.getQuantile(q)) - q) < 0.05


def test_kll_merged_partials_to_datasketches(spark, jds):
    """The real write-path shape: executor partials merged driver-side."""
    rng = np.random.default_rng(3)
    acc = KllSketch(k=256)
    for _ in range(16):
        part = KllSketch(k=256)
        part.update_batch(rng.normal(size=5000))
        acc.merge(part)
    j = _heapify(jds, kll_to_ds_bytes(acc))
    assert j.getN() == 80000
    for q in (0.05, 0.5, 0.95):
        assert abs(acc.rank(j.getQuantile(q)) - q) < 0.05


def test_kll_datasketches_to_ours_and_back(spark, jds):
    rng = np.random.default_rng(11)
    j = jds["Kll"].newHeapInstance(200)
    for x in rng.normal(size=5000):
        j.update(float(x))
    ours = kll_from_ds_bytes(bytes(j.toByteArray()))
    assert ours.n == 5000 and ours.k == 200
    for q in (0.05, 0.5, 0.95):
        assert abs(ours.rank(j.getQuantile(q)) - q) < 0.05
    j2 = _heapify(jds, kll_to_ds_bytes(ours))
    assert j2.getN() == 5000
    assert j2.getQuantile(0.5) == j.getQuantile(0.5)


def test_kll_datasketches_merges_our_bytes(spark, jds):
    rng = np.random.default_rng(13)
    a = KllSketch(k=256)
    a.update_batch(rng.uniform(size=3000))
    b = KllSketch(k=256)
    b.update_batch(rng.uniform(size=7000) + 10.0)
    jm = jds["Kll"].newHeapInstance(256)
    jm.merge(_heapify(jds, kll_to_ds_bytes(a)))
    jm.merge(_heapify(jds, kll_to_ds_bytes(b)))
    assert jm.getN() == 10000
    assert jm.getMinItem() == min(a.min_value, b.min_value)
    assert jm.getMaxItem() == max(a.max_value, b.max_value)
    # 30% of mass below 1.0, 70% above 10.0
    assert jm.getRank(5.0) == pytest.approx(0.3, abs=0.02)


@pytest.mark.parametrize("nuniq,reps", [(0, 0), (3, 7), (40, 50), (500, 7)])
def test_fi_ours_to_datasketches(spark, jds, nuniq, reps):
    fs = FrequentStringsSketch(capacity=128)
    vals = ["item_%d" % (i % max(nuniq, 1)) for i in range(nuniq * reps)]
    if vals:
        fs.update_batch(vals)
    ji = _fi_instance(jds, fi_to_ds_bytes(fs))
    assert ji.getStreamLength() == fs.n
    assert ji.getMaximumError() == fs.error
    assert ji.getNumActiveItems() == len(fs.counts)
    for v, est, lo, up in fs.top_k(10):
        assert ji.getEstimate(v) == est
        assert ji.getLowerBound(v) == lo
        assert ji.getUpperBound(v) == up


def test_fi_datasketches_to_ours_and_merge_back(spark, jds):
    ji = jds["Items"](64)
    for i in range(1000):
        ji.update("k%d" % (i % 40), i % 7 + 1)
    ours = fi_from_ds_bytes(bytes(ji.toByteArray(jds["serde"])))
    assert ours.n == ji.getStreamLength()
    assert ours.error == ji.getMaximumError()
    for v, est, lo, up in ours.top_k(5):
        assert ji.getEstimate(v) == est
    jj = _fi_instance(jds, fi_to_ds_bytes(ours))
    jj.merge(ji)
    assert jj.getStreamLength() == 2 * ji.getStreamLength()
    top = ours.top_k(1)[0]
    assert jj.getEstimate(top[0]) == 2 * top[1]


def test_fi_unicode_items(spark, jds):
    fs = FrequentStringsSketch(capacity=32)
    fs.update_batch(["héllo", "héllo", "δοκιμή", "绝对", "绝对", "绝对"])
    ji = _fi_instance(jds, fi_to_ds_bytes(fs))
    assert ji.getEstimate("绝对") == 3
    assert ji.getEstimate("héllo") == 2
    back = fi_from_ds_bytes(fi_to_ds_bytes(fs))
    assert back.counts == fs.counts


def test_why1_file_sketches_are_datasketches_parseable(
        spark, lineitem, jds, tmp_path):
    """End-to-end: the kll/frequent_items oneof payloads inside a WHY1
    file written by this engine heapify in datasketches-java — i.e. the
    file is reference-readable INCLUDING sketch state."""
    import whylogs_spark as wsp
    from whylogs_spark.io.why1 import _fields, write_why1

    from whylogs_spark.io.why1 import _read_uvarint

    view = wsp.profile(lineitem, columns=["l_quantity", "l_returnflag"])
    p = str(tmp_path / "ds.bin")
    write_why1(view, p)
    with open(p, "rb") as f:
        data = f.read()
    pos = 4
    ln, pos = _read_uvarint(data, pos)        # DatasetSegmentHeader
    pos += ln
    ln, pos = _read_uvarint(data, pos)        # DatasetProfileHeader
    hdr = data[pos:pos + ln]
    body_start = pos + ln
    paths, col_offs = {}, []
    for field, wire, val in _fields(hdr):
        if field == 5 and wire == 2:          # indexed metric paths
            idx = pth = None
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    idx = v2
                elif f2 == 2 and w2 == 2:
                    pth = v2.decode()
            paths[idx] = pth
        elif field == 2 and wire == 2:        # column offsets
            for f2, w2, v2 in _fields(val):
                if f2 == 2 and w2 == 2:
                    for f3, w3, v3 in _fields(v2):
                        if f3 == 1 and w3 == 0:
                            col_offs.append(v3)
    assert "frequent_items/frequent_strings" in paths.values()
    found = {"kll": 0, "fi": 0}
    for off in col_offs:
        cpos = body_start + off
        ln, cpos = _read_uvarint(data, cpos)  # ChunkHeader
        chdr = data[cpos:cpos + ln]
        cpos += ln
        chunk_len = 0
        for field, wire, val in _fields(chdr):
            if field == 3 and wire == 0:
                chunk_len = val
        for field, wire, val in _fields(data[cpos:cpos + chunk_len]):
            if field != 1 or wire != 2:
                continue
            comp_buf = b""
            for f2, w2, v2 in _fields(val):
                if f2 == 2 and w2 == 2:
                    comp_buf = v2
            for f2, w2, v2 in _fields(comp_buf):
                if f2 in (4, 6) and w2 == 2:
                    for f3, w3, v3 in _fields(v2):
                        if f3 != 1 or w3 != 2:
                            continue
                        if f2 == 6:           # kll oneof
                            assert _heapify(jds, v3).getN() > 0
                            found["kll"] += 1
                        else:                 # frequent_items oneof
                            ji = _fi_instance(jds, v3)
                            assert ji.getStreamLength() > 0
                            found["fi"] += 1
    assert found["kll"] >= 1 and found["fi"] >= 1
