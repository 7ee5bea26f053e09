"""Property tests (hypothesis) for the round's pure-Python kernels:
progressive JPEG refinement coding, PackBits, Adam7 geometry, and the
AUC sketch walk. These run WITHOUT Spark — driver-side kernel math —
so hypothesis can afford hundreds of examples."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------- PackBits roundtrip

def _packbits_encode(data: bytes) -> bytes:
    """Spec-faithful PackBits encoder (runs >= 3 encoded as repeats,
    else literals) — independent of the test-suite's literal-only
    encoder, so decode is checked against a second implementation."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        lit = bytearray()
        while j < n and len(lit) < 128:
            run = 1
            while j + run < n and run < 3 and data[j + run] == data[j]:
                run += 1
            if run >= 3:
                break
            lit += data[j:j + run]
            j += run
        out += bytes([len(lit) - 1]) + lit
        i = j
    return bytes(out)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_packbits_roundtrip(data):
    from whylogs_spark.ops.multimodal import _packbits

    assert _packbits(_packbits_encode(data), len(data)) == data


# ------------------------------------------- Adam7 pass geometry

@settings(max_examples=200, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40))
def test_adam7_passes_partition_every_pixel(w, h):
    """The seven passes must cover each (x, y) exactly once for any
    image geometry — the invariant the interlaced decode relies on."""
    from whylogs_spark.ops.multimodal import _ADAM7

    seen = set()
    for x0, y0, dx, dy in _ADAM7:
        for y in range(y0, h, dy):
            for x in range(x0, w, dx):
                assert (x, y) not in seen
                seen.add((x, y))
    assert len(seen) == w * h


# ------------------------------- progressive AC coding roundtrip

@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-40, 40), min_size=1, max_size=63))
def test_ac_refinement_events_reconstruct_exact(band):
    """Encode a coefficient band with the test encoder's first +
    refinement event generators, replay them through the REAL decoder
    (_ac_first/_ac_refine via a bit-faithful reader), and require the
    exact coefficients back — for arbitrary bands, including long
    zero runs (ZRL paths) and history/new interleavings."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_jpeg import (_BitWriter, _ac_first_events,
                           _ac_refine_events, _flat_table)

    from whylogs_spark.ops._jpeg import (_BitReader, _ac_first,
                                         _ac_refine)

    n = len(band)
    first = _ac_first_events(
        [(abs(v) >> 1) * (1 if v >= 0 else -1) for v in band])
    refine = _ac_refine_events(band)

    row = np.zeros(64, dtype=np.int32)
    ss, se = 1, n  # band occupies zigzag positions 1..n
    for events, fn, al, ah in ((first, _ac_first, 1, 0),
                               (refine, _ac_refine, 0, 1)):
        syms = [e[0] for e in events]
        cnts, table_syms, codes = _flat_table(syms or [0])
        # rebuild the decoder-side table
        from whylogs_spark.ops._jpeg import _build_huff
        table = _build_huff(cnts, table_syms)
        wtr = _BitWriter()
        for sym, bits in events:
            ln, code = codes[sym]
            wtr.write(code, ln)
            for val, nb in bits:
                wtr.write(val, nb)
        wtr.align()
        # _BitWriter inserts JPEG 0xFF00 byte stuffing; _BitReader
        # expects the destuffed segment (the real pipeline destuffs in
        # _split_entropy before handing bits to the scan decoders)
        reader = _BitReader(bytes(wtr.out).replace(b"\xff\x00",
                                                   b"\xff"))
        if ah == 0:
            _ac_first(reader, table, row, ss, se, al, 0)
        else:
            _ac_refine(reader, table, row, ss, se, al, 0)
    assert list(row[1:n + 1]) == band


# --------------------------------------------- AUC sketch walk

@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(0, 1, allow_nan=False), min_size=1,
                max_size=60),
       st.lists(st.floats(0, 1, allow_nan=False), min_size=1,
                max_size=60))
def test_sketch_auc_equals_bruteforce_below_compaction(pos, neg):
    """Below the KLL compaction threshold the sketch is exact, so the
    merge-walk AUC must equal the O(n*m) brute force, ties at half."""
    from whylogs_spark.core.model_perf import roc_auc_from_sketches
    from whylogs_spark.core.sketches import KllSketch

    sp_, sn = KllSketch(256), KllSketch(256)
    sp_.update_batch(np.array(pos))
    sn.update_batch(np.array(neg))
    got = roc_auc_from_sketches(sp_, sn)
    wins = sum(1.0 for p in pos for q in neg if p > q) \
        + 0.5 * sum(1.0 for p in pos for q in neg if p == q)
    want = wins / (len(pos) * len(neg))
    assert abs(got - want) < 1e-9
