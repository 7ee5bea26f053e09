"""VP8L (lossless WebP) decoder tests: a self-contained spec-level
ENCODER lives here and round-trips through ops/_webp.py — the same
cross-implementation strategy as the GIF/JPEG codecs (two independent
readings of the bitstream spec must agree bit-exactly).

Coverage: literal / color-cache / LZ77 paths (plain + 2D-mapped
distances), simple and code-length-coded prefix codes, all 14
predictor modes, color transform, subtract-green, palette indexing at
every bundling width, meta-prefix groups, RIFF sniffing, and the
pixel-feature integration.
"""

import struct

import numpy as np
import pytest

from whylogs_spark.ops._webp import (CL_ORDER, DIST_MAP, decode_vp8l,
                                     decode_webp, sniff_webp)


# ------------------------------------------------------------ bit writer
class _BitWriter:
    def __init__(self):
        self.val = 0
        self.n = 0

    def write(self, nbits, value):
        nbits, value = int(nbits), int(value)  # np ints overflow on <<
        assert 0 <= value < (1 << nbits) if nbits else value == 0
        self.val |= value << self.n
        self.n += nbits

    def write_code(self, length, code):
        """Prefix codes go MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write(1, (code >> i) & 1)

    def bytes(self):
        return self.val.to_bytes((self.n + 7) // 8 or 1, "little")


# --------------------------------------------------- canonical code builder
def _canonical(lengths):
    """(length, symbol)-ordered canonical code assignment — must match
    the decoder's convention."""
    used = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev = used[0][0]
    for l, s in used:
        code <<= (l - prev)
        prev = l
        codes[s] = (l, code)
        code += 1
    return codes


def _balanced_lengths(symbols, alphabet):
    """A complete prefix code over the used symbols: k symbols get
    lengths L-1 / L with exact Kraft equality; more frequent symbols
    (list is ordered most-frequent-first) get the shorter lengths."""
    k = len(symbols)
    assert k >= 2
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k
    lengths = [0] * alphabet
    for i, s in enumerate(symbols):
        lengths[s] = (L - 1) if i < n_short else L
    return lengths


class _Code:
    """One prefix code: knows how to write its own definition and its
    symbols."""

    def __init__(self, freqs, alphabet):
        used = sorted(freqs, key=lambda s: (-freqs[s], s))
        self.alphabet = alphabet
        if len(used) == 1:
            self.kind = "single"
            self.sym = used[0]
            self.codes = {}
        elif len(used) == 2 and max(used) < 256:
            self.kind = "simple2"
            self.pair = used
            self.codes = {used[0]: (1, 0), used[1]: (1, 1)}
        else:
            self.kind = "normal"
            self.lengths = _balanced_lengths(used, alphabet)
            self.codes = _canonical(self.lengths)

    def write_def(self, bw):
        if self.kind == "single":
            bw.write(1, 1)  # simple
            bw.write(1, 0)  # 1 symbol
            if self.sym > 1:
                bw.write(1, 1)
                bw.write(8, self.sym)
            else:
                bw.write(1, 0)
                bw.write(1, self.sym)
            return
        if self.kind == "simple2":
            bw.write(1, 1)
            bw.write(1, 1)  # 2 symbols
            s0, s1 = self.pair
            if s0 > 1:
                bw.write(1, 1)
                bw.write(8, s0)
            else:
                bw.write(1, 0)
                bw.write(1, s0)
            bw.write(8, s1)
            return
        bw.write(1, 0)  # code-length-coded
        lengths = self.lengths
        cl_used = sorted(set(lengths))
        if len(cl_used) == 1:
            cl_lengths = {cl_used[0]: 1}
        else:
            bal = _balanced_lengths(cl_used, 19)
            cl_lengths = {s: bal[s] for s in cl_used}
        assert all(v <= 7 for v in cl_lengths.values())
        n_codes = max(CL_ORDER.index(s) for s in cl_used) + 1
        n_codes = max(n_codes, 4)
        bw.write(4, n_codes - 4)
        for i in range(n_codes):
            bw.write(3, cl_lengths.get(CL_ORDER[i], 0))
        bw.write(1, 0)  # no max_symbol trick
        if len(cl_used) == 1:
            return  # single CL symbol: zero bits per length
        cl_codes = _canonical([cl_lengths.get(s, 0) for s in range(19)])
        for l in lengths:
            bw.write_code(*cl_codes[l])

    def write_sym(self, bw, s):
        if self.kind == "single":
            assert s == self.sym
            return
        bw.write_code(*self.codes[s])


# ------------------------------------------------------------- LZ77 pieces
def _prefix_encode(v):
    """Inverse of the decoder's length/distance prefix decoding."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, extra, v - offset - 1
    raise AssertionError(f"value {v} out of prefix range")


_CACHE_MUL = 0x1E35A7BD


def _tokenize(pixels, w, cache_bits, use_lz77, mapped_dist):
    """Greedy tokens: dist-1 runs (and dist-w column copies when
    mapped_dist), color-cache refs, else literals."""
    cache = [None] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0
    toks = []
    pos = 0
    npx = len(pixels)

    def note(px):
        if cache is not None:
            cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> shift] = px

    while pos < npx:
        px = pixels[pos]
        if use_lz77 and pos > 0 and px == pixels[pos - 1]:
            run = 1
            while pos + run < npx and pixels[pos + run] == px \
                    and run < 4096:
                run += 1
            if run >= 2:
                dist_val = 2 if mapped_dist else 121  # (1,0) or 1+120
                toks.append(("copy", run, dist_val))
                for i in range(run):
                    note(pixels[pos + i])
                pos += run
                continue
        if cache is not None:
            idx = ((_CACHE_MUL * px) & 0xFFFFFFFF) >> shift
            if cache[idx] == px:
                toks.append(("cache", idx))
                pos += 1
                continue
        toks.append(("lit", px))
        note(px)
        pos += 1
    return toks


def _encode_image(bw, pixels, w, h, cache_bits=0, use_lz77=False,
                  mapped_dist=False, level0=False, meta=None):
    """The entropy-coded image stream (encoder side)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
    else:
        bw.write(1, 0)
    if level0:
        if meta is not None:
            shift, groups_of = meta
            bw.write(1, 1)
            bw.write(3, shift - 2)
            mw = (w + (1 << shift) - 1) >> shift
            mh = (h + (1 << shift) - 1) >> shift
            meta_px = [0xFF000000 | (groups_of(x, y) << 8)
                       for y in range(mh) for x in range(mw)]
            _encode_image(bw, meta_px, mw, mh)
        else:
            bw.write(1, 0)

    n_groups = 1
    group_of = lambda pos: 0
    if meta is not None:
        shift, groups_of = meta
        mw = (w + (1 << shift) - 1) >> shift
        n_groups = 1 + max(groups_of(x, y)
                           for y in range((h + (1 << shift) - 1) >> shift)
                           for x in range(mw))
        group_of = lambda pos: groups_of((pos % w) >> shift,
                                         (pos // w) >> shift)

    toks = _tokenize(pixels, w, cache_bits, use_lz77, mapped_dist)
    cache_size = (1 << cache_bits) if cache_bits else 0
    freqs = [[{} for _ in range(5)] for _ in range(n_groups)]

    def bump(g, i, s):
        freqs[g][i][s] = freqs[g][i].get(s, 0) + 1

    pos = 0
    for t in toks:
        g = group_of(pos)
        if t[0] == "lit":
            px = t[1]
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
            pos += 1
        elif t[0] == "copy":
            bump(g, 0, 256 + _prefix_encode(t[1])[0])
            bump(g, 4, _prefix_encode(t[2])[0])
            pos += t[1]
        else:
            bump(g, 0, 280 + t[1])
            pos += 1
    sizes = (256 + 24 + cache_size, 256, 256, 256, 40)
    codes = []
    for g in range(n_groups):
        row = []
        for i, size in enumerate(sizes):
            f = freqs[g][i] or {0: 1}  # unused codes: 1-symbol stub
            row.append(_Code(f, size))
        codes.append(row)
        for c in row:
            c.write_def(bw)

    pos = 0
    for t in toks:
        green, red, blue, alpha, dist = codes[group_of(pos)]
        if t[0] == "lit":
            px = t[1]
            green.write_sym(bw, (px >> 8) & 0xFF)
            red.write_sym(bw, (px >> 16) & 0xFF)
            blue.write_sym(bw, px & 0xFF)
            alpha.write_sym(bw, (px >> 24) & 0xFF)
            pos += 1
        elif t[0] == "copy":
            lc, lx, lv = _prefix_encode(t[1])
            green.write_sym(bw, 256 + lc)
            if lx:
                bw.write(lx, lv)
            dc, dx, dv = _prefix_encode(t[2])
            dist.write_sym(bw, dc)
            if dx:
                bw.write(dx, dv)
            pos += t[1]
        else:
            green.write_sym(bw, 280 + t[1])
            pos += 1


# --------------------------------------------------------- full VP8L file
def _argb(arr):
    a = arr.astype(np.uint32)
    alpha = a[:, :, 3] if arr.shape[2] == 4 else np.full(
        arr.shape[:2], 255, np.uint32)
    return ((alpha << 24) | (a[:, :, 0] << 16) | (a[:, :, 1] << 8)
            | a[:, :, 2]).flatten().tolist()


def _sub(px, pred):
    return (((((px >> 24) - (pred >> 24)) & 0xFF) << 24)
            | ((((px >> 16) - (pred >> 16)) & 0xFF & 0xFF) << 16)
            | (((((px >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
            | (((px & 0xFF) - (pred & 0xFF)) & 0xFF))


def encode_vp8l(arr, cache_bits=0, use_lz77=False, mapped_dist=False,
                subtract_green=False, predictor=None, palette=False,
                color_cte=None, meta=None):
    """Forward VP8L encoder (spec-level, test-side)."""
    from whylogs_spark.ops import _webp as W

    h, w = arr.shape[:2]
    bw = _BitWriter()
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 0)  # alpha hint
    bw.write(3, 0)  # version
    pixels = _argb(arr)
    cur_w = w

    if predictor is not None:
        size_bits = 4
        bw.write(1, 1)
        bw.write(2, 0)
        bw.write(3, size_bits - 2)
        bwv = (cur_w + (1 << size_bits) - 1) >> size_bits
        bhv = (h + (1 << size_bits) - 1) >> size_bits
        _encode_image(bw, [0xFF000000 | (predictor << 8)] * (bwv * bhv),
                      bwv, bhv)
        res = list(pixels)
        for y in range(h):
            row = y * cur_w
            for x in range(w):
                i = row + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[i - 1]
                elif x == 0:
                    pred = pixels[i - cur_w]
                else:
                    l, t = pixels[i - 1], pixels[i - cur_w]
                    tl = pixels[i - cur_w - 1]
                    tr = pixels[i - cur_w + 1] if x + 1 < w \
                        else pixels[row]
                    pred = W._predict(predictor, l, t, tr, tl)
                res[i] = _sub(pixels[i], pred)
        pixels = res

    if color_cte is not None:
        g2r, g2b, r2b = color_cte
        size_bits = 4
        bw.write(1, 1)
        bw.write(2, 1)
        bw.write(3, size_bits - 2)
        bwv = (cur_w + (1 << size_bits) - 1) >> size_bits
        bhv = (h + (1 << size_bits) - 1) >> size_bits
        cte_px = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _encode_image(bw, [cte_px] * (bwv * bhv), bwv, bhv)
        res = []
        for px in pixels:
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            r_enc = (r - W._ct_delta(g2r, g)) & 0xFF
            b_enc = (b - W._ct_delta(g2b, g) - W._ct_delta(r2b, r)) \
                & 0xFF
            res.append((px & 0xFF00FF00) | (r_enc << 16) | b_enc)
        pixels = res

    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        res = []
        for px in pixels:
            g = (px >> 8) & 0xFF
            r = (((px >> 16) & 0xFF) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            res.append((px & 0xFF00FF00) | (r << 16) | b)
        pixels = res

    if palette:
        colors = sorted(set(pixels))
        n = len(colors)
        assert n <= 256
        bw.write(1, 1)
        bw.write(2, 3)
        bw.write(8, n - 1)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub(c, prev))
            prev = c
        _encode_image(bw, deltas, n, 1)
        index_of = {c: i for i, c in enumerate(colors)}
        xbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if xbits:
            packed_w = (cur_w + (1 << xbits) - 1) >> xbits
            bits_px = 8 >> xbits
            packed = []
            for y in range(h):
                for px0 in range(packed_w):
                    green = 0
                    for k in range(1 << xbits):
                        x = (px0 << xbits) + k
                        if x < cur_w:
                            green |= index_of[pixels[y * cur_w + x]] \
                                << (k * bits_px)
                    packed.append(0xFF000000 | (green << 8))
            pixels = packed
            cur_w = packed_w
        else:
            pixels = [0xFF000000 | (index_of[px] << 8) for px in pixels]

    bw.write(1, 0)  # end of transforms
    _encode_image(bw, pixels, cur_w, h, cache_bits=cache_bits,
                  use_lz77=use_lz77, mapped_dist=mapped_dist,
                  level0=True, meta=meta)
    return b"\x2f" + bw.bytes()


def wrap_riff(payload):
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _rand_rgb(rng, w, h):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------------- tests
def test_roundtrip_literals():
    rng = np.random.default_rng(1)
    arr = _rand_rgb(rng, 13, 7)
    out = decode_vp8l(encode_vp8l(arr))
    np.testing.assert_array_equal(out, arr)


def test_roundtrip_color_cache():
    rng = np.random.default_rng(2)
    # few distinct colors -> the cache actually hits
    arr = rng.integers(0, 4, size=(9, 17, 3), dtype=np.uint8) * 60
    payload = encode_vp8l(arr, cache_bits=6)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_roundtrip_lz77_plain_and_mapped():
    rng = np.random.default_rng(3)
    arr = _rand_rgb(rng, 11, 5)
    arr[:, 4:9] = arr[:, 4:5]  # horizontal runs
    for mapped in (False, True):
        payload = encode_vp8l(arr, use_lz77=True, mapped_dist=mapped)
        np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_distance_map_matches_spec():
    # head and code-97+ rows of the spec's 2D offset table,
    # transcribed — pins the generation rule at both ends
    assert DIST_MAP[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
        (-3, 2), (0, 4), (4, 0)]
    assert DIST_MAP[96:104] == [
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2),
        (6, 6)]
    assert DIST_MAP[110:] == [
        (8, 4), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7),
        (-7, 7), (8, 6), (8, 7)]
    assert len(DIST_MAP) == 120
    assert len(set(DIST_MAP)) == 120
    # the spec's plane-code byte is (dy << 4) | (8 - dx): every entry
    # must be encodable, so dx=-8 / dy=8 can never appear
    assert all(0 <= dy <= 7 and 0 <= 8 - dx <= 15
               for dx, dy in DIST_MAP)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_predictor_modes(mode):
    rng = np.random.default_rng(100 + mode)
    arr = _rand_rgb(rng, 19, 9)
    payload = encode_vp8l(arr, predictor=mode)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_roundtrip_subtract_green():
    rng = np.random.default_rng(4)
    arr = _rand_rgb(rng, 8, 8)
    payload = encode_vp8l(arr, subtract_green=True)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_roundtrip_color_transform():
    rng = np.random.default_rng(5)
    arr = _rand_rgb(rng, 21, 6)
    payload = encode_vp8l(arr, color_cte=(0x23, 0xE9, 0x71))
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


@pytest.mark.parametrize("n_colors", [2, 3, 10, 40])
def test_roundtrip_palette_bundling(n_colors):
    rng = np.random.default_rng(200 + n_colors)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(7, 23))
    arr = palette[idx]
    payload = encode_vp8l(arr, palette=True)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_roundtrip_meta_groups():
    rng = np.random.default_rng(6)
    arr = _rand_rgb(rng, 20, 8)
    meta = (2, lambda tx, ty: 1 if tx >= 3 else 0)
    payload = encode_vp8l(arr, meta=meta)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_roundtrip_stacked_transforms():
    rng = np.random.default_rng(7)
    arr = _rand_rgb(rng, 16, 10)
    payload = encode_vp8l(arr, subtract_green=True, predictor=7,
                          cache_bits=5, use_lz77=True)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_single_color_simple_codes():
    arr = np.full((6, 6, 3), 77, dtype=np.uint8)
    payload = encode_vp8l(arr)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_two_color_simple_codes():
    arr = np.zeros((5, 8, 3), dtype=np.uint8)
    arr[::2] = (1, 0, 1)  # symbols 0/1: the 1-bit simple form
    payload = encode_vp8l(arr)
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


def test_riff_wrapping_and_sniff():
    rng = np.random.default_rng(8)
    arr = _rand_rgb(rng, 33, 21)
    content = wrap_riff(encode_vp8l(arr))
    assert sniff_webp(content) == (33, 21)
    np.testing.assert_array_equal(decode_webp(content), arr)


def test_sniff_vp8x_and_lossy():
    vp8x = (b"RIFF" + struct.pack("<I", 22) + b"WEBP" + b"VP8X"
            + struct.pack("<I", 10) + b"\x00\x00\x00\x00"
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))
    assert sniff_webp(vp8x) == (640, 480)
    lossy_body = b"\x00\x00\x00\x9d\x01\x2a" \
        + struct.pack("<HH", 320, 240) + b"\x00" * 8
    lossy = (b"RIFF" + struct.pack("<I", 12 + len(lossy_body)) + b"WEBP"
             + b"VP8 " + struct.pack("<I", len(lossy_body)) + lossy_body)
    assert sniff_webp(lossy) == (320, 240)
    assert decode_webp(lossy) is None  # lossy stays sniff-only


def test_truncated_and_corrupt_raise_cleanly():
    rng = np.random.default_rng(9)
    payload = encode_vp8l(_rand_rgb(rng, 12, 12))
    with pytest.raises(ValueError):
        decode_vp8l(payload[: len(payload) // 2])
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00" + payload[1:])


def test_pixel_features_integration():
    from whylogs_spark.ops.multimodal import (_numpy_pixel_features,
                                              _sniff_image)

    rng = np.random.default_rng(10)
    arr = _rand_rgb(rng, 24, 16)
    content = wrap_riff(encode_vp8l(arr, cache_bits=4, use_lz77=True))
    feats = _numpy_pixel_features(content)
    assert feats is not None
    fmt, w, h = feats[0], feats[1], feats[2]
    assert (fmt, w, h) == ("webp", 24, 16)
    assert _sniff_image(content) == ("webp", 24, 16)
    # stats must equal the direct computation on the known array
    from whylogs_spark.ops.multimodal import _entropy_bits, _rgb_to_hsv_u8
    hsv = _rgb_to_hsv_u8(arr).reshape(-1, 3)
    assert feats[4] == pytest.approx(_entropy_bits(arr))
    assert feats[5] == pytest.approx(float(hsv.mean(axis=0)[0]))


# -------------------------------------------------------- property tests
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.integers(1, 24),
       st.integers(1, 24), st.booleans(), st.booleans(),
       st.sampled_from([0, 3, 6]), st.booleans())
def test_roundtrip_property(seed, w, h, lz77, subg, cache_bits, pred):
    rng = np.random.default_rng(seed)
    # low-entropy palette-ish images exercise cache/LZ77 harder
    arr = rng.integers(0, 5, size=(h, w, 3), dtype=np.uint8) * 50
    payload = encode_vp8l(
        arr, cache_bits=cache_bits, use_lz77=lz77, subtract_green=subg,
        predictor=(rng.integers(0, 14) if pred else None))
    np.testing.assert_array_equal(decode_vp8l(payload), arr)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_garbage_never_hangs_or_leaks(data):
    # arbitrary bytes must either decode or raise ValueError — no other
    # exception class escapes, no unbounded allocation
    try:
        decode_vp8l(b"\x2f" + data)
    except ValueError:
        pass


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.data())
def test_bitflip_corruption_is_contained(seed, data):
    # flip 1-4 bits anywhere in a VALID payload: the decoder must
    # either still decode (possibly wrong pixels — the flip may hit
    # an unused literal) or raise ValueError; never another exception
    # class, never a hang, never an oversized allocation
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 6, size=(9, 9, 3), dtype=np.uint8) * 40
    payload = bytearray(encode_vp8l(arr, cache_bits=4, use_lz77=True))
    n_flips = data.draw(st.integers(1, 4))
    for _ in range(n_flips):
        i = data.draw(st.integers(1, len(payload) - 1))  # keep magic
        payload[i] ^= 1 << data.draw(st.integers(0, 7))
    try:
        out = decode_vp8l(bytes(payload))
        assert out.shape[0] * out.shape[1] <= (1 << 14) ** 2
    except ValueError:
        pass
