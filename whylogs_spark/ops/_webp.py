"""Pure-Python lossless WebP (VP8L) decoder — no decode libraries.

Closes the last named gap in the lib-free pixel kernel
(ops/multimodal.py): lossless WebP now decodes to RGB for the
reference-parity pixel stats (reference relies on PIL outright,
python/whylogs/extras/image_metric.py:57-110). Lossy VP8 stays
header-sniff only (a full DCT codec is out of scope, and lossless is
the archival/crawl-data arm of the format).

Implements the VP8L bitstream: LSB-first bit reading, canonical prefix
codes (simple 1/2-symbol and code-length-coded forms, incl. the
max_symbol early-stop), optional color cache, LZ77 backward references
with the 120-entry 2D distance map, meta-prefix (per-tile code groups),
and all four transforms — predictor (14 modes), color (signed 3.5
fixed-point cross-channel), subtract-green, and color-indexing with
sub-byte pixel bundling. Sub-resolution images (transform data, meta
codes, palette) decode through the same recursive image stream.

Spec/implementation notes the tests pin:
- Prefix codes are read bit-by-bit MSB-of-code-first over the LSB-first
  byte stream (the DEFLATE packing convention).
- The 2D distance map is exactly the 120 offsets the spec's plane-code
  byte (dy << 4 | 8 - dx) can encode — dy in [0, 7], dx in [-7, 8],
  strictly past — ordered by dx^2 + dy^2, then larger dy first, then
  positive dx before negative; the generation rule reproduces the
  spec's table (head and tail transcribed and pinned in tests).
- Predictor neighbors: the top-right of the last column wraps to the
  first pixel of the CURRENT row (the behavior of a contiguous
  row-major buffer, which real encoders target).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

__all__ = ["decode_vp8l", "decode_webp", "sniff_webp"]

_MAX_PIXELS = 1 << 26  # 64 MPx decode guard (bomb protection)

# code-length-code read order (shared with DEFLATE-style CL coding)
CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
            14, 15)

NUM_LITERALS = 256
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40
_CACHE_MUL = 0x1E35A7BD


def _distance_map() -> List[Tuple[int, int]]:
    # domain = exactly the offsets the spec's plane-code byte can
    # encode: (dy << 4) | (8 - dx) with dy in [0, 7] and 8 - dx a
    # nibble, i.e. dx in [-7, 8]; excluding non-strict-past offsets
    # (dy == 0 and dx <= 0) leaves exactly 120 entries — the table is
    # the full domain ordered, not a truncation
    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    assert len(cands) == 120
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              0 if p[0] > 0 else 1))
    return cands


DIST_MAP = _distance_map()


class _BitReader:
    """LSB-first bit reader (bytes are consumed low bit first, like
    DEFLATE). Windowed — a small shift register refilled byte-by-byte,
    so each read is O(1) regardless of payload size (a whole-payload
    bignum would make every read O(payload) and the decode loop
    quadratic)."""

    __slots__ = ("data", "n_data", "byte_i", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.n_data = len(data)
        self.byte_i = 0
        self.buf = 0
        self.cnt = 0

    def read(self, n: int) -> int:
        buf = self.buf
        cnt = self.cnt
        while cnt < n:
            i = self.byte_i
            if i >= self.n_data:
                raise ValueError("VP8L: bitstream overrun")
            buf |= self.data[i] << cnt
            self.byte_i = i + 1
            cnt += 8
        v = buf & ((1 << n) - 1)
        self.buf = buf >> n
        self.cnt = cnt - n
        return v


class _Huffman:
    """Canonical prefix decoder: {(length, code): symbol}, with the
    first-read bit as the code's MSB. A zero-length (single-symbol)
    code consumes no bits. Short codes (<= _LUT_BITS) decode via a
    one-shot peek table built lazily on first use; longer codes fall
    back to the bit-by-bit walk."""

    _LUT_BITS = 11

    __slots__ = ("table", "const", "max_len", "lut", "lut_bits")

    def __init__(self, table, const=None, max_len=0):
        self.table = table
        self.const = const
        self.max_len = max_len
        self.lut = None
        self.lut_bits = 0

    def _build_lut(self):
        k = min(self.max_len, self._LUT_BITS)
        lut = [None] * (1 << k)
        for (length, code), sym in self.table.items():
            if length > k:
                continue
            # the code arrives MSB-first, so its stream image in the
            # LSB-first window is the bit-reversed code
            rev = 0
            c = code
            for _ in range(length):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            for x in range(rev, 1 << k, 1 << length):
                lut[x] = (sym, length)
        self.lut = lut
        self.lut_bits = k

    @classmethod
    def from_lengths(cls, lengths: List[int]) -> "_Huffman":
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            return cls(None, const=used[0][1])
        # kraft check + canonical assignment (DEFLATE convention:
        # codes assigned in (length, symbol) order)
        used.sort()
        kraft = sum(1 << (15 - l) for l, _ in used)
        if kraft != (1 << 15):
            raise ValueError("VP8L: invalid prefix code (kraft)")
        table = {}
        code = 0
        prev_len = used[0][0]
        for l, s in used:
            code <<= (l - prev_len)
            prev_len = l
            table[(l, code)] = s
            code += 1
        return cls(table, max_len=used[-1][0])

    def read_symbol(self, br: _BitReader) -> int:
        if self.const is not None:
            return self.const
        if self.lut is None:
            self._build_lut()
        # refill the window to the peek width (stream tail: a valid
        # symbol fits in whatever bits remain, so a partial window
        # peeks with implicit zero padding)
        k = self.lut_bits
        while br.cnt < k and br.byte_i < br.n_data:
            br.buf |= br.data[br.byte_i] << br.cnt
            br.byte_i += 1
            br.cnt += 8
        hit = self.lut[br.buf & ((1 << k) - 1)]
        if hit is not None:
            sym, length = hit
            if length > br.cnt:
                raise ValueError("VP8L: bitstream overrun")
            br.buf >>= length
            br.cnt -= length
            return sym
        # long-code fallback: bit-by-bit walk
        code = 0
        length = 0
        table = self.table
        while length < 16:
            code = (code << 1) | br.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: bad prefix code in stream")


def _read_code_lengths(br: _BitReader, alphabet: int) -> _Huffman:
    """The non-simple prefix-code form: a code-length code, then the
    symbol lengths (with 16/17/18 repeats and the optional max_symbol
    early stop, which bounds decoded CL symbols, not filled slots)."""
    n_cl = 4 + br.read(4)
    cl_lengths = [0] * len(CL_ORDER)
    for i in range(n_cl):
        cl_lengths[CL_ORDER[i]] = br.read(3)
    cl_dec = _Huffman.from_lengths(cl_lengths)

    if br.read(1):  # use max_symbol
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    sym = 0
    prev = 8
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_dec.read_symbol(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet:
                raise ValueError("VP8L: repeat overflows alphabet")
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
        if sym > alphabet:
            raise ValueError("VP8L: repeat overflows alphabet")
    return _Huffman.from_lengths(lengths)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Huffman:
    if br.read(1):  # simple code: 1 or 2 symbols, read verbatim
        nsym = br.read(1) + 1
        first_bits = 8 if br.read(1) else 1
        s0 = br.read(first_bits)
        if s0 >= alphabet:
            raise ValueError("VP8L: simple-code symbol out of range")
        if nsym == 1:
            return _Huffman(None, const=s0)
        s1 = br.read(8)
        if s1 >= alphabet:
            raise ValueError("VP8L: simple-code symbol out of range")
        # code bit 0 -> first symbol in READ order (not sorted)
        return _Huffman({(1, 0): s0, (1, 1): s1}, max_len=1)
    return _read_code_lengths(br, alphabet)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length / distance prefix decoding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _read_groups(br: _BitReader, w: int, h: int, cache_bits: int,
                 level0: bool):
    """Prefix-code groups + (level-0 only) the meta-prefix tile image.
    Returns (groups, meta or None, meta_shift)."""
    meta = None
    meta_shift = 0
    n_groups = 1
    if level0 and br.read(1):  # use meta prefix codes
        meta_shift = 2 + br.read(3)
        mw = _div_round_up(w, meta_shift)
        mh = _div_round_up(h, meta_shift)
        meta = _decode_image(br, mw, mh, level0=False)
        n_groups = 0
        for px in meta:
            idx = (px >> 8) & 0xFFFF  # (red << 8) | green
            if idx + 1 > n_groups:
                n_groups = idx + 1
    if n_groups > 1 << 16:
        raise ValueError("VP8L: meta group count out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0
    sizes = (NUM_LITERALS + NUM_LENGTH_CODES + cache_size,
             NUM_LITERALS, NUM_LITERALS, NUM_LITERALS,
             NUM_DISTANCE_CODES)
    groups = []
    for _ in range(n_groups):
        groups.append(tuple(_read_prefix_code(br, s) for s in sizes))
    return groups, meta, meta_shift


def _decode_image(br: _BitReader, w: int, h: int,
                  level0: bool) -> List[int]:
    """The shared entropy-coded image stream: optional color cache,
    prefix-code groups, then the LZ77 + literal + cache-ref symbol
    loop. Returns w*h ARGB pixels in scan order."""
    if w < 1 or h < 1 or w * h > _MAX_PIXELS:
        raise ValueError("VP8L: image dims out of range")
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache bits")
    groups, meta, meta_shift = _read_groups(br, w, h, cache_bits, level0)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0

    npx = w * h
    out = [0] * npx
    pos = 0
    meta_w = _div_round_up(w, meta_shift) if meta is not None else 0
    # bound methods as locals: the symbol loop is the decode hot path
    bound = [(g[0].read_symbol, g[1].read_symbol, g[2].read_symbol,
              g[3].read_symbol, g[4].read_symbol) for g in groups]
    read_green, read_red, read_blue, read_alpha, read_dist = bound[0]
    while pos < npx:
        if meta is not None:
            x = pos % w
            y = pos // w
            mpx = meta[(y >> meta_shift) * meta_w + (x >> meta_shift)]
            gi = (mpx >> 8) & 0xFFFF
            (read_green, read_red, read_blue, read_alpha,
             read_dist) = bound[gi]
        s = read_green(br)
        if s < NUM_LITERALS:
            r = read_red(br)
            b = read_blue(br)
            a = read_alpha(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[((_CACHE_MUL * px) & 0xFFFFFFFF) >> cache_shift] \
                    = px
        elif s < NUM_LITERALS + NUM_LENGTH_CODES:
            length = _prefix_value(s - NUM_LITERALS, br)
            dist_code = _prefix_value(read_dist(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npx:
                raise ValueError("VP8L: backward reference out of range")
            if cache is not None:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    pos += 1
                    cache[((_CACHE_MUL * px) & 0xFFFFFFFF)
                          >> cache_shift] = px
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache ref without color cache")
            out[pos] = cache[s - NUM_LITERALS - NUM_LENGTH_CODES]
            pos += 1
    return out


# ------------------------------------------------------------- transforms
def _avg2(a: int, b: int) -> int:
    return (((a >> 24) + (b >> 24)) >> 1) << 24 \
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16 \
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8 \
        | (((a & 0xFF) + (b & 0xFF)) >> 1)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(t: int, l: int, tl: int) -> int:
    # distance of the full gradient to T vs L; ties pick T
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        tc = (t >> sh) & 0xFF
        lc = (l >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p = tc + lc - tlc
        pa += abs(p - tc)
        pb += abs(p - lc)
    return t if pa <= pb else l


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= _clip255(v) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        v = a + int((a - b) / 2)  # truncation toward zero, like C
        out |= _clip255(v) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _add_pixels(px: int, pred: int) -> int:
    return ((((px >> 24) + (pred >> 24)) & 0xFF) << 24
            | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF)
            << 16
            | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
            | (((px & 0xFF) + (pred & 0xFF)) & 0xFF))


def _inv_predictor(pixels: List[int], w: int, h: int, size_bits: int,
                   modes: List[int]) -> None:
    bw = _div_round_up(w, size_bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = (modes[(y >> size_bits) * bw + (x >> size_bits)]
                        >> 8) & 0xFF
                l = pixels[i - 1]
                t = pixels[i - w]
                tl = pixels[i - w - 1]
                # last column: top-right wraps to the first pixel of
                # the current row (contiguous-buffer behavior)
                tr = pixels[i - w + 1] if x + 1 < w else pixels[row]
                pred = _predict(mode, l, t, tr, tl)
            pixels[i] = _add_pixels(pixels[i], pred)


def _ct_delta(t: int, c: int) -> int:
    # signed 3.5 fixed point: (int8)t * (int8)c >> 5 (arithmetic)
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(pixels: List[int], w: int, h: int,
                         size_bits: int, ctes: List[int]) -> None:
    bw = _div_round_up(w, size_bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = ctes[(y >> size_bits) * bw + (x >> size_bits)]
            g2r = cte & 0xFF            # blue channel
            g2b = (cte >> 8) & 0xFF     # green channel
            r2b = (cte >> 16) & 0xFF    # red channel
            px = pixels[i]
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_subtract_green(pixels: List[int]) -> None:
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(pixels: List[int], w: int, h: int, xbits: int,
                     palette: List[int]) -> List[int]:
    lut = palette + [0] * (256 - len(palette))  # OOB index -> 0
    if xbits == 0:
        return [lut[(px >> 8) & 0xFF] for px in pixels]
    packed_w = _div_round_up(w, xbits)
    bits_px = 8 >> xbits
    mask = (1 << bits_px) - 1
    out = [0] * (w * h)
    for y in range(h):
        src_row = y * packed_w
        dst_row = y * w
        for x in range(w):
            green = (pixels[src_row + (x >> xbits)] >> 8) & 0xFF
            k = x & ((1 << xbits) - 1)
            out[dst_row + x] = lut[(green >> (k * bits_px)) & mask]
    return out


# ------------------------------------------------------------ entry points
def decode_vp8l(payload: bytes):
    """Decode a raw VP8L chunk payload -> (H, W, 3) uint8 RGB array
    (alpha dropped, matching the PNG path's pixel-stat convention)."""
    import numpy as np

    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha_is_used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    if w * h > _MAX_PIXELS:
        raise ValueError("VP8L: image too large")

    # transforms, in read order; each records the width it operates at
    transforms = []
    seen = set()
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            size_bits = br.read(3) + 2
            data = _decode_image(
                br, _div_round_up(cur_w, size_bits),
                _div_round_up(h, size_bits), level0=False)
            transforms.append(("pred", cur_w, size_bits, data))
        elif ttype == 1:  # color transform
            size_bits = br.read(3) + 2
            data = _decode_image(
                br, _div_round_up(cur_w, size_bits),
                _div_round_up(h, size_bits), level0=False)
            transforms.append(("color", cur_w, size_bits, data))
        elif ttype == 2:  # subtract green
            transforms.append(("subg", cur_w, 0, None))
        else:  # color indexing
            n_colors = br.read(8) + 1
            raw = _decode_image(br, n_colors, 1, level0=False)
            palette = []
            acc = 0
            for px in raw:  # per-channel cumulative sum, u8 wrap
                acc = _add_pixels(px, acc)
                palette.append(acc)
            if n_colors <= 2:
                xbits = 3
            elif n_colors <= 4:
                xbits = 2
            elif n_colors <= 16:
                xbits = 1
            else:
                xbits = 0
            transforms.append(("index", cur_w, xbits, palette))
            cur_w = _div_round_up(cur_w, xbits) if xbits else cur_w

    pixels = _decode_image(br, cur_w, h, level0=True)
    for kind, t_w, arg, data in reversed(transforms):
        if kind == "index":
            pixels = _inv_color_index(pixels, t_w, h, arg, data)
        elif kind == "subg":
            _inv_subtract_green(pixels)
        elif kind == "color":
            _inv_color_transform(pixels, t_w, h, arg, data)
        else:
            _inv_predictor(pixels, t_w, h, arg, data)

    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgb = np.empty((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = (arr >> 16) & 0xFF
    rgb[:, :, 1] = (arr >> 8) & 0xFF
    rgb[:, :, 2] = arr & 0xFF
    return rgb


def _riff_chunks(content: bytes):
    if len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"WEBP":
        return
    pos = 12
    n = len(content)
    while pos + 8 <= n:
        tag = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = content[pos + 8:pos + 8 + size]
        yield tag, body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned


def decode_webp(content: bytes):
    """RIFF container -> VP8L pixel decode. Returns the RGB array, or
    None when the file is lossy (VP8) / animated — those stay in the
    header-sniff tier."""
    for tag, body in _riff_chunks(content):
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            return None
    return None


def sniff_webp(content: bytes):
    """Header-only dimensions: VP8L 14-bit dims, VP8X canvas dims, or
    the VP8 lossy keyframe header."""
    for tag, body in _riff_chunks(content):
        if tag == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
            br = _BitReader(body[1:5])
            return br.read(14) + 1, br.read(14) + 1
        if tag == b"VP8X" and len(body) >= 10:
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h
        if tag == b"VP8 " and len(body) >= 10 \
                and body[3:6] == b"\x9d\x01\x2a":
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            return w, h
    return None, None
