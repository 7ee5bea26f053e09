"""Baseline + progressive JPEG decoder — stdlib + numpy, no image
libraries.

Scope: baseline/extended-sequential DCT (SOF0/SOF1) AND progressive
DCT (SOF2 — spectral selection, successive approximation, EOB runs,
interleaved and single-component scans), 8-bit precision, 1 or 3
components, any integer chroma subsampling (4:4:4 / 4:2:2 / 4:2:0 /
...), restart markers. Arithmetic coding, 12-bit precision and CMYK
return None — callers fall back to header-level features.

Reference scope: whylogs' ImageMetric decodes with PIL
(python/whylogs/extras/image_metric.py:57-110) and profiles the HSV /
entropy bundle; this decoder lets the same pixel-stat pipeline execute
on JPEG payloads in executors without PIL. The entropy pass is a
per-block Python loop (JPEG's Huffman stream is inherently serial
within a restart segment), but everything after it — dequantize,
de-zigzag, IDCT, upsample, colorspace — is vectorized numpy over all
blocks at once, and rows are decoded partition-parallel by the
mapInPandas caller.
"""

from __future__ import annotations

import struct
from typing import Optional

# Zigzag order: index i of the scan -> position in the 8x8 block.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _build_huff(counts, symbols):
    """Canonical JPEG Huffman table -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a byte-stuffing-free segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map the s-bit magnitude v to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(content: bytes, start: int):
    """Entropy-coded data from ``start`` -> (restart segments, end pos).

    Removes 0xFF00 byte stuffing; 0xFFD0-0xFFD7 restart markers split
    segments; any other marker terminates the scan.
    """
    segs = []
    cur = bytearray()
    i, n = start, len(content)
    while i < n:
        b = content[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = content[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


_IDCT_M = None


def _idct_matrix():
    global _IDCT_M
    if _IDCT_M is None:
        import numpy as np

        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        m = np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
        m[0, :] /= np.sqrt(2.0)
        _IDCT_M = m
    return _IDCT_M


def decode_jpeg(content: bytes):
    """Decode a baseline or progressive JPEG -> (H, W, 3) uint8 RGB
    array, or None."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        return None
    qt = {}       # id -> np.array(64) in zigzag order
    huff = {}     # (class, id) -> table dict
    sof = None    # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    prog_state = None  # cid -> per-component coefficient grid
    restart_interval = 0
    i, n = 2, len(content)
    try:
        while i + 4 <= n:
            if content[i] != 0xFF:
                i += 1
                continue
            marker = content[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:  # EOI
                break
            (seg_len,) = struct.unpack(">H", content[i + 2:i + 4])
            body = content[i + 4:i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(body):
                    prec, tid = body[j] >> 4, body[j] & 15
                    j += 1
                    if prec == 0:
                        vals = np.frombuffer(
                            body[j:j + 64], dtype=np.uint8
                        ).astype(np.int32)
                        j += 64
                    else:
                        vals = np.frombuffer(
                            body[j:j + 128], dtype=">u2"
                        ).astype(np.int32)
                        j += 128
                    if len(vals) != 64:
                        return None
                    qt[tid] = vals
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
                prec = body[0]
                h, w = struct.unpack(">HH", body[1:5])
                ncomp = body[5]
                if prec != 8 or ncomp not in (1, 3) or h < 1 or w < 1:
                    return None
                comps = []
                for c in range(ncomp):
                    cid = body[6 + c * 3]
                    samp = body[7 + c * 3]
                    comps.append((cid, samp >> 4, samp & 15,
                                  body[8 + c * 3]))
                sof = (int(h), int(w), comps)
                progressive = marker == 0xC2
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # arithmetic / lossless / hierarchical
            elif marker == 0xC4:  # DHT
                j = 0
                while j + 17 <= len(body):
                    tc, th = body[j] >> 4, body[j] & 15
                    counts = list(body[j + 1:j + 17])
                    nsym = sum(counts)
                    syms = list(body[j + 17:j + 17 + nsym])
                    if len(syms) != nsym:
                        return None
                    huff[(tc, th)] = _build_huff(counts, syms)
                    j += 17 + nsym
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS
                if sof is None:
                    return None
                ns = body[0]
                scan = []
                for c in range(ns):
                    cid = body[1 + c * 2]
                    tabs = body[2 + c * 2]
                    scan.append((cid, tabs >> 4, tabs & 15))
                segs, end = _split_entropy(content, i + 2 + seg_len)
                if not progressive:
                    return _decode_scan(sof, scan, qt, huff,
                                        restart_interval, segs)
                ss = body[1 + ns * 2]
                se = body[2 + ns * 2]
                ah = body[3 + ns * 2] >> 4
                al = body[3 + ns * 2] & 15
                if prog_state is None:
                    prog_state = _init_prog_state(sof)
                _decode_prog_scan(prog_state, sof, scan, huff,
                                  restart_interval, segs,
                                  ss, se, ah, al)
                i = end
                continue
            i += 2 + seg_len
        if progressive and prog_state is not None:
            return _assemble_progressive(sof, prog_state, qt)
    except (struct.error, IndexError, EOFError, ValueError, KeyError,
            OverflowError):
        # OverflowError: a hostile DHT can define a DC symbol > 31,
        # whose EXTENDed value overflows the int32 coefficient buffer
        return None
    return None


def _decode_scan(sof, scan, qt, huff, restart_interval, segs):
    import numpy as np

    h, w, comps = sof
    if len(scan) != len(comps):
        return None
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # Per scan component: sampling, tables, and a coefficient buffer
    # holding every block in MCU traversal order (entropy pass fills
    # it; everything downstream is batched numpy).
    info = []
    for cid, dc_id, ac_id in scan:
        if cid not in by_id:
            return None
        hs, vs, tq = by_id[cid]
        if (0, dc_id) not in huff or (1, ac_id) not in huff \
                or tq not in qt:
            return None
        info.append({
            "hs": hs, "vs": vs, "q": qt[tq],
            "dc": huff[(0, dc_id)], "ac": huff[(1, ac_id)],
            "coef": np.zeros((n_mcu * hs * vs, 64), dtype=np.int32),
        })

    mcu = 0
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(info)
    while mcu < n_mcu:
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(info)
        try:
            for ci, c in enumerate(info):
                nblk = c["hs"] * c["vs"]
                base = mcu * nblk
                for b in range(nblk):
                    row = c["coef"][base + b]
                    s = reader.decode_huff(c["dc"])
                    preds[ci] += _extend(reader.read_bits(s), s)
                    row[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(c["ac"])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break
                            k += 16
                        else:
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            row[k] = _extend(reader.read_bits(s), s)
                            k += 1
        except EOFError:
            # Truncated stream: keep what decoded so far (padding-bit
            # EOF on the final MCU is normal).
            if mcu < n_mcu - 1:
                return None
        mcu += 1

    planes = []
    for c in info:
        px = _dequant_idct(c["coef"], c["q"])
        hs, vs = c["hs"], c["vs"]
        # MCU traversal order -> plane: (mcuy, mcux, vs, hs, 8, 8)
        plane = px.reshape(mcuy, mcux, vs, hs, 8, 8) \
            .transpose(0, 2, 4, 1, 3, 5) \
            .reshape(mcuy * vs * 8, mcux * hs * 8)
        planes.append((plane, hs, vs))
    return _compose_rgb(planes, h, w, hmax, vmax)


def _dequant_idct(coef_rows, q):
    """(n, 64) zigzag coefficients + quant table -> (n, 8, 8) uint8
    spatial blocks (dequantize, de-zigzag, batched IDCT, level shift).
    Shared by the baseline and progressive paths."""
    import numpy as np

    unzig = np.argsort(np.array(ZIGZAG))  # block pos -> zigzag index
    m = _idct_matrix()
    deq = (coef_rows * q[None, :])[:, unzig].reshape(-1, 8, 8)
    spatial = np.einsum("ux,nuv,vy->nxy", m, deq.astype(np.float64), m)
    return np.clip(np.round(spatial) + 128.0, 0, 255).astype(np.uint8)


def _compose_rgb(planes, h, w, hmax, vmax):
    """[(plane, hs, vs), ...] -> (H, W, 3) uint8 RGB: nearest
    upsample of subsampled chroma, crop to the frame, grayscale
    replicate or BT.601 YCbCr -> RGB. Shared final stage of both
    decode paths."""
    import numpy as np

    full = []
    for plane, hs, vs in planes:
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.repeat(full[0][:, :, None], 3, axis=2)
    y = full[0].astype(np.float64)
    cb = full[1].astype(np.float64) - 128.0
    cr = full[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# --------------------------------------------------------- progressive

def _init_prog_state(sof):
    """Per-component coefficient grids for a progressive frame.

    ``coef`` is laid out on the FULL MCU-padded block grid
    (mcuy*vs, mcux*hs, 64) so interleaved scans index it directly;
    ``nbx``/``nby`` are the component's own block dims (ceil of its
    scaled size), the traversal space of non-interleaved scans —
    strictly inside the padded grid.
    """
    import numpy as np

    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    state = {}
    for cid, hs, vs, tq in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        state[cid] = {
            "coef": np.zeros((mcuy * vs, mcux * hs, 64),
                             dtype=np.int32),
            "nbx": -(-cw // 8),
            "nby": -(-ch // 8),
        }
    return state


def _ac_first(reader, table, row, ss, se, al, eobrun):
    """First scan of an AC band (Ah=0): run-length + EOB-run coding of
    the coefficients at Al precision (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC overflow")
            row[k] = _extend(reader.read_bits(s), s) << al
            k += 1
    return 0


def _ac_refine(reader, table, row, ss, se, al, eobrun):
    """Refinement scan of an AC band (Ah=Al+1): one correction bit per
    already-nonzero coefficient, new coefficients appear as +-1<<Al
    (T.81 G.1.2.3; structure follows the published standard's decode
    procedure)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(table)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: s stays 0, skip 16 zero-history coefficients
                val = 0
            else:
                if s != 1:
                    raise ValueError("bad refinement symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(row[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        row[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(row[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    row[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(state, sof, scan, huff, restart_interval, segs,
                      ss, se, ah, al):
    """Apply one progressive scan to the coefficient state. DC scans
    (Ss=0) may interleave several components (MCU traversal) or cover
    one (raster over its own block grid); AC scans are always
    single-component per the spec."""
    h, w, comps = sof
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for cid, _, _ in scan:
        if cid not in by_id:
            raise ValueError("unknown component in scan")

    seg_idx = 0
    reader = _BitReader(segs[0])

    if ss == 0:  # ---- DC scan
        if se != 0:
            raise ValueError("bad DC spectral range")
        interleaved = len(scan) > 1
        if interleaved:
            n_mcu = mcux * mcuy
        else:
            st0 = state[scan[0][0]]
            n_mcu = st0["nbx"] * st0["nby"]
        preds = {cid: 0 for cid, _, _ in scan}
        for mcu in range(n_mcu):
            if restart_interval and mcu \
                    and mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                preds = {cid: 0 for cid, _, _ in scan}
            try:
                for cid, dc_id, _ in scan:
                    hs, vs, _ = by_id[cid]
                    st = state[cid]
                    if interleaved:
                        my, mx = divmod(mcu, mcux)
                        blocks = [(my * vs + v, mx * hs + hh)
                                  for v in range(vs)
                                  for hh in range(hs)]
                    else:
                        blocks = [divmod(mcu, st["nbx"])]
                    for by, bx in blocks:
                        if ah == 0:
                            s = reader.decode_huff(huff[(0, dc_id)])
                            preds[cid] += _extend(
                                reader.read_bits(s), s)
                            st["coef"][by, bx, 0] = preds[cid] << al
                        elif reader.read_bit():
                            st["coef"][by, bx, 0] = \
                                int(st["coef"][by, bx, 0]) | (1 << al)
            except EOFError:
                # padding-bit EOF on the final MCU is normal (same
                # tolerance as the baseline path)
                if mcu < n_mcu - 1:
                    raise
        return

    # ---- AC scan: single component, raster over its block grid
    if len(scan) != 1 or se > 63 or ss > se:
        raise ValueError("bad AC scan")
    cid, _, ac_id = scan[0]
    st = state[cid]
    table = huff.get((1, ac_id))
    if table is None:
        raise ValueError("missing AC table")
    n_mcu = st["nbx"] * st["nby"]
    eobrun = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            eobrun = 0
        by, bx = divmod(mcu, st["nbx"])
        row = st["coef"][by, bx]
        try:
            if ah == 0:
                eobrun = _ac_first(reader, table, row, ss, se, al,
                                   eobrun)
            else:
                eobrun = _ac_refine(reader, table, row, ss, se, al,
                                    eobrun)
        except EOFError:
            # padding-bit EOF on the final MCU is normal
            if mcu < n_mcu - 1:
                raise


def _assemble_progressive(sof, state, qt):
    """Dequantize + IDCT + upsample + colorspace over the accumulated
    coefficient grids, via the tail stages shared with the baseline
    path (``_dequant_idct`` / ``_compose_rgb``); only the raster
    block layout differs."""
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            return None
        grid = state[cid]["coef"]
        nby, nbx = grid.shape[:2]
        px = _dequant_idct(grid.reshape(-1, 64), qt[tq])
        plane = px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(nby * 8, nbx * 8)
        planes.append((plane, hs, vs))
    return _compose_rgb(planes, h, w, hmax, vmax)


def sniff_is_progressive(content: bytes) -> Optional[bool]:
    """True if the payload is a progressive JPEG, False if baseline,
    None if not a JPEG."""
    if content[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xC0, 0xC1):
            return False
        if marker == 0xC2:
            return True
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9 or marker == 0xDA:
            return None
        try:
            (seg_len,) = struct.unpack(">H", content[i + 2:i + 4])
        except struct.error:
            return None
        i += 2 + seg_len
    return None
