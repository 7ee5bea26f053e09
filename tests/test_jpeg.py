"""Baseline JPEG decoder tests.

Ground truth comes from a self-contained numpy JPEG *encoder* defined
here (flat 9-bit Huffman tables — legal, just inefficient): encode a
known RGB array, decode with the library kernel, and bound the error
analytically (quant tables of all ones make the roundtrip
rounding-only). Covers 4:4:4, 4:2:0, grayscale, restart markers,
16-bit quant tables, and progressive/corrupt rejection.
"""

import struct

import numpy as np
import pytest

from whylogs_spark.ops._jpeg import (ZIGZAG, _idct_matrix, decode_jpeg,
                                     sniff_is_progressive)


# --------------------------------------------------------------- encoder
def _fdct_blocks(plane):
    """(H, W) float plane -> (n, 64) quant-ready DCT coefs in zigzag."""
    m = _idct_matrix()
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", m, blocks, m)
    return coef.reshape(-1, 64)[:, np.array(ZIGZAG)]


def _pad_to(plane, bh, bw):
    h, w = plane.shape
    ph, pw = -(-h // bh) * bh, -(-w // bw) * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _flat_table(symbols):
    """All symbols at code length 9 — valid canonical JPEG Huffman."""
    syms = sorted(set(symbols))
    assert len(syms) <= 256
    counts = [0] * 16
    counts[8] = len(syms)  # length 9
    codes = {s: (9, i) for i, s in enumerate(syms)}
    return counts, syms, codes

def _mag_bits(v):
    s = int(abs(v)).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


def _block_symbols(row):
    """Zigzag coef row -> [(sym, (nbits, bits)), ...] for AC coding."""
    out = []
    k = 1
    while k < 64:
        run = 0
        while k < 64 and row[k] == 0:
            run += 1
            k += 1
        if k == 64:
            out.append((0x00, (0, 0)))  # EOB
            break
        while run > 15:
            out.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s, bits = _mag_bits(int(row[k]))
        out.append(((run << 4) | s, (s, bits)))
        k += 1
    return out


def encode_jpeg(rgb, subsample=(1, 1), qval=1, restart=0, qt16=False):
    """Minimal baseline JFIF encoder: luma sampling = ``subsample``,
    chroma 1x1; flat quant value ``qval``; optional restart interval
    and 16-bit DQT precision. rgb may be (H, W, 3) or (H, W) gray."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    sh, sv = (1, 1) if gray else subsample
    if gray:
        planes = [rgb.astype(np.float64)]
        samps = [(1, 1)]
    else:
        x = rgb.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        # chroma downsample by block mean
        ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
        cbp = _pad_to(cb, sv, sh).reshape(ph // sv, sv, pw // sh, sh) \
            .mean(axis=(1, 3))
        crp = _pad_to(cr, sv, sh).reshape(ph // sv, sv, pw // sh, sh) \
            .mean(axis=(1, 3))
        planes = [y, cbp, crp]
        samps = [(sh, sv), (1, 1), (1, 1)]

    qtab = np.full(64, qval, dtype=np.int64)
    mcux = -(-w // (8 * sh))
    mcuy = -(-h // (8 * sv))
    comp_coef = []
    for plane, (chs, cvs) in zip(planes, samps):
        th, tw = mcuy * cvs * 8, mcux * chs * 8
        padded = np.pad(plane,
                        ((0, th - plane.shape[0]),
                         (0, tw - plane.shape[1])), mode="edge")
        coef = np.round(_fdct_blocks(padded) / qtab).astype(np.int64)
        # reorder blocks from raster to MCU traversal
        nby, nbx = th // 8, tw // 8
        idx = np.arange(nby * nbx).reshape(nby, nbx)
        order = []
        for my in range(mcuy):
            for mx in range(mcux):
                for vy in range(cvs):
                    for vx in range(chs):
                        order.append(idx[my * cvs + vy, mx * chs + vx])
        comp_coef.append(coef[np.array(order)])

    # symbol passes: table 0 = luma, table 1 = chroma
    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    n_mcu = mcux * mcuy

    def scan_blocks(emit):
        preds = [0] * len(comp_coef)
        for mcu in range(n_mcu):
            if restart and mcu and mcu % restart == 0:
                preds = [0] * len(comp_coef)
                emit("restart", mcu, None, None)
            for ci, coef in enumerate(comp_coef):
                tid = 0 if ci == 0 else 1
                chs, cvs = samps[ci]
                nblk = chs * cvs
                for b in range(nblk):
                    row = coef[mcu * nblk + b]
                    diff = int(row[0]) - preds[ci]
                    preds[ci] = int(row[0])
                    emit("dc", tid, *_mag_bits(diff))
                    for sym, (s, bits) in _block_symbols(row):
                        emit("ac", tid, sym, (s, bits))

    def collect(kind, tid, a, b):
        if kind == "dc":
            dc_syms[tid].append(a)
        elif kind == "ac":
            ac_syms[tid].append(a)

    scan_blocks(collect)
    ntab = 1 if gray else 2
    dct = {t: _flat_table(dc_syms[t] or [0]) for t in range(ntab)}
    act = {t: _flat_table(ac_syms[t] or [0]) for t in range(ntab)}

    wtr = _BitWriter()
    rst_cnt = [0]

    def emit(kind, tid, a, b):
        if kind == "restart":
            wtr.align()
            wtr.out.append(0xFF)
            wtr.out.append(0xD0 + (rst_cnt[0] % 8))
            rst_cnt[0] += 1
            return
        if kind == "dc":
            ln, code = dct[tid][2][a]
            wtr.write(code, ln)
            wtr.write(b, a)  # a = s bits, b = magnitude bits
        else:
            ln, code = act[tid][2][a]
            wtr.write(code, ln)
            s, bits = b
            wtr.write(bits, s)

    scan_blocks(emit)
    wtr.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = b"\xff\xd8"
    if qt16:
        out += seg(0xDB, bytes([0x10]) + b"".join(
            struct.pack(">H", int(v)) for v in qtab))
    else:
        out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qtab))
    ncomp = 1 if gray else 3
    sofb = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        chs, cvs = samps[ci]
        sofb += bytes([ci + 1, (chs << 4) | cvs, 0])
    out += seg(0xC0, sofb)
    for t in range(ntab):
        cnts, syms, _ = dct[t]
        out += seg(0xC4, bytes([0x00 | t]) + bytes(cnts) + bytes(syms))
        cnts, syms, _ = act[t]
        out += seg(0xC4, bytes([0x10 | t]) + bytes(cnts) + bytes(syms))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sosb = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sosb += bytes([ci + 1, (t << 4) | t])
    sosb += bytes([0, 63, 0])
    out += seg(0xDA, sosb)
    out += bytes(wtr.out) + b"\xff\xd9"
    return out


# ---------------------------------------------------- progressive encoder

def _ac_first_events(vals):
    """AC band values (already point-transformed) -> first-scan
    symbol/extra-bit events with ZRL and per-block EOB."""
    events = []
    run = 0
    for v in vals:
        if v == 0:
            run += 1
            continue
        while run > 15:
            events.append((0xF0, []))
            run -= 16
        s, bits = _mag_bits(int(v))
        events.append((((run << 4) | s), [(bits, s)]))
        run = 0
    if run:
        events.append((0x00, []))  # EOB covers the trailing zeros
    return events


def _ac_refine_events(vals):
    """AC band values (full precision, Ah=1 -> Al=0 refinement) ->
    events mirroring the decoder's G.1.2.3 walk: correction bits for
    history-nonzero coefficients interleave positionally; new
    coefficients code run/1 + sign; EOB flushes the tail corrections."""
    hist_nz = [(abs(int(v)) >> 1) != 0 for v in vals]
    newly = [not hist_nz[i] and abs(int(v)) == 1
             for i, v in enumerate(vals)]
    corr = [abs(int(v)) & 1 for v in vals]
    sign = [1 if int(v) > 0 else 0 for v in vals]
    events = []
    k = 0
    n = len(vals)
    while k < n:
        j = next((i for i in range(k, n) if newly[i]), None)
        if j is None:
            bits = [(corr[i], 1) for i in range(k, n) if hist_nz[i]]
            events.append((0x00, bits))
            return events
        r = sum(1 for i in range(k, j) if not hist_nz[i])
        while r > 15:
            cnt = 0
            bits = []
            while cnt < 16:
                if hist_nz[k]:
                    bits.append((corr[k], 1))
                else:
                    cnt += 1
                k += 1
            events.append((0xF0, bits))
            r -= 16
        bits = [(sign[j], 1)]
        bits += [(corr[i], 1) for i in range(k, j) if hist_nz[i]]
        events.append((((r << 4) | 1), bits))
        k = j + 1
    return events


def encode_jpeg_progressive(rgb, subsample=(1, 1), qval=1, restart=0):
    """Progressive JFIF encoder exercising all four scan kinds: one
    interleaved DC first scan at Al=1, a DC refinement, then per
    component two spectral AC bands (1-5, 6-63) each as a first scan
    at Al=1 plus a refinement to Al=0. Flat per-scan Huffman tables;
    optional restart interval in every scan."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    sh, sv = (1, 1) if gray else subsample
    if gray:
        planes = [rgb.astype(np.float64)]
        samps = [(1, 1)]
    else:
        x = rgb.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
        cbp = _pad_to(cb, sv, sh).reshape(ph // sv, sv, pw // sh, sh) \
            .mean(axis=(1, 3))
        crp = _pad_to(cr, sv, sh).reshape(ph // sv, sv, pw // sh, sh) \
            .mean(axis=(1, 3))
        planes = [y, cbp, crp]
        samps = [(sh, sv), (1, 1), (1, 1)]

    qtab = np.full(64, qval, dtype=np.int64)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    grids = []   # (nby_full, nbx_full, 64) raster-order coefficients
    dims = []    # (nbx, nby) non-interleaved traversal dims
    for plane, (chs, cvs) in zip(planes, samps):
        th, tw = mcuy * cvs * 8, mcux * chs * 8
        padded = np.pad(plane,
                        ((0, th - plane.shape[0]),
                         (0, tw - plane.shape[1])), mode="edge")
        coef = np.round(_fdct_blocks(padded) / qtab).astype(np.int64)
        grids.append(coef.reshape(th // 8, tw // 8, 64))
        cw = -(-w * chs // hmax)
        ch_ = -(-h * cvs // vmax)
        dims.append((-(-cw // 8), -(-ch_ // 8)))

    ncomp = len(planes)

    def dc_events(refine):
        events = []
        preds = [0] * ncomp
        n_mcu = mcux * mcuy
        for mcu in range(n_mcu):
            if restart and mcu and mcu % restart == 0:
                events.append(("rst",))
                preds = [0] * ncomp
            my, mx = divmod(mcu, mcux)
            for ci in range(ncomp):
                chs, cvs = samps[ci]
                for v in range(cvs):
                    for hh in range(chs):
                        dc = int(grids[ci][my * cvs + v,
                                           mx * chs + hh, 0])
                        if refine:
                            events.append(("raw", [(dc & 1, 1)]))
                        else:
                            val = dc >> 1
                            s, bits = _mag_bits(val - preds[ci])
                            preds[ci] = val
                            events.append(("sym", s, [(bits, s)]))
        return events

    def ac_events(ci, ss, se, refine):
        events = []
        nbx, nby = dims[ci]
        for mcu in range(nbx * nby):
            if restart and mcu and mcu % restart == 0:
                events.append(("rst",))
            by, bx = divmod(mcu, nbx)
            band = grids[ci][by, bx, ss:se + 1]
            if refine:
                evs = _ac_refine_events(list(band))
            else:
                shifted = [(abs(int(v)) >> 1) * (1 if v >= 0 else -1)
                           for v in band]
                evs = _ac_first_events(shifted)
            events.extend(("sym", sym, bits) for sym, bits in evs)
        return events

    scan_list = [
        ("dc", None, 0, 0, 0, 1, dc_events(False)),
        ("dc", None, 0, 0, 1, 0, dc_events(True)),
    ]
    for ci in range(ncomp):
        scan_list.append(("ac", ci, 1, 5, 0, 1, ac_events(ci, 1, 5, 0)))
        scan_list.append(
            ("ac", ci, 6, 63, 0, 1, ac_events(ci, 6, 63, 0)))
    for ci in range(ncomp):
        scan_list.append(("ac", ci, 1, 5, 1, 0, ac_events(ci, 1, 5, 1)))
        scan_list.append(
            ("ac", ci, 6, 63, 1, 0, ac_events(ci, 6, 63, 1)))

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qtab))
    sofb = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        chs, cvs = samps[ci]
        sofb += bytes([ci + 1, (chs << 4) | cvs, 0])
    out += seg(0xC2, sofb)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))

    for kind, ci, ss, se, ah, al, events in scan_list:
        syms = [e[1] for e in events if e[0] == "sym"]
        tclass = 0 if kind == "dc" else 1
        cnts, table_syms, codes = _flat_table(syms or [0])
        out += seg(0xC4, bytes([(tclass << 4) | 0]) + bytes(cnts)
                   + bytes(table_syms))
        if kind == "dc":
            sosb = bytes([ncomp]) + b"".join(
                bytes([c + 1, 0x00]) for c in range(ncomp))
        else:
            sosb = bytes([1, ci + 1, 0x00])
        sosb += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sosb)
        wtr = _BitWriter()
        rst_cnt = 0
        for e in events:
            if e[0] == "rst":
                wtr.align()
                wtr.out.append(0xFF)
                wtr.out.append(0xD0 + (rst_cnt % 8))
                rst_cnt += 1
            elif e[0] == "sym":
                ln, code = codes[e[1]]
                wtr.write(code, ln)
                for bits, nb in e[2]:
                    wtr.write(bits, nb)
            else:  # raw
                for bits, nb in e[1]:
                    wtr.write(bits, nb)
        wtr.align()
        out += bytes(wtr.out)
    return out + b"\xff\xd9"


def _test_image(h, w, seed=7):
    """Smooth gradient + low-amplitude texture — JPEG-friendly."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / max(w - 1, 1))
    g = (yy * 255 / max(h - 1, 1))
    b = ((xx + yy) * 255 / max(h + w - 2, 1))
    img = np.stack([r, g, b], axis=2) + rng.normal(0, 3, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- tests
def test_idct_matrix_orthonormal():
    m = _idct_matrix()
    assert np.allclose(m @ m.T, np.eye(8), atol=1e-12)


def test_roundtrip_444_near_exact():
    img = _test_image(40, 56)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec is not None and dec.shape == (40, 56, 3)
    # qt=1: error = DCT rounding + two colorspace roundings only
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 2.0
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 12


def test_roundtrip_non_multiple_of_8_dims():
    img = _test_image(17, 23, seed=3)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec is not None and dec.shape == (17, 23, 3)
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 2.0


def test_roundtrip_420_subsampling():
    img = _test_image(32, 32, seed=11)
    dec = decode_jpeg(encode_jpeg(img, subsample=(2, 2)))
    assert dec is not None and dec.shape == (32, 32, 3)
    # chroma is smooth, so 2x2 mean + nearest upsample stays close
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 4.0


def test_roundtrip_422_subsampling():
    img = _test_image(24, 40, seed=5)
    dec = decode_jpeg(encode_jpeg(img, subsample=(2, 1)))
    assert dec is not None and dec.shape == (24, 40, 3)
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 4.0


def test_roundtrip_grayscale():
    img = _test_image(16, 16)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(img))
    assert dec is not None and dec.shape == (16, 16, 3)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])
    assert np.mean(np.abs(dec[:, :, 0].astype(int) - img.astype(int))) \
        < 1.5


def test_restart_markers():
    img = _test_image(48, 48, seed=13)
    enc = encode_jpeg(img, restart=2)
    assert b"\xff\xdd" in enc  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    dec = decode_jpeg(enc)
    assert dec is not None
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 2.0


def test_quantization_coarse_still_decodes():
    img = _test_image(24, 24)
    dec = decode_jpeg(encode_jpeg(img, qval=16))
    assert dec is not None
    # coarse quant: recognizable but lossy
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 12.0


def test_16bit_quant_tables():
    img = _test_image(16, 24, seed=2)
    dec = decode_jpeg(encode_jpeg(img, qt16=True))
    assert dec is not None
    assert np.mean(np.abs(dec.astype(int) - img.astype(int))) < 2.0


def test_rejects_malformed_and_garbage():
    img = _test_image(16, 16)
    enc = bytearray(encode_jpeg(img))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2: baseline scan params now
    # claim a progressive frame; the Ss=0/Se=63 scan is invalid there
    assert decode_jpeg(bytes(enc)) is None
    assert sniff_is_progressive(bytes(enc)) is True
    assert sniff_is_progressive(encode_jpeg(img)) is False
    assert decode_jpeg(b"\xff\xd8truncated garbage") is None
    assert decode_jpeg(b"not a jpeg") is None
    assert sniff_is_progressive(b"not a jpeg") is None


# ------------------------------------------------------ progressive tests

def test_progressive_roundtrip_matches_baseline():
    """The full scan script (DC first+refine, two AC bands per comp,
    first+refine) reconstructs the SAME coefficients the baseline
    stream carries, so both decodes must agree almost exactly."""
    img = _test_image(40, 56, seed=17)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog is not None and prog.shape == (40, 56, 3)
    assert np.array_equal(prog, base)
    assert sniff_is_progressive(encode_jpeg_progressive(img)) is True


def test_progressive_non_multiple_of_8():
    img = _test_image(17, 23, seed=3)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog is not None and prog.shape == (17, 23, 3)
    assert np.array_equal(prog, base)


def test_progressive_420_subsampling():
    """4:2:0: luma's non-interleaved AC scans traverse its OWN block
    grid (3 cols at w=20), strictly inside the MCU-padded grid."""
    img = _test_image(20, 20, seed=11)
    base = decode_jpeg(encode_jpeg(img, subsample=(2, 2)))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample=(2, 2)))
    assert prog is not None and prog.shape == (20, 20, 3)
    assert np.array_equal(prog, base)


def test_progressive_grayscale():
    img = _test_image(16, 16)[:, :, 0]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog is not None
    assert np.array_equal(prog, base)


def test_progressive_restart_markers():
    img = _test_image(32, 24, seed=13)
    enc = encode_jpeg_progressive(img, restart=3)
    assert b"\xff\xdd" in enc
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(enc)
    assert prog is not None
    assert np.array_equal(prog, base)


def test_progressive_coarse_quant():
    """Coarse quantization drives most AC coefficients to zero —
    long EOB runs and ZRLs in both first and refinement scans."""
    img = _test_image(48, 40, seed=29)
    base = decode_jpeg(encode_jpeg(img, qval=16))
    prog = decode_jpeg(encode_jpeg_progressive(img, qval=16))
    assert prog is not None
    assert np.array_equal(prog, base)


def test_progressive_truncated_rejected():
    img = _test_image(32, 32)
    enc = encode_jpeg_progressive(img)
    assert decode_jpeg(enc[: len(enc) // 3]) is None


def test_progressive_hostile_mutations_never_crash():
    enc = bytearray(encode_jpeg_progressive(_test_image(16, 16)))
    for pos in range(20, len(enc), max(len(enc) // 60, 1)):
        bad = bytearray(enc)
        bad[pos] ^= 0xA5
        try:
            decode_jpeg(bytes(bad))
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"decode_jpeg raised {exc!r} at mutation {pos}")


def test_progressive_pixel_features_libfree():
    from whylogs_spark.ops.multimodal import _numpy_pixel_features

    img = _test_image(24, 32, seed=9)
    feats = _numpy_pixel_features(encode_jpeg_progressive(img))
    assert feats is not None
    fmt, w, h = feats[0], feats[1], feats[2]
    assert (fmt, w, h) == ("jpeg", 32, 24)
    v_src = img.max(axis=2).mean()
    assert abs(feats[9] - v_src) < 3.0


def test_truncated_entropy_rejected():
    img = _test_image(32, 32)
    enc = encode_jpeg(img)
    assert decode_jpeg(enc[: len(enc) // 2]) is None


def test_pixel_features_decode_jpeg_libfree():
    from whylogs_spark.ops.multimodal import _numpy_pixel_features

    img = _test_image(24, 32, seed=9)
    feats = _numpy_pixel_features(encode_jpeg(img))
    assert feats is not None
    fmt, w, h = feats[0], feats[1], feats[2]
    assert (fmt, w, h) == ("jpeg", 32, 24)
    # brightness mean of the decode tracks the source (HSV V channel =
    # max(R,G,B); compare against the source's own V mean)
    v_src = img.max(axis=2).mean()
    assert abs(feats[9] - v_src) < 3.0


def test_decoder_hostile_bytes_never_crash():
    """Random/mutated bytes must yield None (fall back to header
    features), never an uncaught exception."""
    rng = np.random.default_rng(123)
    for i in range(50):
        blob = bytes(rng.integers(0, 256, rng.integers(4, 400),
                                  dtype=np.uint8))
        decode_jpeg(b"\xff\xd8" + blob)  # any return; must not raise
    # structured corruption: flip bytes inside a valid stream
    enc = bytearray(encode_jpeg(_test_image(16, 16)))
    for pos in range(20, len(enc), max(len(enc) // 40, 1)):
        bad = bytearray(enc)
        bad[pos] ^= 0xA5
        try:
            decode_jpeg(bytes(bad))  # any return is fine; no raise
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"decode_jpeg raised {exc!r} at mutation {pos}")


# ----------------------------------------------------------- GIF decode

def _lzw_literal_stream(indices, mcs):
    """Encode palette indices as a valid LZW stream using the classic
    no-compression trick: emit CLEAR before every literal so the code
    width never grows. Decoders must handle this per the GIF spec."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i in indices:
        emit(i)
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _synthetic_gif(w, h, palette, indices, interlaced=False):
    import math

    ncol = max(2, 1 << max(1, math.ceil(math.log2(len(palette)))))
    mcs = max(2, ncol.bit_length() - 1)
    ncol = 1 << mcs
    hdr = b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    hdr += bytes([0x80 | (mcs - 1), 0, 0])  # GCT present, size 2^mcs
    gct = bytearray()
    for i in range(ncol):
        gct += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    if interlaced:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        rows = [indices[r * w:(r + 1) * w] for r in order]
        indices = [i for row in rows for i in row]
    desc = (b"\x2C" + b"\x00" * 4
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0x40 if interlaced else 0]))
    data = _lzw_literal_stream(indices, mcs)
    blocks = bytearray([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return bytes(hdr) + bytes(gct) + desc + bytes(blocks) + b"\x3B"


def test_gif_decode_known_pixels():
    import numpy as np

    from whylogs_spark.ops.multimodal import _decode_gif

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = [0, 1, 2, 3,
           3, 2, 1, 0,
           1, 1, 2, 2]
    gif = _synthetic_gif(4, 3, pal, idx)
    arr = _decode_gif(gif)
    assert arr.shape == (3, 4, 3)
    want = np.array([pal[i] for i in idx],
                    dtype=np.uint8).reshape(3, 4, 3)
    assert (arr == want).all()


def test_gif_decode_interlaced():
    import numpy as np

    from whylogs_spark.ops.multimodal import _decode_gif

    pal = [(i * 16, i * 8, i * 4) for i in range(8)]
    h, w = 10, 3
    idx = [(r * 7 + c) % 8 for r in range(h) for c in range(w)]
    plain = _decode_gif(_synthetic_gif(w, h, pal, idx))
    inter = _decode_gif(_synthetic_gif(w, h, pal, idx, interlaced=True))
    assert plain is not None and inter is not None
    assert (plain == inter).all()


def test_gif_sniff_and_pixel_kernel():
    from whylogs_spark.ops.multimodal import (_numpy_pixel_features,
                                              _sniff_image)

    pal = [(0, 0, 0), (255, 255, 255)]
    gif = _synthetic_gif(6, 4, pal, [0, 1] * 12)
    assert _sniff_image(gif) == ("gif", 6, 4)
    feats = _numpy_pixel_features(gif)
    assert feats is not None
    fmt, w, h = feats[0], feats[1], feats[2]
    assert (fmt, w, h) == ("gif", 6, 4)
    # half black / half white: V mean = 127.5
    assert abs(feats[9] - 127.5) < 1e-6


def test_gif_corrupt_payloads_degrade():
    from whylogs_spark.ops.multimodal import (_decode_gif,
                                              _numpy_pixel_features)

    assert _decode_gif(b"GIF89a") is None
    # truncated pixel data must raise/None inside the guarded kernel,
    # not leak an exception
    pal = [(1, 2, 3), (4, 5, 6)]
    gif = _synthetic_gif(8, 8, pal, [0, 1] * 32)
    assert _numpy_pixel_features(gif[:30]) is None


def test_progressive_padding_eof_on_final_scan_tolerated():
    """Dropping the final entropy byte + EOI can leave the last
    scan's last MCU reading into (absent) padding — the same file
    class the baseline path tolerates; decode must keep the image."""
    img = np.full((8, 8), 128, dtype=np.uint8)  # flat: tiny scans
    enc = encode_jpeg_progressive(img, qval=16)
    assert decode_jpeg(enc) is not None
    truncated = enc[:-3]  # strip EOI (2) + final entropy byte
    dec = decode_jpeg(truncated)
    assert dec is not None and dec.shape == (8, 8, 3)
