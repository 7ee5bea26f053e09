"""Perceptual image hashing (aHash/dHash/pHash) + the generic
Hamming-banded near-dup join.

Hash semantics are pinned against independent per-bit recomputation;
the DCT matrix is cross-checked against the O(n^2)-per-coefficient
textbook double loop; the banded pair join is verified against a
brute-force O(n^2) scan with planted near pairs.
"""

import random
import struct as st

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.dedup import (hamming_neardup_pairs,
                                     image_neardup_pairs)
from whylogs_spark.ops.multimodal import (_dct_matrix, _resize_gray,
                                          perceptual_hashes,
                                          with_image_hashes)


def _bmp_bytes(pixels, w, h):
    """Minimal 24bpp BI_RGB BMP, bottom-up rows, 4-byte padded."""
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):
        row = b"".join(bytes(pixels[y * w + x][::-1]) for x in range(w))
        rows += row + b"\x00" * (stride - len(row))
    header = (b"BM" + st.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                        2835, 2835, 0, 0))
    return header + rows


def _gray_bmp(vals, w, h):
    return _bmp_bytes([(v, v, v) for v in vals], w, h)


def _noise(seed, n):
    rng = random.Random(seed)
    return [rng.randrange(256) for _ in range(n)]


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestHashSemantics:
    def test_ahash_bits_hand_computed(self):
        # 8x8 image: left half 0, right half 200 -> exact cell values
        vals = [(200 if x >= 4 else 0) for y in range(8) for x in range(8)]
        content = _gray_bmp(vals, 8, 8)
        ahash, dhash, phash = perceptual_hashes(content)
        # mean = 100; bits row-major MSB-first: each row 00001111
        expected = 0
        for y in range(8):
            for x in range(8):
                expected = (expected << 1) | (1 if x >= 4 else 0)
        expected = expected - (1 << 64) if expected >= 1 << 63 else expected
        assert ahash == expected

    def test_dhash_gradient_sign(self):
        # strictly increasing left->right: every left<right bit set
        vals = [x * 20 for y in range(9) for x in range(9)]
        content = _gray_bmp(vals, 9, 9)
        _, dhash, _ = perceptual_hashes(content)
        assert dhash == -1  # all 64 bits set (two's complement)

    def test_dct_matrix_vs_textbook(self):
        n = 8
        d = _dct_matrix(n)
        rng = np.random.RandomState(7)
        g = rng.rand(n, n)
        got = d @ g @ d.T
        ref = np.zeros((n, n))
        for u in range(n):
            for v in range(n):
                s = 0.0
                for i in range(n):
                    for j in range(n):
                        s += (g[i, j]
                              * np.cos(np.pi * (2 * i + 1) * u / (2 * n))
                              * np.cos(np.pi * (2 * j + 1) * v / (2 * n)))
                cu = np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n)
                cv = np.sqrt(1 / n) if v == 0 else np.sqrt(2 / n)
                ref[u, v] = cu * cv * s
        assert np.allclose(got, ref)

    def test_resize_gray_area_average(self):
        g = np.arange(16, dtype=np.float64).reshape(4, 4)
        out = _resize_gray(g, 2, 2)
        assert np.allclose(
            out, [[(0 + 1 + 4 + 5) / 4, (2 + 3 + 6 + 7) / 4],
                  [(8 + 9 + 12 + 13) / 4, (10 + 11 + 14 + 15) / 4]])
        up = _resize_gray(np.array([[1.0, 2.0]]), 1, 4)
        assert np.allclose(up, [[1, 1, 2, 2]])

    def test_identical_images_identical_hashes(self):
        c = _gray_bmp(_noise(1, 32 * 32), 32, 32)
        assert perceptual_hashes(c) == perceptual_hashes(c)

    def test_brightness_shift_small_distance(self):
        base = _noise(2, 32 * 32)
        shifted = [min(v + 15, 255) for v in base]
        h0 = perceptual_hashes(_gray_bmp(base, 32, 32))
        h1 = perceptual_hashes(_gray_bmp(shifted, 32, 32))
        # dHash (gradient sign) and pHash (AC coefs) are brightness-
        # robust; aHash moves a little via clipping
        assert _ham(h0[1], h1[1]) <= 6
        assert _ham(h0[2], h1[2]) <= 6

    def test_distinct_images_far_apart(self):
        h0 = perceptual_hashes(_gray_bmp(_noise(3, 32 * 32), 32, 32))
        h1 = perceptual_hashes(_gray_bmp(_noise(4, 32 * 32), 32, 32))
        for i in range(3):
            assert _ham(h0[i], h1[i]) > 10

    def test_undecodable_returns_none(self):
        assert perceptual_hashes(b"not an image") is None


class TestSparkKernel:
    def test_with_image_hashes_matches_local(self, spark):
        imgs = [(f"img{i}", _gray_bmp(_noise(i, 16 * 16), 16, 16))
                for i in range(6)]
        df = spark.createDataFrame(imgs, ["path", "content"])
        got = {r.path: (r.ahash, r.dhash, r.phash)
               for r in with_image_hashes(df).collect()}
        for p, c in imgs:
            assert got[p] == perceptual_hashes(c)

    def test_null_hash_for_undecodable(self, spark):
        df = spark.createDataFrame(
            [("bad", b"garbage")], ["path", "content"])
        r = with_image_hashes(df).collect()[0]
        assert (r.ahash, r.dhash, r.phash) == (None, None, None)

    def test_strict_raises(self, spark):
        df = spark.createDataFrame(
            [("bad", b"garbage")], ["path", "content"])
        with pytest.raises(Exception):
            with_image_hashes(df, strict=True).collect()

    def test_image_neardup_pairs_end_to_end(self, spark):
        base = _noise(10, 32 * 32)
        # one near-dup (tiny brightness lift), several distinct images
        rows = [("a", _gray_bmp(base, 32, 32)),
                ("b", _gray_bmp([min(v + 3, 255) for v in base], 32, 32))]
        rows += [(f"x{i}", _gray_bmp(_noise(20 + i, 32 * 32), 32, 32))
                 for i in range(4)]
        rows.append(("bad", b"garbage"))
        df = spark.createDataFrame(rows, ["path", "content"])
        pairs = image_neardup_pairs(df, method="dhash",
                                    max_hamming=3).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {("a", "b")}

    def test_method_validated(self, spark):
        df = spark.createDataFrame([("a", b"")], ["path", "content"])
        with pytest.raises(ValueError):
            image_neardup_pairs(df, method="md5")


class TestHammingBanding:
    def test_matches_bruteforce_with_planted_pairs(self, spark):
        rng = random.Random(42)
        sigs = [rng.getrandbits(64) for _ in range(60)]
        # plant near pairs at hamming 1, 2, 3 and a miss at 4
        for d in (1, 2, 3, 4):
            base = sigs[d]
            v = base
            positions = rng.sample(range(64), d)
            for p in positions:
                v ^= 1 << p
            sigs.append(v)

        def signed(u):
            return u - (1 << 64) if u >= 1 << 63 else u

        rows = [(i, signed(s)) for i, s in enumerate(sigs)]
        df = spark.createDataFrame(rows, ["doc_id", "sig"])
        got = {(p.id_a, p.id_b, p.hamming)
               for p in hamming_neardup_pairs(
                   df, "sig", max_hamming=3).collect()}
        expect = set()
        for i in range(len(sigs)):
            for j in range(i + 1, len(sigs)):
                h = bin(sigs[i] ^ sigs[j]).count("1")
                if h <= 3:
                    expect.add((i, j, h))
        assert got == expect
        assert len(expect) >= 3  # the planted 1/2/3 pairs are present

    def test_null_signatures_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 5), (2, 5), (3, None)],
            "doc_id: long, sig: long")
        got = hamming_neardup_pairs(df, "sig").collect()
        assert [(p.id_a, p.id_b, p.hamming) for p in got] == [(1, 2, 0)]

    def test_radius_guard(self, spark):
        df = spark.createDataFrame([(1, 5)], "doc_id: long, sig: long")
        with pytest.raises(ValueError):
            hamming_neardup_pairs(df, "sig", max_hamming=4)
