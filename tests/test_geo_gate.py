"""Armor for the geo gate queries: the synthetic coordinate grid must
keep every pair far from (a) the 300 km radius threshold and (b) the
5-decimal rounding ties, so last-ulp libm sin/cos differences between
engines can never flip a row or a digit at the driver."""

import math


def _pts(n, mult_key):
    out = []
    for k in range(1, n + 1):
        lat = ((k * 37) % 12000) / 100.0 - 60.0
        lon = ((k * 91) % 34000) / 100.0 - 170.0
        out.append((k, lat, lon))
    return out


def _hav(a, b, c, d):
    p = math.pi / 180.0
    dlat = (c - a) * p / 2.0
    dlon = (d - b) * p / 2.0
    x = (math.sin(dlat) ** 2
         + math.cos(a * p) * math.cos(c * p) * math.sin(dlon) ** 2)
    return 2.0 * 6371.0088 * math.asin(min(math.sqrt(x), 1.0))


def test_radius_and_rounding_margins():
    cust = _pts(1500, 37)
    supp = _pts(100, 37)
    radius = 300.0
    min_thresh = float("inf")
    min_tie = float("inf")
    n_in = 0
    for _, la, lo in cust:
        for _, ra, ro in supp:
            d = _hav(la, lo, ra, ro)
            min_thresh = min(min_thresh, abs(d - radius))
            if d <= radius:
                n_in += 1
                scaled = d * 1e5
                min_tie = min(min_tie,
                              abs(scaled - math.floor(scaled) - 0.5))
    # a libm ulp difference is ~1e-13 km at these magnitudes; demand
    # margins orders of magnitude wider
    assert min_thresh > 1e-6, min_thresh
    assert min_tie > 1e-6, min_tie
    assert n_in > 100
