"""Geo operators: known geohash vectors, haversine reference
distances, grid radius join vs brute force."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.geo import (geo_radius_join, grid_density,
                                   haversine_km, with_geohash)

RNG = np.random.RandomState(5)


class TestGeohash:
    def test_known_vectors(self, spark):
        # canonical test vectors from the original geohash definition
        pts = [
            (57.64911, 10.40744, "u4pruydqqvj"),
            (48.669, -4.329, "gbsuv7ztqzpt"),
            (0.0, 0.0, "s00000000000"),
            (-25.382708, -49.265506, "6gkzwgjzn820"),
        ]
        df = spark.createDataFrame(
            [(la, lo) for la, lo, _ in pts], "lat double, lon double")
        for prec in (5, 7, 11):
            got = [r["geohash"] for r in
                   with_geohash(df, "lat", "lon", prec).collect()]
            for (la, lo, full), g in zip(pts, got):
                assert g == full[:prec], (la, lo, prec)

    def test_invalid_coords_null(self, spark):
        df = spark.createDataFrame(
            [(91.0, 0.0), (0.0, 181.0), (None, 0.0),
             (float("nan"), 0.0), (45.0, 45.0)],
            "lat double, lon double")
        got = [r["geohash"]
               for r in with_geohash(df, "lat", "lon", 6).collect()]
        assert got[:4] == [None] * 4 and got[4] is not None

    def test_precision_validation(self, spark):
        df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
        with pytest.raises(ValueError):
            with_geohash(df, "lat", "lon", 0)
        with pytest.raises(ValueError):
            with_geohash(df, "lat", "lon", 13)


class TestHaversine:
    def test_reference_distances(self, spark):
        # Paris (48.8566, 2.3522) - London (51.5074, -0.1278): ~343.5 km
        df = spark.createDataFrame(
            [(48.8566, 2.3522, 51.5074, -0.1278)],
            "a double, b double, c double, d double")
        km = df.select(haversine_km(
            F.col("a"), F.col("b"), F.col("c"), F.col("d"))
            .alias("km")).collect()[0]["km"]
        assert km == pytest.approx(343.5, abs=1.0)
        # zero distance
        z = df.select(haversine_km(
            F.col("a"), F.col("b"), F.col("a"), F.col("b"))
            .alias("km")).collect()[0]["km"]
        assert z == pytest.approx(0.0, abs=1e-9)


class TestRadiusJoin:
    def _pts(self, spark, n, name):
        lat = RNG.uniform(30, 60, n)
        lon = RNG.uniform(-10, 30, n)
        return spark.createDataFrame(
            [(i, float(a), float(o))
             for i, (a, o) in enumerate(zip(lat, lon))],
            f"{name}_id int, lat double, lon double")

    def test_matches_bruteforce(self, spark):
        left = self._pts(spark, 200, "l")
        right = self._pts(spark, 150, "r")
        radius = 120.0
        got = geo_radius_join(left, right, radius)
        pairs = {(r["l_id"], r["r_r_id"]) for r in got.collect()}
        # brute force
        brute = left.crossJoin(
            right.selectExpr("r_id", "lat AS rlat", "lon AS rlon"))
        d = haversine_km(F.col("lat"), F.col("lon"),
                         F.col("rlat"), F.col("rlon"))
        want = {(r["l_id"], r["r_id"])
                for r in brute.filter(d <= radius).collect()}
        assert pairs == want and len(want) > 0

    def test_distance_column_exact(self, spark):
        left = spark.createDataFrame(
            [(1, 48.8566, 2.3522)], "l_id int, lat double, lon double")
        right = spark.createDataFrame(
            [(2, 51.5074, -0.1278)], "r_id int, lat double, lon double")
        rows = geo_radius_join(left, right, 400.0).collect()
        assert len(rows) == 1
        assert rows[0]["distance_km"] == pytest.approx(343.5, abs=1.0)
        assert geo_radius_join(left, right, 300.0).count() == 0

    def test_validation(self, spark):
        df = spark.createDataFrame(
            [(1, 0.0, 0.0)], "i int, lat double, lon double")
        with pytest.raises(ValueError):
            geo_radius_join(df, df, 0.0)
        with pytest.raises(ValueError):
            geo_radius_join(df, df, 10.0, max_lat=95.0)


class TestGridDensity:
    def test_counts_and_sum(self, spark):
        df = spark.createDataFrame(
            [(48.85, 2.35, 2.0), (48.86, 2.36, 3.0),
             (-33.87, 151.21, 5.0), (91.0, 0.0, 7.0)],
            "lat double, lon double, v double")
        got = {r["geohash"]: (r["n"], r["value_sum"])
               for r in grid_density(df, "lat", "lon", 3, "v").collect()}
        # Paris cluster shares the 3-char cell u09; Sydney is r3g;
        # the invalid row drops
        assert got["u09"] == (2, 5.0)
        assert got["r3g"] == (1, 5.0)
        assert sum(n for n, _ in got.values()) == 3


class TestNearestJoin:
    def test_matches_bruteforce_argmin(self, spark):
        import numpy as np
        from whylogs_spark.ops.geo import geo_nearest_join
        rng = np.random.RandomState(9)
        lpts = [(i, float(a), float(o)) for i, (a, o) in enumerate(
            zip(rng.uniform(35, 55, 150), rng.uniform(-5, 25, 150)))]
        rpts = [(i, float(a), float(o)) for i, (a, o) in enumerate(
            zip(rng.uniform(35, 55, 60), rng.uniform(-5, 25, 60)))]
        left = spark.createDataFrame(lpts, "l_id int, lat double, lon double")
        right = spark.createDataFrame(rpts, "r_id int, lat double, lon double")
        got = {r["l_id"]: (r["r_r_id"], r["distance_km"])
               for r in geo_nearest_join(left, right, 400.0).collect()}
        # brute force argmin with (distance, id) tie-break
        import math
        def hav(a, b, c, d):
            p = math.pi / 180.0
            x = (math.sin((c - a) * p / 2) ** 2
                 + math.cos(a * p) * math.cos(c * p)
                 * math.sin((d - b) * p / 2) ** 2)
            return 2 * 6371.0088 * math.asin(min(math.sqrt(x), 1.0))
        want = {}
        for li, la, lo in lpts:
            best = None
            for ri, ra, ro in rpts:
                d = hav(la, lo, ra, ro)
                if d <= 400.0 and (best is None or (d, ri) < best):
                    best = (d, ri)
            if best is not None:
                want[li] = (best[1], best[0])
        assert set(got) == set(want)
        for li, (ri, d) in want.items():
            assert got[li][0] == ri, li
            assert abs(got[li][1] - d) < 1e-9, li

    def test_out_of_range_dropped(self, spark):
        from whylogs_spark.ops.geo import geo_nearest_join
        left = spark.createDataFrame(
            [(1, 0.0, 0.0)], "l_id int, lat double, lon double")
        right = spark.createDataFrame(
            [(2, 50.0, 50.0)], "r_id int, lat double, lon double")
        assert geo_nearest_join(left, right, 100.0).count() == 0


class TestGeoNearestLeftId:
    def test_duplicate_left_rows(self, spark):
        """Default path groups on all left columns (duplicates
        collapse, documented); left_id_col gives one row per input."""
        from whylogs_spark.ops.geo import geo_nearest_join

        left = spark.createDataFrame(
            [(1, 10.0, 10.0), (2, 10.0, 10.0)],
            "uid int, lat double, lon double")
        right = spark.createDataFrame(
            [(7, 10.1, 10.1)], "r_id int, lat double, lon double")

        collapsed = geo_nearest_join(
            left.drop("uid"), right, 100.0)
        assert collapsed.count() == 1

        keyed = geo_nearest_join(
            left, right, 100.0, left_id_col="uid")
        rows = {r["uid"]: r for r in keyed.collect()}
        assert set(rows) == {1, 2}
        assert all(r["r_r_id"] == 7 for r in rows.values())

    def test_left_id_validation(self, spark):
        import pytest

        from whylogs_spark.ops.geo import geo_nearest_join

        left = spark.createDataFrame(
            [(1, 0.0, 0.0)], "uid int, lat double, lon double")
        right = spark.createDataFrame(
            [(2, 0.0, 0.0)], "r_id int, lat double, lon double")
        with pytest.raises(ValueError, match="left_id_col"):
            geo_nearest_join(left, right, 10.0, left_id_col="nope")


class TestGridCluster:
    def _brute(self, pts, cell_deg, min_pts, attach):
        """Independent reference: cell counts, 8-connected dense
        components labeled by min cell id, optional border attach."""
        import math as m

        def cid(lat, lon):
            return (int(m.floor((lat + 90) / cell_deg)) << 32) + \
                int(m.floor((lon + 180) / cell_deg))

        from collections import Counter
        counts = Counter(cid(a, b) for a, b in pts)
        dense = {c for c, n in counts.items() if n >= min_pts}
        lbl = {c: c for c in dense}
        changed = True
        while changed:
            changed = False
            for c in dense:
                iy, ix = c >> 32, c & 0xFFFFFFFF
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        nb = ((iy + dy) << 32) + (ix + dx)
                        if nb in dense and lbl[nb] < lbl[c]:
                            lbl[c] = lbl[nb]
                            changed = True
        out = []
        for a, b in pts:
            c = cid(a, b)
            if c in dense:
                out.append((lbl[c], True))
            elif attach:
                iy, ix = c >> 32, c & 0xFFFFFFFF
                cands = [lbl[((iy + dy) << 32) + (ix + dx)]
                         for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                         if ((iy + dy) << 32) + (ix + dx) in dense]
                out.append((min(cands) if cands else None, False))
            else:
                out.append((None, False))
        return out

    def test_two_blobs_and_noise(self, spark):
        from whylogs_spark.ops.geo import grid_cluster

        rng = __import__("numpy").random.RandomState(9)
        pts = []
        # blob A around (10, 10), blob B around (40, 40), sparse noise
        pts += [(10 + rng.uniform(-0.8, 0.8), 10 + rng.uniform(-0.8, 0.8))
                for _ in range(60)]
        pts += [(40 + rng.uniform(-0.8, 0.8), 40 + rng.uniform(-0.8, 0.8))
                for _ in range(60)]
        pts += [(float(-60 + 7 * i), float(100 + 5 * i))
                for i in range(8)]
        df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
            "pid int, lat double, lon double")
        got = {r["pid"]: (r["cluster_id"], r["is_core"])
               for r in grid_cluster(
                   df, cell_deg=0.5, min_pts=4).collect()}
        want = self._brute(pts, 0.5, 4, True)
        for i in range(len(pts)):
            assert got[i] == tuple(want[i]), i
        # exactly two clusters among core points, noise is unlabeled
        clusters = {c for c, core in got.values() if core}
        assert len(clusters) == 2
        assert all(got[i][0] is None for i in range(120, 128))

    def test_invalid_rows_and_flags(self, spark):
        from whylogs_spark.ops.geo import grid_cluster

        df = spark.createDataFrame(
            [(1, 10.0, 10.0), (2, 10.1, 10.1), (3, 10.2, 10.2),
             (4, float("nan"), 5.0), (5, 95.0, 5.0)],
            "pid int, lat double, lon double")
        got = {r["pid"]: r for r in grid_cluster(
            df, cell_deg=1.0, min_pts=3).collect()}
        assert got[1]["is_core"] and got[1]["cluster_id"] is not None
        assert got[4]["cluster_id"] is None and not got[4]["is_core"]
        assert got[5]["cluster_id"] is None

        no_border = grid_cluster(
            df.filter("pid <= 3"), cell_deg=0.05, min_pts=5)
        assert all(r["cluster_id"] is None
                   for r in no_border.collect())

    def test_validation(self, spark):
        import pytest

        from whylogs_spark.ops.geo import grid_cluster

        df = spark.createDataFrame(
            [(10.0, 10.0)], "lat double, lon double")
        with pytest.raises(ValueError, match="cell_deg"):
            grid_cluster(df, cell_deg=0)
        with pytest.raises(ValueError, match="min_pts"):
            grid_cluster(df, min_pts=0)
        with pytest.raises(ValueError, match="max_dense_cells"):
            grid_cluster(df, min_pts=1, max_dense_cells=0)
