"""Geography-metric surface (round-11): exact/tile kNN and dwithin under
``geography=True`` rank/filter in haversine METERS while the tile
machinery pads in planar DEGREES — these tests pin the meters→degrees
conversion (``boxes.geo_degree_pad``) that keeps the two metrics
consistent, the brute-force parity it buys at high latitude (where the
pre-fix planar bounds provably returned wrong neighbors), and the
multicast-count contract that makes geography dwithin scale-safe.

Reference surface: earth distance via mile constants
(``src/extensions/specialmeasures/geographical.h:11-22``), applied in
dwithin/mindist refine (``src/resque/spjoin_2d.hpp:167-205,253-263``).
"""

import math
import random

import pytest

from hadoopgis_spark.functions import boxes as B
from hadoopgis_spark.geometry.kernel import haversine_distance
from hadoopgis_spark.operators import knn_join, spatial_join


def _pt(w):
    x, y = w[w.index("(") + 1 : -1].split()
    return float(x), float(y)


def _hav(w1, w2):
    return haversine_distance(("POINT", _pt(w1)), ("POINT", _pt(w2)))


def _points(n, seed, lon=(-30.0, 30.0), lat=(60.0, 85.0), base=0):
    rng = random.Random(seed)
    return [
        (base + i,
         f"POINT ({rng.uniform(*lon):.6f} {rng.uniform(*lat):.6f})")
        for i in range(n)
    ]


def _brute_knn(A, Bp, k, cap=None):
    exp = {}
    for ai, aw in A:
        ds = sorted((( _hav(aw, bw), bi) for bi, bw in Bp))
        exp[ai] = sorted(bi for d, bi in ds[:k] if cap is None or d <= cap)
    return exp


class TestGeoDegreePad:
    def test_pad_covers_radius_and_is_monotone(self, spark):
        """Property: every point within r haversine meters of (lon,lat)
        lies inside the degree box padded by geo_degree_pad(r); the pad
        is monotone in r (the straggler satisfaction proofs need it)."""
        rng = random.Random(11)
        rows, checks = [], []
        for i in range(40):
            lon, lat = rng.uniform(-170, 170), rng.uniform(-88, 88)
            r = 10 ** rng.uniform(2, 6.5)  # 100 m .. ~3000 km
            rows.append((i, lon, lat, r))
        df = spark.createDataFrame(rows, "i int, lon double, lat double, r double")
        from pyspark.sql import functions as F

        pads = {
            row["i"]: (row["p"], row["p2"])
            for row in df.select(
                "i",
                B.geo_degree_pad(F.col("r"), F.col("lat"), F.col("lat")).alias("p"),
                B.geo_degree_pad(F.col("r") * 2, F.col("lat"), F.col("lat")).alias("p2"),
            ).collect()
        }
        for i, lon, lat, r in rows:
            p, p2 = pads[i]
            assert p2 >= p - 1e-12, (i, p, p2)  # monotone
            # walk the radius in 16 directions via the inverse formulas
            for t in range(16):
                th = 2 * math.pi * t / 16
                dlat = (r / B.M_PER_DEG) * math.cos(th)
                lat2 = max(-90.0, min(90.0, lat + dlat))
                coslat = max(math.cos(math.radians(max(abs(lat), abs(lat2)))), 1e-9)
                dlon = (r / (B.M_PER_DEG * coslat)) * math.sin(th)
                lon2 = lon + dlon
                d = haversine_distance(("POINT", (lon, lat)), ("POINT", (lon2, lat2)))
                if d <= r:  # only points actually inside the radius
                    assert abs(lat2 - lat) <= p + 1e-9, (i, t)
                    assert abs(lon2 - lon) <= p + 1e-9 or p >= 360.0, (i, t)

    def test_pole_degrades_to_full_circle(self, spark):
        from pyspark.sql import functions as F

        row = spark.range(1).select(
            B.geo_degree_pad(F.lit(50_000.0), F.lit(89.9), F.lit(89.9)).alias("p")
        ).collect()[0]
        assert row["p"] >= 360.0  # pole reachable: every longitude


class TestGeographyKnn:
    def test_exact_fixture_high_latitude(self, spark):
        """The round-10 verdict's confirmed wrong answer: at lat 80 the
        planar-degree bound preferred the 555,855 m neighbor over the
        true 384,194 m one. Must return the haversine 1-NN."""
        a = spark.createDataFrame([(1, "POINT (0 80)")], "id int, geom string")
        b = spark.createDataFrame(
            [(10, "POINT (20 80)"), (11, "POINT (0 75)")], "id int, geom string"
        )
        r = knn_join(a, b, k=1, mode="exact", geography=True).collect()
        assert len(r) == 1 and r[0]["id_2"] == 10
        assert abs(r[0]["distance"] - _hav("POINT (0 80)", "POINT (20 80)")) < 1.0
        # sanity: planar-degree ranking provably disagrees here
        assert math.hypot(20, 0) > math.hypot(0, 5)

    def test_exact_brute_parity_high_latitude(self, spark):
        A = _points(40, 3)
        Bp = _points(120, 4, base=1000)
        k = 3
        got = {}
        for row in knn_join(
            spark.createDataFrame(A, "id int, geom string"),
            spark.createDataFrame(Bp, "id int, geom string"),
            k=k, mode="exact", geography=True, bucket_size=25,
        ).collect():
            got.setdefault(row["id_1"], []).append(row["id_2"])
        exp = _brute_knn(A, Bp, k)
        bad = [i for i, _ in A if sorted(got.get(i, [])) != exp[i]]
        assert not bad, bad[:5]

    def test_exact_capped_brute_parity(self, spark):
        A = _points(30, 5)
        Bp = _points(90, 6, base=1000)
        cap = 400_000.0
        got = {}
        for row in knn_join(
            spark.createDataFrame(A, "id int, geom string"),
            spark.createDataFrame(Bp, "id int, geom string"),
            k=2, mode="exact", geography=True, max_distance=cap,
        ).collect():
            assert row["distance"] <= cap
            got.setdefault(row["id_1"], []).append(row["id_2"])
        exp = _brute_knn(A, Bp, 2, cap=cap)
        bad = [i for i, _ in A if sorted(got.get(i, [])) != exp[i]]
        assert not bad, bad[:5]

    def test_tile_mode_single_tile_matches_brute(self, spark):
        """Tile mode is per-tile approximate by contract, but with one
        tile (huge bucket) its haversine ranking must equal brute force
        — pins the per-tile prune + ranking on the true metric."""
        A = _points(25, 7)
        Bp = _points(80, 8, base=1000)
        got = {}
        for row in knn_join(
            spark.createDataFrame(A, "id int, geom string"),
            spark.createDataFrame(Bp, "id int, geom string"),
            k=3, mode="tile", geography=True, bucket_size=10_000,
        ).collect():
            got.setdefault(row["id_1"], []).append(row["id_2"])
        exp = _brute_knn(A, Bp, 3)
        bad = [i for i, _ in A if sorted(got.get(i, [])) != exp[i]]
        assert not bad, bad[:5]

    def test_non_point_geography_refuses(self, spark):
        poly = spark.createDataFrame(
            [(1, "POLYGON ((0 0, 1 0, 0 1, 0 0))")], "id int, geom string"
        )
        pts = spark.createDataFrame([(2, "POINT (1 1)")], "id int, geom string")
        for mode in ("tile", "exact"):
            with pytest.raises(ValueError, match="POINT geometries only"):
                knn_join(poly, pts, k=1, mode=mode, geography=True)


class TestGeographyPlans:
    """100 TB design contracts for the geography path: box-native
    geography dwithin/kNN/mindist are NATIVE column math end to end —
    no Arrow or Python eval node anywhere in the plan (the haversine
    refine, the degree pads, and the mindist stat are all JVM
    expressions)."""

    def _pts(self, spark, n, seed):
        from pyspark.sql import functions as F

        df = spark.range(1, n + 1)
        lon = (F.col("id") % 59) * 0.7 - 20.0 + seed
        lat = (F.col("id") % 41) * 0.5 + 50.0
        return df.select("id", lon.alias("xmin"), lat.alias("ymin"),
                         lon.alias("xmax"), lat.alias("ymax"))

    def test_geography_dwithin_has_no_python_stage(self, spark):
        from hadoopgis_spark.plans.inspect import formatted_plan

        j = spatial_join(self._pts(spark, 500, 0), self._pts(spark, 800, 3),
                         "st_dwithin", distance=100_000.0, geography=True,
                         stats=["mindist"])
        plan = formatted_plan(j)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_geography_knn_has_no_python_stage(self, spark):
        from hadoopgis_spark.plans.inspect import formatted_plan

        j = knn_join(self._pts(spark, 300, 0), self._pts(spark, 500, 7),
                     k=2, mode="exact", geography=True)
        plan = formatted_plan(j)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestGeographyDwithin:
    CAP = 250_000.0

    def _expect(self, A, Bp):
        return {
            (ai, bi)
            for ai, aw in A
            for bi, bw in Bp
            if _hav(aw, bw) <= self.CAP
        }

    @pytest.mark.parametrize("strategy", ["tile", "broadcast"])
    def test_brute_parity(self, spark, strategy):
        A = _points(35, 9)
        Bp = _points(100, 10, base=1000)
        res = spatial_join(
            spark.createDataFrame(A, "id int, geom string"),
            spark.createDataFrame(Bp, "id int, geom string"),
            "st_dwithin", distance=self.CAP, geography=True,
            strategy=strategy,
        )
        got = {(r["id_1"], r["id_2"]) for r in res.collect()}
        assert got == self._expect(A, Bp)

    def test_mindist_geo_stat(self, spark):
        """spatial_join(stats=['mindist'], geography=True) must emit the
        haversine distance (reference -e true, spjoin_2d.hpp:253-263)."""
        A = _points(10, 12)
        Bp = _points(30, 13, base=1000)
        res = spatial_join(
            spark.createDataFrame(A, "id int, geom string"),
            spark.createDataFrame(Bp, "id int, geom string"),
            "st_dwithin", distance=self.CAP, geography=True,
            stats=["mindist"],
        ).collect()
        assert res
        aw = dict(A)
        bw = dict(Bp)
        for r in res:
            assert abs(r["mindist"] - _hav(aw[r["id_1"]], bw[r["id_2"]])) < 1.0

    def test_non_point_geography_refuses(self, spark):
        poly = spark.createDataFrame(
            [(1, "POLYGON ((0 0, 1 0, 0 1, 0 0))")], "id int, geom string"
        )
        pts = spark.createDataFrame([(2, "POINT (1 1)")], "id int, geom string")
        for strategy in ("tile", "broadcast"):
            with pytest.raises(ValueError, match="POINT geometries only"):
                spatial_join(poly, pts, "st_dwithin", distance=100.0,
                             geography=True, strategy=strategy)

    def test_multicast_bounded(self, spark):
        """Scale contract (round-10 'What's wrong #2'): a sub-km
        geography threshold must NOT multicast objects to every tile —
        the degree pad keeps assigned rows within a small multiple of
        the input. Pre-fix, a 500 m pad applied as 500 DEGREES assigned
        every object to all tiles (~n_tiles× blowup)."""
        from pyspark.sql import functions as F

        from hadoopgis_spark.operators.mbb import with_mbb
        from hadoopgis_spark.operators.spatial_join import _suffix_all
        from hadoopgis_spark.operators.tile import assign_tiles, tiles_dataframe
        from hadoopgis_spark.partition import partition_tiles
        import numpy as np

        A = _points(400, 14, lon=(-20.0, 20.0), lat=(40.0, 60.0))
        df = with_mbb(spark.createDataFrame(A, "id int, geom string"))
        sample = np.array(
            [[r["xmin"], r["ymin"], r["xmax"], r["ymax"]] for r in df.collect()]
        )
        tiles = partition_tiles(sample, 20, "bsp", cover_plane=True)
        assert len(tiles) >= 10  # enough tiles for the blowup to show
        tdf = tiles_dataframe(spark, tiles)
        at = _suffix_all(df, "_1")
        pad = B.geo_degree_pad(F.lit(500.0), F.col("ymin_1"), F.col("ymax_1"))
        assigned = assign_tiles(at, tdf, pad=pad,
                                mbb_cols=("xmin_1", "ymin_1", "xmax_1", "ymax_1"))
        n = assigned.count()
        assert n <= 4 * len(A), (n, len(A), len(tiles))
