"""End-to-end spatial join / kNN / containment vs a brute-force oracle.

Fixtures follow the reference's generator shape (random triangles with
int attrs, /root/reference/test/datagenerator/generatePolygons.py) at
test scale. The oracle is a driver-side O(n²) evaluation with the same
geometry kernel — independent of all tiling/dedup machinery, so it
catches replication duplicates, dropped boundary objects, and wrong
reference-point logic.
"""

import math
import random

import pytest

from hadoopgis_spark.geometry import kernel as K
from hadoopgis_spark.geometry.kernel import Geometry
from hadoopgis_spark.operators import containment, knn_join, spatial_join
from hadoopgis_spark.partition import ALGORITHMS


def _triangles(n, seed, extent=1000.0, size=30.0):
    rng = random.Random(seed)
    rows = []
    for i in range(1, n + 1):
        x, y = rng.uniform(0, extent), rng.uniform(0, extent)
        pts = [
            (x, y),
            (x + rng.uniform(0.5, size), y + rng.uniform(-size, size)),
            (x + rng.uniform(-size, size), y + rng.uniform(0.5, size)),
        ]
        wkt = "POLYGON ((" + ", ".join(f"{a:.4f} {b:.4f}" for a, b in pts + [pts[0]]) + "))"
        rows.append((i, wkt, rng.randint(0, 8)))
    return rows


def _points(n, seed, extent=1000.0):
    rng = random.Random(seed)
    return [
        (i, f"POINT ({rng.uniform(0, extent):.4f} {rng.uniform(0, extent):.4f})", rng.randint(0, 8))
        for i in range(1, n + 1)
    ]


@pytest.fixture(scope="module")
def tri_a(spark):
    return spark.createDataFrame(_triangles(200, 1), "id long, geom string, attr int").cache()


@pytest.fixture(scope="module")
def tri_b(spark):
    return spark.createDataFrame(_triangles(300, 2), "id long, geom string, attr int").cache()


def brute_pairs(rows_a, rows_b, pred):
    geoms_a = [(i, Geometry.from_wkt(w)) for i, w, _ in rows_a]
    geoms_b = [(i, Geometry.from_wkt(w)) for i, w, _ in rows_b]
    out = set()
    for ia, ga in geoms_a:
        for ib, gb in geoms_b:
            if pred(ga, gb):
                out.add((ia, ib))
    return out


class TestSpatialJoin:
    def test_intersects_matches_bruteforce_all_partitioners(self, spark, tri_a, tri_b):
        rows_a, rows_b = _triangles(200, 1), _triangles(300, 2)
        expected = brute_pairs(rows_a, rows_b, K.intersects)
        results = {}
        for algo in sorted(ALGORITHMS):
            got = spatial_join(
                tri_a, tri_b, "st_intersects", partitioner=algo, bucket_size=40
            ).select("id_1", "id_2").collect()
            got_set = {(r.id_1, r.id_2) for r in got}
            assert len(got) == len(got_set), f"{algo}: duplicate pairs emitted"
            assert got_set == expected, (
                f"{algo}: missing={len(expected - got_set)} extra={len(got_set - expected)}"
            )
            results[algo] = got_set

    def test_self_join_unordered_once(self, spark, tri_a):
        rows_a = _triangles(200, 1)
        expected = {
            (i, j)
            for (i, j) in brute_pairs(rows_a, rows_a, K.intersects)
            if i < j
        }
        got = spatial_join(tri_a, None, "st_intersects", bucket_size=40).select("id_1", "id_2")
        got_set = {(r.id_1, r.id_2) for r in got.collect()}
        assert got_set == expected

    def test_self_join_replicate(self, spark, tri_a):
        rows_a = _triangles(200, 1)
        expected = {
            (i, j) for (i, j) in brute_pairs(rows_a, rows_a, K.intersects) if i != j
        }
        got = spatial_join(tri_a, None, "st_intersects", bucket_size=40, replicate=True)
        got_set = {(r.id_1, r.id_2) for r in got.select("id_1", "id_2").collect()}
        assert got_set == expected

    def test_contains_and_stats(self, spark, tri_a, tri_b):
        rows_a, rows_b = _triangles(200, 1), _triangles(300, 2)
        got = spatial_join(
            tri_a, tri_b, "st_intersects", bucket_size=50,
            stats=["area1", "intersect", "jaccard", "mindist"],
        ).collect()
        assert len(got) > 0
        ga = {i: Geometry.from_wkt(w) for i, w, _ in rows_a}
        gb = {i: Geometry.from_wkt(w) for i, w, _ in rows_b}
        for r in got[:50]:
            assert r.area1 == pytest.approx(ga[r.id_1].area, rel=1e-6)
            assert r.intersect == pytest.approx(
                K.intersection_area(ga[r.id_1], gb[r.id_2]), rel=1e-5, abs=1e-9
            )
            assert r.jaccard == pytest.approx(K.jaccard(ga[r.id_1], gb[r.id_2]), rel=1e-5, abs=1e-9)
            assert r.mindist == 0.0

    def test_dwithin_points(self, spark):
        pa, pb = _points(300, 3), _points(300, 4)
        dfa = spark.createDataFrame(pa, "id long, geom string, attr int")
        dfb = spark.createDataFrame(pb, "id long, geom string, attr int")
        d = 25.0
        expected = brute_pairs(pa, pb, lambda x, y: K.dwithin(x, y, d))
        got = spatial_join(dfa, dfb, "st_dwithin", distance=d, bucket_size=50)
        got_set = {(r.id_1, r.id_2) for r in got.select("id_1", "id_2").collect()}
        assert got_set == expected

    def test_malformed_geometry_skipped(self, spark, tri_b):
        rows = _triangles(50, 5)
        rows[10] = (11, "POLYGON ((broken", 0)
        rows[20] = (21, "", 1)
        dfa = spark.createDataFrame(rows, "id long, geom string, attr int")
        got = spatial_join(dfa, tri_b, "st_intersects", bucket_size=40)
        ids = {r.id_1 for r in got.select("id_1").distinct().collect()}
        assert 11 not in ids and 21 not in ids


class TestKnnJoin:
    def test_exact_knn_points(self, spark):
        pa, pb = _points(120, 6), _points(200, 7)
        dfa = spark.createDataFrame(pa, "id long, geom string, attr int")
        dfb = spark.createDataFrame(pb, "id long, geom string, attr int")
        k = 3
        got = knn_join(dfa, dfb, k=k, mode="exact").collect()
        # brute-force oracle
        def coords(rows):
            return {
                i: tuple(map(float, w[w.index("(") + 1 : w.index(")")].split()))
                for i, w, _ in rows
            }

        ca, cb = coords(pa), coords(pb)
        by_left = {}
        for r in got:
            by_left.setdefault(r.id_1, []).append((r.distance, r.id_2))
        assert set(by_left) == set(ca)
        for ia, (xa, ya) in ca.items():
            dists = sorted(
                (math.hypot(xa - xb, ya - yb), ib) for ib, (xb, yb) in cb.items()
            )
            expect = dists[:k]
            gotk = sorted(by_left[ia])
            assert len(gotk) == k
            for (ed, eid), (gd, gid) in zip(expect, gotk):
                assert gid == eid and gd == pytest.approx(ed, rel=1e-9)

    def test_exact_knn_multi_tile_with_stragglers(self, spark):
        """Round-9 two-round tile formulation: a small bucket_size
        forces many tiles so round 2's per-object-radius re-probe
        crosses tile boundaries, and a far-away sparse cluster (fewer
        than k tile-co-located candidates) exercises the straggler
        expansion loop. Exact vs a driver-side brute-force oracle."""
        import random

        rng = random.Random(99)
        pa = [(i, f"POINT ({rng.uniform(0, 900):.3f} {rng.uniform(0, 900):.3f})", 0)
              for i in range(400)]
        # far-away left objects: nearest b is several tiles away
        pa += [(1000 + i, f"POINT ({5000 + i * 3} {5000 - i * 2})", 0)
               for i in range(5)]
        pb = [(i, f"POINT ({rng.uniform(0, 900):.3f} {rng.uniform(0, 900):.3f})", 0)
              for i in range(600)]
        dfa = spark.createDataFrame(pa, "id long, geom string, attr int")
        dfb = spark.createDataFrame(pb, "id long, geom string, attr int")
        k = 3
        got = knn_join(dfa, dfb, k=k, mode="exact", bucket_size=60).collect()

        def coords(rows):
            return {
                i: tuple(map(float, w[w.index("(") + 1: w.index(")")].split()))
                for i, w, _ in rows
            }

        ca, cb = coords(pa), coords(pb)
        by_left = {}
        for r in got:
            by_left.setdefault(r.id_1, []).append((r.distance, r.id_2))
        assert set(by_left) == set(ca)
        for ia, (xa, ya) in ca.items():
            dists = sorted(
                (math.hypot(xa - xb, ya - yb), ib) for ib, (xb, yb) in cb.items()
            )
            gotk = sorted(by_left[ia])
            assert len(gotk) == k
            for (ed, eid), (gd, gid) in zip(dists[:k], gotk):
                assert gid == eid and gd == pytest.approx(ed, rel=1e-9)

    def test_exact_knn_point_fast_path_skips_round2(self, spark):
        """Round-10 fast path: on point data each object's k-th
        tile-local candidate distance pads a box; when that box stays
        inside the object's own tile the round-1 list is provably
        final. Single-tile layouts (plane-covering ±inf bounds) prove
        EVERY object, so round 2 (the per-object-radius re-probe) is
        SKIPPED entirely — strictly fewer Spark jobs than a run that
        needs it — and parity must hold regardless."""
        import math as _math
        import random

        from hadoopgis_spark.operators import knn as knn_mod

        rng = random.Random(5)
        # dense interior cloud, multi-tile (bucket_size forces ~8 tiles)
        pts_a = [(i, rng.uniform(100, 900), rng.uniform(100, 900))
                 for i in range(300)]
        pts_b = [(i, rng.uniform(0, 1000), rng.uniform(0, 1000))
                 for i in range(900)]
        dfa = spark.createDataFrame(
            [(i, x, y, x, y) for i, x, y in pts_a],
            "id long, xmin double, ymin double, xmax double, ymax double")
        dfb = spark.createDataFrame(
            [(i, x, y, x, y) for i, x, y in pts_b],
            "id long, xmin double, ymin double, xmax double, ymax double")
        k = 3

        def run(tag, **kw):
            sc = spark.sparkContext
            sc.setJobGroup(tag, tag)
            try:
                rows = knn_join(dfa, dfb, k=k, mode="exact", **kw).collect()
            finally:
                sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
            return rows, jobs, dict(knn_mod._LAST_EXACT_INFO)

        # one plane-covering tile (bucket >= n): every padded box is
        # inside its (±inf-extended) tile, so round 2 vanishes
        got, n_jobs_fast, info = run("knn-fast", bucket_size=10_000)
        assert info["points"] and info["round2_skipped"]
        assert info["n_fast"] == info["n_objects"] == 300
        assert info["stragglers"] == 0

        # parity vs brute force
        by_left = {}
        for r in got:
            by_left.setdefault(r.id_1, []).append((r.distance, r.id_2))
        for ia, xa, ya in pts_a:
            dists = sorted((_math.hypot(xa - xb, ya - yb), ib)
                           for ib, xb, yb in pts_b)
            gotk = sorted(by_left[ia])
            assert len(gotk) == k
            for (ed, eid), (gd, gid) in zip(dists[:k], gotk):
                assert gid == eid and gd == pytest.approx(ed, rel=1e-9)

        # box data on the same layout CANNOT take the fast path (bounds
        # aren't exact distances) — round 2 runs, costing more jobs
        boxa = dfa.selectExpr("id", "xmin", "ymin",
                              "xmax + 1.0 as xmax", "ymax + 1.0 as ymax")
        sc = spark.sparkContext
        sc.setJobGroup("knn-slow", "knn-slow")
        try:
            knn_join(boxa, dfb, k=k, mode="exact",
                     bucket_size=10_000).collect()
        finally:
            sc.setJobGroup(None, None)
        n_jobs_slow = len(sc.statusTracker().getJobIdsForGroup("knn-slow"))
        assert knn_mod._LAST_EXACT_INFO["points"] is False
        assert knn_mod._LAST_EXACT_INFO["round2_skipped"] is False
        assert n_jobs_fast < n_jobs_slow, (n_jobs_fast, n_jobs_slow)

    def test_exact_knn_self_join_multi_tile(self, spark):
        """J2-style exact self-kNN through the two-round tile path:
        self pairs excluded, parity vs brute force, multi-tile forced."""
        pa = _points(250, 17)
        dfa = spark.createDataFrame(pa, "id long, geom string, attr int")
        k = 2
        got = knn_join(dfa, None, k=k, mode="exact", bucket_size=50).collect()

        def coords(rows):
            return {
                i: tuple(map(float, w[w.index("(") + 1: w.index(")")].split()))
                for i, w, _ in rows
            }

        ca = coords(pa)
        by_left = {}
        for r in got:
            assert r.id_1 != r.id_2
            by_left.setdefault(r.id_1, []).append((r.distance, r.id_2))
        assert set(by_left) == set(ca)
        for ia, (xa, ya) in ca.items():
            dists = sorted(
                (math.hypot(xa - xb, ya - yb), ib)
                for ib, (xb, yb) in ca.items() if ib != ia
            )
            gotk = sorted(by_left[ia])
            assert len(gotk) == k
            for (ed, eid), (gd, gid) in zip(dists[:k], gotk):
                assert gid == eid and gd == pytest.approx(ed, rel=1e-9)

    def test_exact_knn_capped_tile_join(self, spark):
        """max_distance (st_nearest -d): one padded tile join is the
        complete candidate set; objects with < k in-range neighbors
        keep what exists, objects with none vanish — vs brute force."""
        pa, pb = _points(150, 11), _points(150, 12)
        dfa = spark.createDataFrame(pa, "id long, geom string, attr int")
        dfb = spark.createDataFrame(pb, "id long, geom string, attr int")
        cap, k = 40.0, 3
        got = knn_join(dfa, dfb, k=k, mode="exact", max_distance=cap,
                       bucket_size=40).collect()

        def coords(rows):
            return {
                i: tuple(map(float, w[w.index("(") + 1: w.index(")")].split()))
                for i, w, _ in rows
            }

        ca, cb = coords(pa), coords(pb)
        by_left = {}
        for r in got:
            by_left.setdefault(r.id_1, []).append((r.distance, r.id_2))
        for ia, (xa, ya) in ca.items():
            dists = sorted(
                (math.hypot(xa - xb, ya - yb), ib)
                for ib, (xb, yb) in cb.items()
            )
            expect = [(d, i) for d, i in dists if d <= cap][:k]
            gotk = sorted(by_left.get(ia, []))
            assert len(gotk) == len(expect), ia
            for (ed, eid), (gd, gid) in zip(expect, gotk):
                assert gid == eid and gd == pytest.approx(ed, rel=1e-9)

    def test_tile_knn_shape(self, spark):
        pa = _points(100, 8)
        dfa = spark.createDataFrame(pa, "id long, geom string, attr int")
        got = knn_join(dfa, None, k=2, mode="tile", bucket_size=30).collect()
        by_left = {}
        for r in got:
            by_left.setdefault(r.id_1, []).append(r)
        assert all(len(v) <= 2 for v in by_left.values())
        for rows in by_left.values():
            for r in rows:
                assert r.id_1 != r.id_2


class TestContainment:
    def test_window_query_wkt(self, spark, tri_a):
        rows_a = _triangles(200, 1)
        win = "POLYGON ((100 100, 400 100, 400 400, 100 400, 100 100))"
        wg = Geometry.from_wkt(win)
        expected = {i for i, w, _ in rows_a if K.intersects(Geometry.from_wkt(w), wg)}
        got = {r.id for r in containment(tri_a, win).select("id").collect()}
        assert got == expected

    def test_window_query_mbb_form(self, spark, tri_a):
        rows_a = _triangles(200, 1)
        got = {r.id for r in containment(tri_a, "100,100,400,400").select("id").collect()}
        wg = Geometry.from_wkt("POLYGON ((100 100, 400 100, 400 400, 100 400, 100 100))")
        expected = {i for i, w, _ in rows_a if K.intersects(Geometry.from_wkt(w), wg)}
        assert got == expected

    def test_window_within(self, spark, tri_a):
        rows_a = _triangles(200, 1)
        win = "POLYGON ((0 0, 500 0, 500 500, 0 500, 0 0))"
        wg = Geometry.from_wkt(win)
        expected = {i for i, w, _ in rows_a if K.within(Geometry.from_wkt(w), wg)}
        got = {r.id for r in containment(tri_a, win, "st_within").select("id").collect()}
        assert got == expected

    def test_empty_window(self, spark, tri_a):
        assert containment(tri_a, "2000,2000,3000,3000").count() == 0

    def test_fused_window_kernel_parity(self, spark):
        """Non-rectangular window → the fused one-Arrow-stage path.
        Must equal the brute-force prefilter+refine over mixed POINT /
        POLYGON / malformed rows, for several predicates."""
        win = "POLYGON ((100 100, 450 120, 300 450, 100 100))"
        wg = Geometry.from_wkt(win)
        rows = []
        for i, (w, _) in enumerate(r[1:] for r in _triangles(120, 5)):
            rows.append((i, w))
        for i in range(120, 320):
            x, y = (i * 37) % 520, (i * 59) % 520
            rows.append((i, f"POINT ({x} {y})"))
        rows.append((900, "POINT ("))       # malformed: dropped
        rows.append((901, "GARBAGE 1 2"))   # malformed: dropped
        df = spark.createDataFrame(rows, "id long, geom string")

        def box_overlap(b, w, pad=0.0):
            return (
                b[0] - pad <= w[2] and w[0] <= b[2] + pad
                and b[1] - pad <= w[3] and w[1] <= b[3] + pad
            )

        for pred, fn in [
            ("st_intersects", K.intersects),
            ("st_within", K.within),
            ("st_touches", K.touches),
        ]:
            expected = set()
            for i, w in rows:
                try:
                    g = Geometry.from_wkt(w)
                except (ValueError, IndexError):
                    continue
                if box_overlap(g.bbox, wg.bbox) and fn(g, wg):
                    expected.add(i)
            got = {r.id for r in containment(df, win, pred).select("id").collect()}
            assert got == expected, pred
            # fused output keeps the with_mbb schema (bbox columns present)
        out_cols = containment(df, win).columns
        assert [c in out_cols for c in ("xmin", "ymin", "xmax", "ymax")] == [True] * 4

        d = 25.0
        expected = set()
        for i, w in rows:
            try:
                g = Geometry.from_wkt(w)
            except (ValueError, IndexError):
                continue
            if box_overlap(g.bbox, wg.bbox, d) and K.dwithin(g, wg, d):
                expected.add(i)
        got = {
            r.id
            for r in containment(df, win, "st_dwithin", distance=d)
            .select("id")
            .collect()
        }
        assert got == expected


class TestTwoLevelJoin:
    def test_two_level_matches_single_level(self, spark, tri_a, tri_b):
        rows_a, rows_b = _triangles(200, 1), _triangles(300, 2)
        expected = brute_pairs(rows_a, rows_b, K.intersects)
        got = spatial_join(
            tri_a, tri_b, "st_intersects", bucket_size=30, two_level=True
        ).select("id_1", "id_2").collect()
        got_set = {(r.id_1, r.id_2) for r in got}
        assert len(got) == len(got_set)
        assert got_set == expected


class TestBroadcastStrategy:
    def test_broadcast_matches_tile(self, spark, tri_a, tri_b):
        rows_a, rows_b = _triangles(200, 1), _triangles(300, 2)
        expected = brute_pairs(rows_a, rows_b, K.intersects)
        got = spatial_join(tri_a, tri_b, "st_intersects", strategy="broadcast")
        got_set = {(r.id_1, r.id_2) for r in got.select("id_1", "id_2").collect()}
        assert got_set == expected

    def test_broadcast_self_join(self, spark, tri_a):
        rows_a = _triangles(200, 1)
        expected = {(i, j) for (i, j) in brute_pairs(rows_a, rows_a, K.intersects) if i < j}
        got = spatial_join(tri_a, None, "st_intersects", strategy="broadcast")
        got_set = {(r.id_1, r.id_2) for r in got.select("id_1", "id_2").collect()}
        assert got_set == expected

    def test_broadcast_no_shuffle(self, spark, tri_a, tri_b):
        from hadoopgis_spark.plans import count_exchanges, has_broadcast

        j = spatial_join(tri_a, tri_b, "st_intersects", strategy="broadcast")
        assert has_broadcast(j)
        assert count_exchanges(j) == 0  # zero shuffles end-to-end

    def test_broadcast_tileid_rejected(self, spark, tri_a, tri_b):
        with pytest.raises(ValueError):
            spatial_join(tri_a, tri_b, strategy="broadcast", stats=["tileid"])
        with pytest.raises(ValueError):
            spatial_join(tri_a, tri_b, strategy="nope")


class TestAutoStrategy:
    def test_auto_picks_broadcast_for_small_b(self, spark, tri_a, tri_b):
        from hadoopgis_spark.plans import count_exchanges

        j = spatial_join(tri_a, tri_b, "st_intersects", strategy="auto")
        # tri_b is small -> broadcast path -> zero shuffles
        assert count_exchanges(j) == 0
        rows_a, rows_b = _triangles(200, 1), _triangles(300, 2)
        expected = brute_pairs(rows_a, rows_b, K.intersects)
        got = {(r.id_1, r.id_2) for r in j.select("id_1", "id_2").collect()}
        assert got == expected

    def test_auto_self_join_tiles(self, spark, tri_a):
        from hadoopgis_spark.plans import count_exchanges

        spark.conf.set("hgs.broadcastRowThreshold", "10")
        try:
            j = spatial_join(tri_a, None, "st_intersects", strategy="auto")
            assert count_exchanges(j) == 2  # self-join always tiles
        finally:
            spark.conf.unset("hgs.broadcastRowThreshold")
