"""WKB codec + hypothesis property tests for the geometry kernel."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hadoopgis_spark.geometry import Geometry, parse_wkt, to_wkt
from hadoopgis_spark.geometry import kernel as K
from hadoopgis_spark.geometry.wkb import from_wkb, to_wkb

coord = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=64
)


@st.composite
def triangles(draw):
    x = draw(coord)
    y = draw(coord)
    dx1 = draw(st.floats(min_value=0.5, max_value=100.0))
    dy2 = draw(st.floats(min_value=0.5, max_value=100.0))
    dx2 = draw(st.floats(min_value=-100.0, max_value=100.0))
    ring = np.array([[x, y], [x + dx1, y], [x + dx2, y + dy2], [x, y]])
    return ("POLYGON", [ring])


@st.composite
def points(draw):
    return ("POINT", (draw(coord), draw(coord)))


@st.composite
def multipoints(draw):
    pts = draw(st.lists(st.tuples(coord, coord), min_size=1, max_size=6))
    return ("MULTIPOINT", np.asarray(pts, dtype=np.float64))


@st.composite
def multilines(draw):
    lines = []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        pts = draw(st.lists(st.tuples(coord, coord), min_size=2, max_size=5))
        lines.append(np.asarray(pts, dtype=np.float64))
    return ("MULTILINESTRING", lines)


@st.composite
def collections(draw):
    members = draw(
        st.lists(st.one_of(points(), triangles(), multipoints()), min_size=1, max_size=3)
    )
    return ("GEOMETRYCOLLECTION", members)


class TestGeoJsonRoundtrip:
    @given(g=st.one_of(points(), triangles()))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_exact(self, g):
        from hadoopgis_spark.geometry.geojson import parse_geojson, to_geojson

        back = parse_geojson(to_geojson(g))
        assert back[0] == g[0]
        if g[0] == "POINT":
            assert back[1] == g[1]  # bit-exact via json shortest repr
        else:
            for r1, r2 in zip(g[1], back[1]):
                assert (r1 == r2).all()

    def test_feature_wrapper_and_open_ring(self):
        from hadoopgis_spark.geometry.geojson import parse_geojson

        k, p = parse_geojson(
            '{"type":"Feature","properties":{},"geometry":'
            '{"type":"Polygon","coordinates":[[[0,0],[4,0],[0,4]]]}}'
        )
        assert k == "POLYGON" and (p[0][0] == p[0][-1]).all() and len(p[0]) == 4

    def test_multipolygon_and_hole(self):
        from hadoopgis_spark.geometry.geojson import parse_geojson, to_geojson

        wkt_g = parse_wkt(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        )
        back = parse_geojson(to_geojson(wkt_g))
        assert K.area(Geometry(*back)) == pytest.approx(100 - 4)
        mp = parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
        back = parse_geojson(to_geojson(mp))
        assert back[0] == "MULTIPOLYGON" and len(back[1]) == 2

    def test_malformed(self):
        from hadoopgis_spark.geometry.geojson import parse_geojson

        for bad in [
            "NOT JSON",
            "{}",
            '{"type":"Point"}',
            '{"type":"Polygon","coordinates":[[[1,2]]]}',
            '{"type":"Circle","coordinates":[0,0]}',
            '{"type":"Feature"}',
            "[1,2]",
        ]:
            with pytest.raises(ValueError):
                parse_geojson(bad)


class TestWkbRoundtrip:
    @given(g=st.one_of(points(), triangles()))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_exact(self, g):
        back = from_wkb(to_wkb(g))
        assert back[0] == g[0]
        if g[0] == "POINT":
            assert back[1] == g[1]  # bit-exact doubles
        else:
            for r1, r2 in zip(g[1], back[1]):
                assert (r1 == r2).all()

    def test_polygon_with_hole(self):
        g = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
        back = from_wkb(to_wkb(g))
        assert len(back[1]) == 2
        assert K.area(Geometry(*back)) == pytest.approx(100 - 4)

    def test_multipolygon(self):
        g = parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
        back = from_wkb(to_wkb(g))
        assert back[0] == "MULTIPOLYGON" and len(back[1]) == 2

    def test_malformed(self):
        for bad in [b"", b"\x01", b"\x01\x99\x00\x00\x00", None]:
            with pytest.raises(ValueError):
                from_wkb(bad)

    def test_geometry_parse_dispatch(self):
        g = Geometry.parse("POINT (1 2)")
        assert g.kind == "POINT"
        g2 = Geometry.parse(to_wkb(("POINT", (1.0, 2.0))))
        assert g2.kind == "POINT" and g2.payload == (1.0, 2.0)


def _assert_same_geom(a, b):
    assert a[0] == b[0]
    if a[0] == "POINT":
        assert a[1] == b[1]
    elif a[0] in ("MULTIPOINT", "LINESTRING"):
        assert (np.asarray(a[1]) == np.asarray(b[1])).all()
    elif a[0] in ("MULTILINESTRING", "POLYGON"):
        assert len(a[1]) == len(b[1])
        for r1, r2 in zip(a[1], b[1]):
            assert (r1 == r2).all()
    elif a[0] == "GEOMETRYCOLLECTION":
        assert len(a[1]) == len(b[1])
        for m1, m2 in zip(a[1], b[1]):
            _assert_same_geom(m1, m2)
    else:  # MULTIPOLYGON
        for p1, p2 in zip(a[1], b[1]):
            for r1, r2 in zip(p1, p2):
                assert (r1 == r2).all()


class TestCompositeKindRoundtrips:
    """MULTIPOINT / MULTILINESTRING / GEOMETRYCOLLECTION through every
    codec (the reference accepts anything GEOS parses,
    resque_2d.cpp:331-338 — so ingest must too)."""

    @given(g=st.one_of(multipoints(), multilines(), collections()))
    @settings(max_examples=150, deadline=None)
    def test_wkt_roundtrip_exact(self, g):
        _assert_same_geom(parse_wkt(to_wkt(g)), g)

    @given(g=st.one_of(multipoints(), multilines(), collections()))
    @settings(max_examples=150, deadline=None)
    def test_wkb_roundtrip_exact(self, g):
        _assert_same_geom(from_wkb(to_wkb(g)), g)

    @given(g=st.one_of(multipoints(), multilines(), collections()))
    @settings(max_examples=100, deadline=None)
    def test_geojson_roundtrip_exact(self, g):
        from hadoopgis_spark.geometry.geojson import parse_geojson, to_geojson

        _assert_same_geom(parse_geojson(to_geojson(g)), g)

    def test_bare_multipoint_form(self):
        a = parse_wkt("MULTIPOINT (1 2, 3 4)")
        b = parse_wkt("MULTIPOINT ((1 2), (3 4))")
        _assert_same_geom(a, b)


class TestCompositeKindPredicates:
    SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"

    def test_multipoint_membership(self):
        assert K.intersects("MULTIPOINT ((1 1), (9 9))", self.SQ)
        assert not K.contains(self.SQ, "MULTIPOINT ((1 1), (9 9))")
        assert K.contains(self.SQ, "MULTIPOINT ((1 1), (3 3))")
        # multipoint contains its member point (membership semantics)
        assert K.contains("MULTIPOINT ((1 1), (9 9))", "POINT (9 9)")
        assert not K.contains("MULTIPOINT ((1 1), (9 9))", "POINT (2 2)")

    def test_multipoint_boundary_point_not_interior(self):
        # (4, 2) lies ON the square's boundary: intersects but the
        # closure-containment rule requires strict interior
        assert K.intersects("MULTIPOINT ((4 2), (1 1))", self.SQ)
        assert not K.contains(self.SQ, "MULTIPOINT ((4 2), (1 1))")

    def test_multilinestring_pooled_crossing(self):
        # neither part crosses alone: one fully inside, one fully
        # outside — the union does cross (GEOS semantics)
        ml = "MULTILINESTRING ((1 1, 2 2), (10 10, 12 12))"
        assert K.crosses(ml, self.SQ)
        inside_only = "MULTILINESTRING ((1 1, 2 2), (1 3, 3 3))"
        assert not K.crosses(inside_only, self.SQ)

    def test_collection_area_and_measures(self):
        gc = (
            "GEOMETRYCOLLECTION (POINT (1 1), "
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
            "POLYGON ((10 0, 14 0, 14 4, 10 4, 10 0)))"
        )
        assert K.area(gc) == pytest.approx(32.0)
        assert K.intersection_area(gc, self.SQ) == pytest.approx(16.0)
        assert K.jaccard(gc, self.SQ) == pytest.approx(16.0 / 32.0)

    def test_collection_straddling_containment(self):
        # window straddles the two adjacent members of the collection:
        # per-member containment would say no; the union contains it
        gc = (
            "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
            "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0)))"
        )
        straddler = "POLYGON ((2 1, 6 1, 6 3, 2 3, 2 1))"
        assert K.contains(gc, straddler)
        assert K.within(straddler, gc)

    def test_collection_touches_and_overlaps(self):
        gc = "GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))"
        assert K.touches(gc, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
        assert K.overlaps(gc, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")

    def test_composite_distance_and_dwithin(self):
        mp = "MULTIPOINT ((1 1), (5 5))"
        assert K.distance(mp, "POINT (5 9)") == pytest.approx(4.0)
        assert K.dwithin(mp, "POINT (7 5)", 2.0)
        assert not K.dwithin(mp, "POINT (8 5)", 2.0)
        ml = "MULTILINESTRING ((0 0, 2 0), (10 0, 12 0))"
        assert K.distance(ml, "POINT (6 0)") == pytest.approx(4.0)

    def test_mbb_extraction_in_spark(self, spark):
        from hadoopgis_spark.operators.mbb import with_mbb

        rows = [
            (1, "MULTIPOINT ((1 2), (7 9))"),
            (2, "MULTILINESTRING ((0 0, 3 4), (-2 1, 0 0))"),
            (3, "GEOMETRYCOLLECTION (POINT (5 5), POLYGON ((0 0, 2 0, 0 2, 0 0)))"),
            (4, "GEOMETRYCOLLECTION garbage"),
        ]
        df = spark.createDataFrame(rows, "id long, geom string")
        got = {r.id: (r.xmin, r.ymin, r.xmax, r.ymax) for r in with_mbb(df, "geom").collect()}
        assert got[1] == (1.0, 2.0, 7.0, 9.0)
        assert got[2] == (-2.0, 0.0, 3.0, 4.0)
        assert got[3] == (0.0, 0.0, 5.0, 5.0)
        assert 4 not in got or got[4] == (None, None, None, None)


class TestKernelProperties:
    @given(a=triangles(), b=triangles())
    @settings(max_examples=100, deadline=None)
    def test_intersection_bounds(self, a, b):
        ga, gb = Geometry(*a), Geometry(*b)
        ia = K.intersection_area(ga, gb)
        assert -1e-9 <= ia <= min(ga.area, gb.area) + 1e-6 * max(1.0, ga.area, gb.area)

    @given(a=triangles(), b=triangles())
    @settings(max_examples=100, deadline=None)
    def test_predicate_consistency(self, a, b):
        ga, gb = Geometry(*a), Geometry(*b)
        inter = K.intersects(ga, gb)
        assert inter == K.intersects(gb, ga)
        assert K.disjoint(ga, gb) == (not inter)
        if K.contains(ga, gb):
            assert inter
            assert K.within(gb, ga)
        if not inter:
            assert K.distance(ga, gb) > 0 or ga.area == 0 or gb.area == 0

    @given(a=triangles())
    @settings(max_examples=100, deadline=None)
    def test_self_identity(self, a):
        ga = Geometry(*a)
        if ga.area < 1e-6:
            return
        assert K.equals(ga, ga)
        assert K.jaccard(ga, ga) == pytest.approx(1.0, rel=1e-6)
        assert K.distance(ga, ga) == 0.0

    @given(p=points(), a=triangles())
    @settings(max_examples=100, deadline=None)
    def test_point_polygon_consistency(self, p, a):
        gp, ga = Geometry(*p), Geometry(*a)
        if K.contains(ga, gp):
            assert K.intersects(gp, ga)
            assert K.distance(gp, ga) == 0.0

    @given(a=triangles(), b=triangles())
    @settings(max_examples=50, deadline=None)
    def test_wkt_roundtrip_preserves_predicates(self, a, b):
        # serialize → parse → identical predicate results
        ga = Geometry.from_wkt(to_wkt(a))
        gb = Geometry.from_wkt(to_wkt(b))
        assert K.intersects(ga, gb) == K.intersects(Geometry(*a), Geometry(*b))


class TestWkbSparkPath:
    def test_spatial_join_on_wkb(self, spark):
        """The engine operators accept WKB binary geometry columns."""
        import random

        from hadoopgis_spark.functions.spatial import st_as_wkb, st_as_wkt
        from hadoopgis_spark.operators import spatial_join
        from pyspark.sql import functions as F

        rng = random.Random(21)
        rows = []
        for i in range(150):
            x, y = rng.uniform(0, 300), rng.uniform(0, 300)
            rows.append((i, f"POLYGON (({x:.3f} {y:.3f}, {x+8:.3f} {y:.3f}, {x:.3f} {y+8:.3f}, {x:.3f} {y:.3f}))"))
        wkt_df = spark.createDataFrame(rows, "id long, geom string")
        wkb_df = wkt_df.select("id", st_as_wkb(F.col("geom")).alias("geom"))
        expected = {
            (r.id_1, r.id_2)
            for r in spatial_join(wkt_df, None, "st_intersects", bucket_size=40)
            .select("id_1", "id_2").collect()
        }
        got = {
            (r.id_1, r.id_2)
            for r in spatial_join(wkb_df, None, "st_intersects", bucket_size=40)
            .select("id_1", "id_2").collect()
        }
        assert got == expected and len(got) > 0

    def test_wkb_wkt_roundtrip_in_spark(self, spark):
        from hadoopgis_spark.functions.spatial import st_as_wkb, st_as_wkt
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "POLYGON ((0 0, 4 0, 0 4, 0 0))"), (2, "POINT (3.5 -2)"), (3, "bogus")],
            "id long, geom string",
        )
        back = df.select(
            "id", st_as_wkt(st_as_wkb(F.col("geom"))).alias("rt")
        ).collect()
        vals = {r.id: r.rt for r in back}
        assert vals[1] == "POLYGON ((0 0, 4 0, 0 4, 0 0))"
        assert vals[2] == "POINT (3.5 -2)"
        assert vals[3] is None


class TestBatchFromWkb:
    """batch_from_wkb must agree exactly with from_wkb row-by-row —
    same payload bytes-to-doubles, None exactly where the scalar
    decoder fails — across fast-path shapes, slow-path shapes, and
    malformed interleavings."""

    @staticmethod
    def _scalar(v):
        import struct as _st

        try:
            return from_wkb(v)
        except (ValueError, IndexError, TypeError, _st.error):
            return None

    @staticmethod
    def _eq(a, b):
        if a is None or b is None:
            return a is b
        ka, pa = a
        kb, pb = b
        if ka != kb:
            return False
        if ka == "POINT":
            return pa == pb
        if ka in ("LINESTRING", "MULTIPOINT"):
            return np.array_equal(pa, pb)
        if ka in ("POLYGON", "MULTILINESTRING"):
            return len(pa) == len(pb) and all(
                np.array_equal(x, y) for x, y in zip(pa, pb))
        if ka == "MULTIPOLYGON":
            return len(pa) == len(pb) and all(
                len(x) == len(y)
                and all(np.array_equal(u, v) for u, v in zip(x, y))
                for x, y in zip(pa, pb))
        if ka == "GEOMETRYCOLLECTION":
            return len(pa) == len(pb) and all(
                TestBatchFromWkb._eq(x, y) for x, y in zip(pa, pb))
        return False

    def test_mixed_batch_parity_and_bbox(self):
        import random

        from hadoopgis_spark.geometry.wkb import batch_from_wkb

        rng = random.Random(11)
        cases = []
        for i in range(400):
            x, y = rng.uniform(-1e4, 1e4), rng.uniform(-1e4, 1e4)
            k = rng.random()
            if k < 0.3:
                cases.append(to_wkb(("POINT", (x, y))))
            elif k < 0.55:
                ring = np.array([[x, y], [x + 3, y], [x, y + 4], [x, y]])
                cases.append(to_wkb(("POLYGON", [ring])))
            elif k < 0.7:
                pts = np.array([[x, y], [x + 1, y + 2], [x - 5, y]])
                cases.append(to_wkb(("LINESTRING", pts)))
            elif k < 0.8:  # multi-ring polygon -> scalar path
                shell = np.array([[x, y], [x + 9, y], [x, y + 9], [x, y]])
                hole = np.array(
                    [[x + 1, y + 1], [x + 2, y + 1], [x + 1, y + 2],
                     [x + 1, y + 1]])
                cases.append(to_wkb(("POLYGON", [shell, hole])))
            elif k < 0.9:  # multipolygon -> scalar path
                r1 = np.array([[x, y], [x + 1, y], [x, y + 1], [x, y]])
                cases.append(to_wkb(("MULTIPOLYGON", [[r1], [r1 + 20]])))
            else:  # malformed
                cases.append(bytes([rng.randrange(256)
                                    for _ in range(rng.randrange(30))]))
        cases += [None, b"", b"\x01", b"\x01\x03\x00\x00\x00"]
        res, bbs = batch_from_wkb(cases, with_bbox=True)
        for i, c in enumerate(cases):
            s = self._scalar(c)
            assert self._eq(res[i], s), (i, repr(c)[:40])
            if bbs[i] is not None:
                g = Geometry(*s)
                assert tuple(bbs[i]) == tuple(map(float, g.bbox)), i

    def test_truncated_and_lying_headers_fall_back(self):
        from hadoopgis_spark.geometry.wkb import batch_from_wkb

        good = to_wkb(("POINT", (1.5, -2.5)))
        ring = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0], [0.0, 0.0]])
        poly = to_wkb(("POLYGON", [ring]))
        cases = [
            good[:-1],              # truncated point
            poly[:-8],              # truncated polygon
            poly + b"\x00" * 4,     # trailing junk (length mismatch)
            b"\x00" + good[1:],     # big-endian flag
            good, poly,             # sane rows interleaved
        ]
        res = batch_from_wkb(cases)
        for i, c in enumerate(cases):
            assert self._eq(res[i], self._scalar(c)), i
        assert res[4] is not None and res[5] is not None
