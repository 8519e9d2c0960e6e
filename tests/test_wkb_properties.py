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
