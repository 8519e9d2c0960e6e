"""Geometry kernel unit tests (no Spark).

Semantics under test mirror /root/reference/src/resque/spjoin_2d.hpp
(predicates) and src/extensions/specialmeasures (measures). Intersection
areas are cross-checked against a Monte-Carlo estimator on random
triangles, the reference's own test-shape
(test/datagenerator/generatePolygons.py:26-41).
"""

import math
import random

import numpy as np
import pytest

from hadoopgis_spark.geometry import (
    Geometry,
    area,
    contains,
    dice,
    disjoint,
    distance,
    dwithin,
    equals,
    haversine_distance,
    intersection_area,
    intersects,
    jaccard,
    overlaps,
    parse_wkt,
    to_wkt,
    touches,
    union_area,
    within,
)

SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
SQ_SHIFT = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
SQ_FAR = "POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))"
SQ_TOUCH = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"
SQ_INNER = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
DONUT = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
TRI = "POLYGON ((0 0, 4 0, 0 4, 0 0))"
CONCAVE = "POLYGON ((0 0, 10 0, 10 10, 5 2, 0 10, 0 0))"


class TestWkt:
    def test_point_roundtrip(self):
        k, p = parse_wkt("POINT (3.5 -2)")
        assert k == "POINT" and p == (3.5, -2.0)
        assert to_wkt((k, p)) == "POINT (3.5 -2)"

    def test_polygon_with_hole(self):
        k, rings = parse_wkt(DONUT)
        assert k == "POLYGON" and len(rings) == 2
        assert len(rings[0]) == 5

    def test_unclosed_ring_gets_closed(self):
        k, rings = parse_wkt("POLYGON ((0 0, 1 0, 1 1))")
        assert (rings[0][0] == rings[0][-1]).all()

    def test_multipolygon(self):
        k, polys = parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
        assert k == "MULTIPOLYGON" and len(polys) == 2

    def test_malformed_raises(self):
        for bad in ["", "   ", "FOO (1 2)", "POLYGON ()", "POINT (x y)", None]:
            with pytest.raises(ValueError):
                parse_wkt(bad)


class TestPredicates:
    def test_intersects_overlap(self):
        assert intersects(SQ, SQ_SHIFT)
        assert not intersects(SQ, SQ_FAR)
        assert disjoint(SQ, SQ_FAR)

    def test_intersects_touching_edge(self):
        assert intersects(SQ, SQ_TOUCH)
        assert touches(SQ, SQ_TOUCH)
        assert not touches(SQ, SQ_SHIFT)  # interiors overlap

    def test_containment_no_boundary_contact(self):
        assert intersects(SQ, SQ_INNER)
        assert contains(SQ, SQ_INNER)
        assert within(SQ_INNER, SQ)
        assert not contains(SQ_INNER, SQ)

    def test_contains_excludes_hole(self):
        inner = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"  # inside the donut hole
        assert not contains(DONUT, inner)
        assert contains(DONUT, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")

    def test_point_predicates(self):
        assert intersects("POINT (5 5)", SQ)
        assert contains(SQ, "POINT (5 5)")
        assert not contains(SQ, "POINT (0 0)")  # boundary: not contained
        assert intersects("POINT (0 0)", SQ)  # but does intersect
        assert not intersects("POINT (11 11)", SQ)
        assert not intersects("POINT (5 5)", DONUT)  # in the hole

    def test_equals(self):
        assert equals(SQ, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        # same region, different vertex order/start
        assert equals(SQ, "POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))")
        assert not equals(SQ, SQ_SHIFT)

    def test_overlaps(self):
        assert overlaps(SQ, SQ_SHIFT)
        assert not overlaps(SQ, SQ_INNER)  # containment is not overlap
        assert not overlaps(SQ, SQ_FAR)
        assert not overlaps(SQ, SQ_TOUCH)  # touching is not overlap

    def test_vertex_touch_and_eps_consistency(self):
        """Regression (round-1 verdict): predicate/measure consistency at
        boundary contact. Triangles sharing a single vertex intersect
        (GEOS: closure ∩ closure ≠ ∅), and whenever distance()==0 the
        pair must also report intersects — including pairs separated by
        less than the kernel eps, where the old exact bbox prefilter
        rejected the pair the eps-tolerant segment test accepts."""
        t1 = "POLYGON ((0 0, 1 0, 0 1, 0 0))"
        t2 = "POLYGON ((1 0, 2 0, 1 1, 1 0))"  # shares only vertex (1,0)
        assert intersects(t1, t2)
        assert touches(t1, t2)
        assert distance(t1, t2) == 0.0
        # separated by 1e-12 < _EPS: distance() reports 0 via the
        # eps-tolerant segment test, so intersects must agree
        t3 = "POLYGON ((1.000000000001 0, 2 0, 1.000000000001 1, 1.000000000001 0))"
        d = distance(t1, t3)
        i = intersects(t1, t3)
        assert i == intersects(t3, t1)
        assert (d == 0.0) <= i  # distance 0 implies intersects
        # well-separated pairs stay disjoint
        t4 = "POLYGON ((1.001 0, 2 0, 1.001 1, 1.001 0))"
        assert not intersects(t1, t4)
        assert distance(t1, t4) > 0

    def test_concave_intersects(self):
        # the notch region (above edges (0,10)-(5,2)-(10,10)) is exterior
        in_notch = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"
        assert not intersects(CONCAVE, in_notch)
        # straddles the notch boundary: intersects but is not contained
        straddle = "POLYGON ((4 1, 6 1, 6 3, 4 3, 4 1))"
        assert intersects(CONCAVE, straddle)
        assert not contains(CONCAVE, straddle)
        assert contains(CONCAVE, "POLYGON ((1 0.5, 9 0.5, 9 1.5, 1 1.5, 1 0.5))")


class TestMeasures:
    def test_area(self):
        assert area(SQ) == pytest.approx(100.0)
        assert area(TRI) == pytest.approx(8.0)
        assert area(DONUT) == pytest.approx(100.0 - 16.0)
        assert area(CONCAVE) == pytest.approx(100 - 2 * (0.5 * 5 * 8))

    def test_intersection_squares(self):
        assert intersection_area(SQ, SQ_SHIFT) == pytest.approx(25.0)
        assert intersection_area(SQ, SQ_INNER) == pytest.approx(4.0)
        assert intersection_area(SQ, SQ_FAR) == 0.0
        assert intersection_area(SQ, SQ_TOUCH) == pytest.approx(0.0, abs=1e-9)

    def test_intersection_with_hole(self):
        # probe overlapping donut: covers [2,8]x[2,8]=36 minus hole 16
        probe = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"
        assert intersection_area(DONUT, probe) == pytest.approx(36.0 - 16.0)

    def test_union_jaccard_dice(self):
        assert union_area(SQ, SQ_SHIFT) == pytest.approx(175.0)
        assert jaccard(SQ, SQ_SHIFT) == pytest.approx(25.0 / 175.0)
        assert dice(SQ, SQ_SHIFT) == pytest.approx(50.0 / 200.0)

    def test_distance(self):
        assert distance("POINT (0 0)", "POINT (3 4)") == pytest.approx(5.0)
        assert distance(SQ, SQ_FAR) == pytest.approx(math.hypot(90, 90))
        assert distance(SQ, SQ_SHIFT) == 0.0
        assert distance("POINT (15 5)", SQ) == pytest.approx(5.0)

    def test_dwithin(self):
        assert dwithin(SQ, SQ_TOUCH, 0.0)
        assert dwithin(SQ, SQ_FAR, 200.0)
        assert not dwithin(SQ, SQ_FAR, 10.0)

    def test_haversine_reference_constants(self):
        # 1 degree of longitude at the equator with R=3958.75mi * 1609 m/mi
        d = haversine_distance("POINT (0 0)", "POINT (1 0)")
        expected = 3958.75 * 1609.00 * math.radians(1.0)
        assert d == pytest.approx(expected, rel=1e-9)


def _rand_triangle(rng, extent=100.0, size=20.0):
    x, y = rng.uniform(0, extent), rng.uniform(0, extent)
    pts = [(x, y)]
    for _ in range(2):
        pts.append((x + rng.uniform(-size, size), y + rng.uniform(-size, size)))
    ring = pts + [pts[0]]
    return "POLYGON ((" + ", ".join(f"{a} {b}" for a, b in ring) + "))"


class TestRectFastPathEquivalence:
    """The is_rect O(1) fast paths must agree bit-for-bit with the
    segment/clipping general path. Forcing the slow path: insert a
    collinear midpoint on one edge — the shape is identical, but the
    6-point ring defeats rect detection."""

    @staticmethod
    def _rect_pair(rng):
        x0 = rng.uniform(-50, 50)
        y0 = rng.uniform(-50, 50)
        w = rng.uniform(0.5, 30)
        h = rng.uniform(0.5, 30)
        return x0, y0, x0 + w, y0 + h

    @staticmethod
    def _fast(x0, y0, x1, y1):
        return Geometry.from_wkt(
            f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        )

    @staticmethod
    def _slow(x0, y0, x1, y1):
        xm = (x0 + x1) / 2.0
        return Geometry.from_wkt(
            f"POLYGON (({x0} {y0}, {xm} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        )

    def test_detection(self):
        f = self._fast(0, 0, 10, 10)
        s = self._slow(0, 0, 10, 10)
        assert f.is_rect and not s.is_rect
        assert not Geometry.from_wkt(TRI).is_rect
        assert not Geometry.from_wkt(DONUT).is_rect

    def test_random_rect_pairs_agree(self):
        from hadoopgis_spark.geometry.kernel import _point_in_polygon

        rng = random.Random(13)
        pairs = []
        for _ in range(120):
            a = self._rect_pair(rng)
            # mix: independent, touching-edge, shared-corner, nested
            kind = rng.randrange(4)
            if kind == 0:
                b = self._rect_pair(rng)
            elif kind == 1:  # share the right edge exactly
                b = (a[2], a[1] + rng.uniform(-5, 5), a[2] + 7, a[3] + 5)
            elif kind == 2:  # exact corner contact
                b = (a[2], a[3], a[2] + 3, a[3] + 4)
            else:  # nested
                b = (a[0] + 0.25, a[1] + 0.25, a[2] - 0.25, a[3] - 0.25)
                if b[0] >= b[2] or b[1] >= b[3]:
                    b = self._rect_pair(rng)
            pairs.append((a, b))
        for a, b in pairs:
            fa, fb = self._fast(*a), self._fast(*b)
            sa, sb = self._slow(*a), self._slow(*b)
            assert fa.is_rect and fb.is_rect and not sa.is_rect and not sb.is_rect
            assert intersects(fa, fb) == intersects(sa, sb), (a, b)
            assert intersection_area(fa, fb) == pytest.approx(
                intersection_area(sa, sb), abs=1e-9
            ), (a, b)
            assert distance(fa, fb) == pytest.approx(distance(sa, sb), abs=1e-9), (a, b)
            # point-in-polygon tri-state on probe points incl. boundary
            probes = [
                ((a[0] + a[2]) / 2, (a[1] + a[3]) / 2),
                (a[0], a[1]),
                (a[2], (a[1] + a[3]) / 2),
                (a[0] - 1e-9, a[1]),
                (a[2] + 5.0, a[3] + 5.0),
            ]
            for x, y in probes:
                assert _point_in_polygon(x, y, fa) == _point_in_polygon(x, y, sa), (
                    x,
                    y,
                    a,
                )


class TestMonteCarloCrossCheck:
    """intersection_area vs. a hit-count estimator on random triangles."""

    def test_random_triangle_pairs(self):
        rng = random.Random(42)
        np_rng = np.random.default_rng(42)
        from hadoopgis_spark.geometry.kernel import _point_in_polygon

        geoms = [Geometry.from_wkt(_rand_triangle(rng)) for _ in range(40)]
        geoms = [g for g in geoms if g.area >= 1.0]
        checked = 0
        for i in range(len(geoms)):
            for j in range(i + 1, len(geoms)):
                ga, gb = geoms[i], geoms[j]
                if not intersects(ga, gb):
                    assert intersection_area(ga, gb) == 0.0
                    continue
                ia = intersection_area(ga, gb)
                # Monte-Carlo estimate over ga's bbox
                x0, y0, x1, y1 = ga.bbox
                n = 3000
                xs = np_rng.uniform(x0, x1, n)
                ys = np_rng.uniform(y0, y1, n)
                hits = sum(
                    1
                    for x, y in zip(xs, ys)
                    if _point_in_polygon(x, y, ga) == 2 and _point_in_polygon(x, y, gb) == 2
                )
                est = hits / n * (x1 - x0) * (y1 - y0)
                tol = max(3.0, 0.35 * max(ia, est))
                assert abs(ia - est) <= tol, (ia, est)
                if ia > 0:
                    checked += 1
                if checked >= 25:
                    return
        assert checked >= 10  # enough genuinely-intersecting pairs exercised

    def test_symmetry_properties(self):
        rng = random.Random(7)
        for _ in range(40):
            wa, wb = _rand_triangle(rng), _rand_triangle(rng)
            assert intersects(wa, wb) == intersects(wb, wa)
            assert intersection_area(wa, wb) == pytest.approx(
                intersection_area(wb, wa), rel=1e-6, abs=1e-9
            )
            assert distance(wa, wb) == pytest.approx(distance(wb, wa), rel=1e-9, abs=1e-12)
            if intersects(wa, wb):
                assert distance(wa, wb) == 0.0
            else:
                assert intersection_area(wa, wb) == 0.0

    def test_containment_consistency(self):
        rng = random.Random(11)
        for _ in range(30):
            w = _rand_triangle(rng)
            g = Geometry.from_wkt(w)
            if g.area < 1.0:
                continue
            assert contains(w, w) or g.area == 0
            assert equals(w, w)
            assert intersection_area(w, w) == pytest.approx(g.area, rel=1e-6)
            assert jaccard(w, w) == pytest.approx(1.0, rel=1e-6)


class TestBatchDistanceParity:
    """Round-10 vectorized distance kernels: bit-identical (==, not
    approx) to the scalar kernel on every routed shape — the same hard
    requirement the batch intersects path carries."""

    @staticmethod
    def _ring(rng, cx, cy, r, nv):
        import math as m
        pts = []
        for j in range(nv):
            a = 2 * m.pi * j / nv + rng.uniform(0, 0.4)
            rr = r * rng.uniform(0.4, 1.0)
            pts.append((cx + rr * m.cos(a), cy + rr * m.sin(a)))
        pts.append(pts[0])
        return np.asarray(pts, dtype=np.float64)

    def test_ring_pairs_match_scalar_exactly(self):
        from hadoopgis_spark.geometry import kernel as K
        from hadoopgis_spark.geometry.vectorized import (
            batch_single_ring_distance, batch_single_ring_intersects)
        from hadoopgis_spark.geometry.kernel import Geometry

        rng = random.Random(23)
        ra, rb, expect = [], [], []
        pairs = []
        for _ in range(400):
            # mix: far apart, near, overlapping (overlaps resolved to
            # 0.0 by the intersects-first order, like the scalar)
            d = rng.choice([0.0, 1.0, 3.0, 15.0, 80.0])
            A = self._ring(rng, rng.uniform(0, 100), rng.uniform(0, 100),
                           rng.uniform(1, 5), rng.randrange(3, 9))
            B = self._ring(rng, A[0][0] + d * rng.uniform(0.6, 1.4),
                           A[0][1] + d * rng.uniform(-1, 1),
                           rng.uniform(1, 5), rng.randrange(3, 9))
            ga = Geometry("POLYGON", [A])
            gb = Geometry("POLYGON", [B])
            pairs.append((ga, gb))
            ra.append(A)
            rb.append(B)
            expect.append(K.distance(ga, gb))
        inter = batch_single_ring_intersects(ra, rb)
        got = np.zeros(len(ra))
        dis = np.nonzero(~inter)[0]
        got[dis] = batch_single_ring_distance(
            [ra[j] for j in dis], [rb[j] for j in dis])
        mismatches = [
            (i, got[i], expect[i]) for i in range(len(ra))
            if got[i] != expect[i]
        ]
        assert not mismatches, mismatches[:5]
        assert (got[dis] > 0).any() and inter.any()  # both tiers hit

    def test_point_to_ring_matches_scalar_exactly(self):
        from hadoopgis_spark.geometry import kernel as K
        from hadoopgis_spark.geometry.vectorized import (
            batch_points_in_single_ring, batch_points_to_single_ring_distance)
        from hadoopgis_spark.geometry.kernel import Geometry

        rng = random.Random(31)
        pts, rings, expect = [], [], []
        for _ in range(400):
            R = self._ring(rng, rng.uniform(0, 50), rng.uniform(0, 50),
                           rng.uniform(1, 6), rng.randrange(3, 9))
            # half the points inside-ish, half away
            if rng.random() < 0.5:
                p = (R[0][0] + rng.uniform(-1, 1), R[0][1] + rng.uniform(-1, 1))
            else:
                p = (rng.uniform(-100, 150), rng.uniform(-100, 150))
            pts.append(p)
            rings.append(R)
            expect.append(
                K.distance(Geometry("POINT", p), Geometry("POLYGON", [R])))
        P = np.asarray(pts, dtype=np.float64)
        ins = batch_points_in_single_ring(P, rings)
        got = np.zeros(len(pts))
        dis = np.nonzero(~ins)[0]
        got[dis] = batch_points_to_single_ring_distance(
            P[dis], [rings[j] for j in dis])
        mismatches = [
            (i, got[i], expect[i]) for i in range(len(pts))
            if got[i] != expect[i]
        ]
        assert not mismatches, mismatches[:5]
        assert ins.any() and (got > 0).any()


class TestColumnarRefineParity:
    """The round-11 columnar refine (factorized codes + per-unique numpy
    columns + padded kernels) must be BIT-identical to the scalar
    kernel on every shape mix: points, triangles, rects, big polygons,
    holes, multis, linestrings, malformed rows, and nulls."""

    def _mixed(self, seed, n):
        import random as _r
        rng = _r.Random(seed)
        vals = []
        for _ in range(n):
            roll = rng.random()
            x, y = rng.uniform(0, 60), rng.uniform(0, 60)
            s = rng.uniform(0.5, 8.0)
            if roll < 0.28:
                vals.append(f"POINT ({x:.4f} {y:.4f})")
            elif roll < 0.56:  # triangle (single ring, vectorizable)
                vals.append(f"POLYGON (({x:.3f} {y:.3f}, {x + s:.3f} {y:.3f}, "
                            f"{x:.3f} {y + s:.3f}, {x:.3f} {y:.3f}))")
            elif roll < 0.7:  # axis-aligned rect (is_rect branch)
                vals.append(f"POLYGON (({x:.3f} {y:.3f}, {x + s:.3f} {y:.3f}, "
                            f"{x + s:.3f} {y + s:.3f}, {x:.3f} {y + s:.3f}, "
                            f"{x:.3f} {y:.3f}))")
            elif roll < 0.78:  # big ring (> MAX_VECTOR_VERTS -> scalar)
                import math as _m
                pts = ", ".join(
                    f"{x + s * _m.cos(2 * _m.pi * i / 20):.3f} "
                    f"{y + s * _m.sin(2 * _m.pi * i / 20):.3f}"
                    for i in range(20))
                vals.append(f"POLYGON (({pts}))")
            elif roll < 0.84:
                vals.append(f"LINESTRING ({x:.3f} {y:.3f}, {x + s:.3f} {y + s:.3f})")
            elif roll < 0.9:
                vals.append(
                    f"MULTIPOLYGON ((({x:.2f} {y:.2f}, {x + s:.2f} {y:.2f}, "
                    f"{x:.2f} {y + s:.2f}, {x:.2f} {y:.2f})))")
            elif roll < 0.95:
                vals.append("garbage wkt")
            else:
                vals.append(None)
        # force repeats so factorization actually shares uniques
        for i in range(0, n, 7):
            vals[i] = vals[(i * 3 + 1) % n]
        return vals

    def test_intersects_and_distance_bit_parity(self):
        import pandas as pd

        from hadoopgis_spark.functions import spatial as SP
        from hadoopgis_spark.geometry import kernel as K

        n = 600
        w1 = pd.Series(self._mixed(1, n))
        w2 = pd.Series(self._mixed(2, n))
        got_i = SP.st_intersects.func(w1, w2)
        got_d = SP.st_distance.func(w1, w2)

        def g(v):
            if v is None:
                return None
            try:
                from hadoopgis_spark.geometry.wkt import parse_wkt
                k, p = parse_wkt(v)
                return K.Geometry(k, p)
            except Exception:
                return None

        for i in range(n):
            a, b = g(w1[i]), g(w2[i])
            if a is None or b is None:
                assert got_i[i] is None and got_d[i] is None, i
                continue
            exp_i = K.intersects(a, b)
            exp_d = K.distance(a, b)
            assert bool(got_i[i]) == bool(exp_i), (i, w1[i], w2[i])
            assert float(got_d[i]) == float(exp_d), (
                i, w1[i], w2[i], float(got_d[i]), float(exp_d))

    def test_dwithin_columnar_parity(self):
        import pandas as pd

        from hadoopgis_spark.functions import spatial as SP
        from hadoopgis_spark.geometry import kernel as K
        from hadoopgis_spark.geometry.wkt import parse_wkt

        n = 400
        w1 = pd.Series(self._mixed(3, n))
        w2 = pd.Series(self._mixed(4, n))
        d = 5.0
        got = SP.st_dwithin_pd(w1, w2, d)
        for i in range(n):
            try:
                a = K.Geometry(*parse_wkt(w1[i])) if w1[i] else None
            except Exception:
                a = None
            try:
                b = K.Geometry(*parse_wkt(w2[i])) if w2[i] else None
            except Exception:
                b = None
            if a is None or b is None:
                assert got[i] is None, i
            else:
                assert bool(got[i]) == K.dwithin(a, b, d), (i, w1[i], w2[i])


class TestBatchParseParity:
    """wkt.batch_parse must agree exactly with parse_wkt row-by-row —
    same payload values (strtod-identical), same ring closure, and None
    exactly where the scalar parser raises."""

    @staticmethod
    def _scalar(v):
        from hadoopgis_spark.geometry.wkt import parse_wkt

        try:
            return parse_wkt(v)
        except (ValueError, IndexError, TypeError, AttributeError):
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
            return repr(pa) == repr(pb)  # repr-compare handles nan
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
                TestBatchParseParity._eq(x, y) for x, y in zip(pa, pb))
        return False

    ADVERSARIAL = [
        "POINT (1 2)", "POINT(3.5 -4.5)", "point (1e3 .5)", "Point ( 7 8 )",
        "POINT (1 2 3)", "POINT (1)", "POINT EMPTY", "POINT (1, 2)",
        "LINESTRING (0 0, 1 1)", "LINESTRING(0 0,1 1,2 0)",
        "LINESTRING (0 0)", "LINESTRING (0 0, 1 1 1)",
        "linestring (1.5 2.5, -3 +4)",
        "POLYGON ((0 0, 1 0, 0 1, 0 0))", "POLYGON ((0 0, 2 0, 2 2, 0 2))",
        "POLYGON ((0 0, 1 0))",
        "POLYGON ((0 0, 1 0, 0 1, 0 0), (0.1 0.1, 0.2 0.1, 0.1 0.2, 0.1 0.1))",
        "polygon((5 5,6 5,6 6,5 6,5 5))",
        "MULTIPOINT ((1 2), (3 4))", "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 0 1, 0 0)), ((5 5, 6 5, 5 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 2), POLYGON ((0 0, 1 0, 0 1, 0 0)))",
        "", None, "garbage", "POLYGON", "POLYGON ()", "POLYGON (())",
        "POINT (x y)", "POLYGON ((1 2, 3 x, 5 6, 1 2))",
        "POLYGON ((1.2.3 4, 5 6, 7 8, 1.2.3 4))",
        "POINT (nan inf)", "POINT (1e 2)", "POINT (+ -)",
        "POINT\n(1 2)", "POINT (1 2)",
        "POINT  (  -1.25e-3   4e+2  )",
        "POLYGON ( ( 0 0 , 1 0 , 0 1 , 0 0 ) )",
        "POINTZ (1 2 3)", "POLYGONX ((1 2, 3 4, 5 6))",
        "POLYGON ((0 0, 1 0, 0 1, 0 0)) trailing",
        "  POLYGON ((0 0, 1 0, 0 1, 0 0))",
        "POLYGON\t((0 0, 1 0, 0 1, 0 0))",
        "POLYGON ((0 0, 1 0, 0 1))",  # unclosed -> closes
        "POLYGON ((-8.5e222 1, 2 3, 4 5, -8.5e222 1))",  # sentinel value in data
        # placement-not-count malformations (round-11 advisor findings):
        # counts of parens/commas/tokens match a valid row, placement
        # doesn't — the fast path must reject these to the scalar parser
        "POINT )1 2(", "POINT (1) 2", "LINESTRING(1 2,,3 4 5 6)",
        "POLYGON ))0 0, 1 0, 0 1, 0 0((",
        "LINESTRING (1 2,3 4 5 6,7 8)", "LINESTRING (1,2 3 4)",
        "POINT 1 (2)", "POLYGON (0 0, 1 0, 0 1, 0 0) ()",
        "LINESTRING ()(1 2, 3 4)", "POLYGON ((0 0, 1 0, 0 1, 0 0)()",
        # whitespace-only rows (round-12 advisor finding): a batch whose
        # every eligible row is all-whitespace used to crash the
        # placement check (empty non-space index) instead of yielding
        # None per the malformed-row skip contract
        " ", "   ", "\t", " \t ",
    ]

    def test_whitespace_only_batch(self):
        """A batch containing ONLY whitespace rows (no valid row to
        anchor the non-space index) must return all-None, not raise
        (round-12 advisor finding: nz empty -> nz[-1] IndexError)."""
        from hadoopgis_spark.geometry.wkt import batch_parse

        assert batch_parse([" "]) == [None]
        assert batch_parse([" ", "\t", "  "]) == [None, None, None]
        res, bbs = batch_parse([" ", "   "], with_bbox=True)
        assert res == [None, None] and bbs == [None, None]

    def test_adversarial_rows(self):
        from hadoopgis_spark.geometry.wkt import batch_parse

        res = batch_parse(self.ADVERSARIAL)
        for i, c in enumerate(self.ADVERSARIAL):
            assert self._eq(res[i], self._scalar(c)), (i, c)

    def test_random_rows_and_bbox(self):
        from hadoopgis_spark.geometry.kernel import Geometry
        from hadoopgis_spark.geometry.wkt import batch_parse

        rng = random.Random(42)
        cases = []
        for _ in range(500):
            k = rng.randint(3, 9)
            pts = [(rng.uniform(-1e4, 1e4), rng.uniform(-1e4, 1e4))
                   for _ in range(k)]
            body = ", ".join(f"{x!r} {y!r}" for x, y in pts)
            shape = rng.random()
            if shape < 0.4:
                closed = rng.random() < 0.5
                tail = f", {pts[0][0]!r} {pts[0][1]!r}" if closed else ""
                cases.append(f"POLYGON (({body}{tail}))")
            elif shape < 0.7:
                cases.append(f"LINESTRING ({body})")
            else:
                cases.append(f"POINT ({pts[0][0]!r} {pts[0][1]!r})")
        res, bbs = batch_parse(cases, with_bbox=True)
        for i, c in enumerate(cases):
            s = self._scalar(c)
            assert self._eq(res[i], s), (i, c)
            if bbs[i] is not None:
                g = Geometry(*s)
                assert tuple(bbs[i]) == tuple(g.bbox), (i, c)

    def test_trailing_slow_rows_keep_fast_path(self):
        """A dropped run reaching the batch tail must not leave an
        orphan separator that fails the sentinel check and silently
        degrades EVERY row to the scalar parser (round-11 advisor
        finding). Counted via a parse_wkt wrapper: only the non-fast
        rows may hit the scalar path."""
        from hadoopgis_spark.geometry import wkt as wkt_mod

        cases = ["POINT (1 2)", "LINESTRING (0 0, 1 1)",
                 "bogus row", "MULTIPOINT ((1 2), (3 4))"]
        calls = []
        orig = wkt_mod.parse_wkt
        wkt_mod.parse_wkt = lambda v: (calls.append(v), orig(v))[1]
        try:
            res = wkt_mod.batch_parse(cases)
        finally:
            wkt_mod.parse_wkt = orig
        for i, c in enumerate(cases):
            assert self._eq(res[i], self._scalar(c)), (i, c)
        assert len(calls) == 2, calls  # only the two tail rows

    def test_mixed_fast_slow_batch(self):
        """Rows routed to the scalar path interleave with fast rows
        without shifting the sentinel alignment."""
        from hadoopgis_spark.geometry.wkt import batch_parse

        cases = []
        for i in range(200):
            if i % 5 == 0:
                cases.append("MULTIPOINT ((1 2), (3 4))")
            elif i % 7 == 0:
                cases.append("bogus row")
            else:
                cases.append(f"POLYGON ((0 0, {i} 0, 0 {i}, 0 0))")
        res = batch_parse(cases)
        for i, c in enumerate(cases):
            assert self._eq(res[i], self._scalar(c)), (i, c)
