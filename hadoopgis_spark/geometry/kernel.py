"""Geometry predicates & measures (the RESQUE surface, GEOS-free).

Implements the 12 ``st_`` predicates and the pairwise measures of the
reference engine (predicate dispatch
``/root/reference/src/progparams/resque_params_2d.hpp:164-208``; evaluation
``/root/reference/src/resque/spjoin_2d.hpp:114-266``; measures
``spjoin_2d.hpp:226-264`` + ``src/extensions/specialmeasures/``).

Semantics notes (documented deviations are marked):

* ``st_adjacent`` is an alias of ``!disjoint`` exactly as in the
  reference (``spjoin_2d.hpp:155-157``).
* ``st_dwithin`` follows the reference: euclidean (or haversine with
  ``geography=True``) point–point distance, otherwise distance(g1,g2)<=d
  (the reference buffers g1 by d then intersects — equivalent for the
  boundary-inclusive case; we use the direct distance which is exact,
  the reference's buffer is an approximation with 8*4 quadrant segments).
* area-model predicates (contains/equals/touches/overlaps) are decided
  through exact intersection areas from triangulated clipping — this
  matches GEOS on polygon interiors; boundary-degenerate cases follow
  the area model (e.g. ``contains`` is closure-containment).
"""

from __future__ import annotations

import math

import numpy as np

from hadoopgis_spark.geometry.clip import (
    ring_area,
    simple_intersection_area,
    triangulate,
)
from hadoopgis_spark.geometry.wkt import parse_wkt

__all__ = [
    "Geometry",
    "intersects",
    "touches",
    "crosses",
    "contains",
    "within",
    "equals",
    "overlaps",
    "disjoint",
    "dwithin",
    "distance",
    "haversine_distance",
    "area",
    "intersection_area",
    "union_area",
    "jaccard",
    "dice",
]

_EPS = 1e-9

# Reference constants: EARTH_RADIUS in miles and mile→meter factor
# (/root/reference/src/common/resque_constants_2d.h:2,
#  /root/reference/src/extensions/specialmeasures/geographical.h:20-21)
EARTH_RADIUS_MI = 3958.75
MI_TO_M = 1609.00


class Geometry:
    """Parsed geometry with lazily computed bbox / area / triangulation."""

    __slots__ = ("kind", "payload", "_bbox", "_area", "_tris", "_rect")

    def __init__(self, kind: str, payload):
        self.kind = kind
        self.payload = payload
        self._bbox = None
        self._area = None
        self._tris = None
        self._rect = None

    @classmethod
    def from_wkt(cls, text: str) -> "Geometry":
        kind, payload = parse_wkt(text)
        return cls(kind, payload)

    @classmethod
    def from_wkb(cls, data: bytes) -> "Geometry":
        from hadoopgis_spark.geometry.wkb import from_wkb

        kind, payload = from_wkb(data)
        return cls(kind, payload)

    @classmethod
    def parse(cls, value) -> "Geometry":
        """WKT string or WKB bytes → Geometry."""
        if isinstance(value, (bytes, bytearray, memoryview)):
            return cls.from_wkb(bytes(value))
        return cls.from_wkt(value)

    # -- derived ---------------------------------------------------------
    @property
    def bbox(self) -> tuple[float, float, float, float]:
        if self._bbox is None:
            if self.kind == "POINT":
                x, y = self.payload
                self._bbox = (x, y, x, y)
            elif self.kind in ("LINESTRING", "MULTIPOINT"):
                a = self.payload
                self._bbox = (a[:, 0].min(), a[:, 1].min(), a[:, 0].max(), a[:, 1].max())
            elif self.kind == "POLYGON":
                shell = self.payload[0]
                self._bbox = (
                    float(shell[:, 0].min()),
                    float(shell[:, 1].min()),
                    float(shell[:, 0].max()),
                    float(shell[:, 1].max()),
                )
            elif self.kind == "MULTILINESTRING":
                self._bbox = (
                    float(min(ln[:, 0].min() for ln in self.payload)),
                    float(min(ln[:, 1].min() for ln in self.payload)),
                    float(max(ln[:, 0].max() for ln in self.payload)),
                    float(max(ln[:, 1].max() for ln in self.payload)),
                )
            elif self.kind == "GEOMETRYCOLLECTION":
                boxes = [p.bbox for p in _parts(self)]
                self._bbox = (
                    min(b[0] for b in boxes),
                    min(b[1] for b in boxes),
                    max(b[2] for b in boxes),
                    max(b[3] for b in boxes),
                )
            else:  # MULTIPOLYGON
                xs0 = min(r[0][:, 0].min() for r in self.payload)
                ys0 = min(r[0][:, 1].min() for r in self.payload)
                xs1 = max(r[0][:, 0].max() for r in self.payload)
                ys1 = max(r[0][:, 1].max() for r in self.payload)
                self._bbox = (float(xs0), float(ys0), float(xs1), float(ys1))
        return self._bbox

    @property
    def area(self) -> float:
        if self._area is None:
            if self.kind in ("POINT", "LINESTRING", "MULTIPOINT", "MULTILINESTRING"):
                self._area = 0.0
            elif self.kind == "POLYGON":
                a = abs(ring_area(self.payload[0]))
                for hole in self.payload[1:]:
                    a -= abs(ring_area(hole))
                self._area = a
            elif self.kind == "GEOMETRYCOLLECTION":
                # valid collections have interior-disjoint members (the
                # same validity premise GEOS area assumes) — areas add
                self._area = sum(p.area for p in _parts(self))
            else:
                a = 0.0
                for rings in self.payload:
                    a += abs(ring_area(rings[0]))
                    for hole in rings[1:]:
                        a -= abs(ring_area(hole))
                self._area = a
        return self._area

    @property
    def triangles(self) -> list[tuple[list, list]]:
        """List of (shell_tris, hole_tris) per polygon part."""
        if self._tris is None:
            parts = []
            if self.kind == "POLYGON":
                groups = [self.payload]
            elif self.kind == "MULTIPOLYGON":
                groups = self.payload
            else:
                groups = []
            for rings in groups:
                shell_tris = triangulate(rings[0])
                hole_tris = [t for h in rings[1:] for t in triangulate(h)]
                parts.append((shell_tris, hole_tris))
            self._tris = parts
        return self._tris

    @property
    def is_rect(self) -> bool:
        """True when the geometry is a hole-free axis-aligned rectangle
        (its bbox IS the geometry) — the dominant case for tile tables,
        windows, and raster-derived data. Predicates/measures then reduce
        to O(1) box arithmetic instead of segment loops / clipping."""
        if self._rect is None:
            r = False
            if self.kind == "POLYGON" and len(self.payload) == 1:
                ring = self.payload[0]
                if len(ring) == 5:
                    x0, y0, x1, y1 = self.bbox
                    pts = {(float(p[0]), float(p[1])) for p in ring[:-1]}
                    r = (
                        pts == {(x0, y0), (x1, y0), (x1, y1), (x0, y1)}
                        and x1 > x0
                        and y1 > y0
                    )
            self._rect = r
        return self._rect

    def rings(self):
        """All boundary rings/linestrings as (N,2) arrays."""
        if self.kind in ("POINT", "MULTIPOINT"):
            return []
        if self.kind == "LINESTRING":
            return [self.payload]
        if self.kind == "POLYGON":
            return list(self.payload)
        if self.kind == "MULTILINESTRING":
            return list(self.payload)
        if self.kind == "GEOMETRYCOLLECTION":
            return [r for p in _parts(self) for r in p.rings()]
        return [r for rings in self.payload for r in rings]


def _as_geom(g) -> Geometry:
    if isinstance(g, Geometry):
        return g
    if isinstance(g, str):
        return Geometry.from_wkt(g)
    kind, payload = g
    return Geometry(kind, payload)


# kinds the predicate bodies below don't evaluate directly: they are
# decomposed into primitive parts and combined (any-pair for
# intersection-flavored tests, min for distance, sums for areas) —
# exactly the member-wise semantics GEOS applies to homogeneous multis,
# with the usual validity premise that members are interior-disjoint
_COMPOSITE_KINDS = ("MULTIPOINT", "MULTILINESTRING", "GEOMETRYCOLLECTION")
_POLYGONAL_KINDS = ("POLYGON", "MULTIPOLYGON")


def _parts(g: Geometry) -> list[Geometry]:
    """Decompose into primitive POINT/LINESTRING/POLYGON/MULTIPOLYGON
    parts; primitives return themselves."""
    if g.kind == "MULTIPOINT":
        return [Geometry("POINT", (float(x), float(y))) for x, y in g.payload]
    if g.kind == "MULTILINESTRING":
        return [Geometry("LINESTRING", ln) for ln in g.payload]
    if g.kind == "GEOMETRYCOLLECTION":
        out: list[Geometry] = []
        for kind, payload in g.payload:
            out.extend(_parts(Geometry(kind, payload)))
        return out
    return [g]


def _is_composite(*geoms: Geometry) -> bool:
    return any(g.kind in _COMPOSITE_KINDS for g in geoms)


# -- low-level primitives -------------------------------------------------

def _bbox_intersects(b1, b2, pad: float = 0.0) -> bool:
    return not (
        b1[0] > b2[2] + pad
        or b2[0] > b1[2] + pad
        or b1[1] > b2[3] + pad
        or b2[1] > b1[3] + pad
    )


def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(ax, ay, bx, by, px, py) -> bool:
    return (
        min(ax, bx) - _EPS <= px <= max(ax, bx) + _EPS
        and min(ay, by) - _EPS <= py <= max(ay, by) + _EPS
    )


def _segments_intersect(p1, p2, p3, p4) -> bool:
    d1 = _orient(p3[0], p3[1], p4[0], p4[1], p1[0], p1[1])
    d2 = _orient(p3[0], p3[1], p4[0], p4[1], p2[0], p2[1])
    d3 = _orient(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1])
    d4 = _orient(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1])
    if ((d1 > _EPS and d2 < -_EPS) or (d1 < -_EPS and d2 > _EPS)) and (
        (d3 > _EPS and d4 < -_EPS) or (d3 < -_EPS and d4 > _EPS)
    ):
        return True
    if abs(d1) <= _EPS and _on_segment(p3[0], p3[1], p4[0], p4[1], p1[0], p1[1]):
        return True
    if abs(d2) <= _EPS and _on_segment(p3[0], p3[1], p4[0], p4[1], p2[0], p2[1]):
        return True
    if abs(d3) <= _EPS and _on_segment(p1[0], p1[1], p2[0], p2[1], p3[0], p3[1]):
        return True
    if abs(d4) <= _EPS and _on_segment(p1[0], p1[1], p2[0], p2[1], p4[0], p4[1]):
        return True
    return False


def _point_in_ring(x: float, y: float, ring: np.ndarray) -> int:
    """2 = strictly inside, 1 = on boundary, 0 = outside (ray casting)."""
    xs, ys = ring[:-1, 0], ring[:-1, 1]
    xe, ye = ring[1:, 0], ring[1:, 1]
    # boundary check (vectorized point-to-segment distance == 0)
    dx, dy = xe - xs, ye - ys
    seg_len2 = dx * dx + dy * dy
    t = np.where(seg_len2 > 0, ((x - xs) * dx + (y - ys) * dy) / np.where(seg_len2 > 0, seg_len2, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    px, py = xs + t * dx, ys + t * dy
    d2 = (x - px) ** 2 + (y - py) ** 2
    if (d2 <= _EPS * _EPS).any():
        return 1
    inside = False
    cond = (ys > y) != (ye > y)
    idx = np.nonzero(cond)[0]
    for i in idx:
        xint = xs[i] + (y - ys[i]) / (ye[i] - ys[i]) * (xe[i] - xs[i])
        if x < xint:
            inside = not inside
    return 2 if inside else 0


def _point_in_polygon(x: float, y: float, geom: Geometry) -> int:
    """2 inside, 1 boundary, 0 outside — honoring holes. For a
    GEOMETRYCOLLECTION the classification is against the union of its
    polygonal members (interior of any member wins over boundary)."""
    if geom.kind == "GEOMETRYCOLLECTION":
        best = 0
        for p in _parts(geom):
            if p.kind in _POLYGONAL_KINDS:
                r = _point_in_polygon(x, y, p)
                if r == 2:
                    return 2
                best = max(best, r)
        return best
    if geom.kind == "POLYGON" and geom.is_rect:
        # O(1) rect fast path, same eps-distance-to-outline semantics as
        # the segment-based boundary test below
        x0, y0, x1, y1 = geom.bbox
        dx = max(x0 - x, 0.0, x - x1)
        dy = max(y0 - y, 0.0, y - y1)
        if dx > 0.0 or dy > 0.0:
            return 1 if dx * dx + dy * dy <= _EPS * _EPS else 0
        if min(x - x0, x1 - x, y - y0, y1 - y) <= _EPS:
            return 1
        return 2
    if geom.kind == "POLYGON":
        groups = [geom.payload]
    elif geom.kind == "MULTIPOLYGON":
        groups = geom.payload
    else:
        return 0
    for rings in groups:
        r = _point_in_ring(x, y, rings[0])
        if r == 0:
            continue
        if r == 1:
            return 1
        for hole in rings[1:]:
            h = _point_in_ring(x, y, hole)
            if h == 2:
                r = 0
                break
            if h == 1:
                return 1
        if r:
            return r
    return 0


def _seg_seg_dist2(p1, p2, p3, p4) -> float:
    if _segments_intersect(p1, p2, p3, p4):
        return 0.0
    return min(
        _pt_seg_dist2(p1, p3, p4),
        _pt_seg_dist2(p2, p3, p4),
        _pt_seg_dist2(p3, p1, p2),
        _pt_seg_dist2(p4, p1, p2),
    )


def _pt_seg_dist2(p, a, b) -> float:
    # squares via EXPLICIT multiplication, not ``** 2``: this libm's
    # pow(x, 2.0) is 1 ulp BELOW the correctly-rounded square for some
    # inputs (observed round 10), and the numpy batch kernels
    # (geometry/vectorized.py) compute x*x — multiplication is the
    # IEEE-correct square, and it keeps scalar and batch bit-identical
    ax, ay = a
    bx, by = b
    px, py = p
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    if l2 <= 0:
        ex, ey = px - ax, py - ay
        return ex * ex + ey * ey
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
    ex, ey = px - (ax + t * dx), py - (ay + t * dy)
    return ex * ex + ey * ey


def _boundary_segments(geom: Geometry):
    for ring in geom.rings():
        for i in range(len(ring) - 1):
            yield (ring[i], ring[i + 1])


# -- predicates -----------------------------------------------------------

def intersects(g1, g2) -> bool:
    """GEOS-style intersects (closure ∩ closure ≠ ∅).

    Reference: ``spjoin_2d.hpp:139-141``.
    """
    a, b = _as_geom(g1), _as_geom(g2)
    # Pad the prefilter by the same _EPS the segment/on-segment tests use:
    # an exact bbox gate would reject pairs < _EPS apart that the eps-tolerant
    # distance() still reports as 0.0 (predicate/measure consistency).
    if not _bbox_intersects(a.bbox, b.bbox, pad=_EPS):
        return False
    if _is_composite(a, b):
        return any(intersects(pa, pb) for pa in _parts(a) for pb in _parts(b))
    if a.kind == "POINT" and b.kind == "POINT":
        (x1, y1), (x2, y2) = a.payload, b.payload
        return abs(x1 - x2) <= _EPS and abs(y1 - y2) <= _EPS
    if a.kind == "POINT":
        return _point_touches_or_in(a, b)
    if b.kind == "POINT":
        return _point_touches_or_in(b, a)
    # rect×rect: closed-set intersection ⇔ bbox overlap, and the
    # eps-padded prefilter above just passed — O(1) fast path
    if a.is_rect and b.is_rect:
        return True
    # segment-pair intersection
    segs_b = list(_boundary_segments(b))
    for s1, s2 in _boundary_segments(a):
        for t1, t2 in segs_b:
            if _segments_intersect(s1, s2, t1, t2):
                return True
    # containment without boundary contact
    return _first_vertex_inside(a, b) or _first_vertex_inside(b, a)


def _point_touches_or_in(pt: Geometry, other: Geometry) -> bool:
    x, y = pt.payload
    if other.kind in ("POLYGON", "MULTIPOLYGON"):
        return _point_in_polygon(x, y, other) > 0
    if other.kind == "LINESTRING":
        seq = other.payload
        for i in range(len(seq) - 1):
            if _pt_seg_dist2((x, y), seq[i], seq[i + 1]) <= _EPS * _EPS:
                return True
        return False
    return False


def _first_vertex_inside(a: Geometry, b: Geometry) -> bool:
    if b.kind not in ("POLYGON", "MULTIPOLYGON"):
        return False
    rings = a.rings()
    if not rings:
        if a.kind == "POINT":
            x, y = a.payload
            return _point_in_polygon(x, y, b) > 0
        return False
    x, y = rings[0][0]
    return _point_in_polygon(float(x), float(y), b) > 0


def disjoint(g1, g2) -> bool:
    """``spjoin_2d.hpp:159-161`` (note the reference evaluates this only
    among tile-co-located pairs; the Spark engine documents the same
    caveat in the join API)."""
    return not intersects(g1, g2)


def intersection_area(g1, g2) -> float:
    """Area of g1 ∩ g2 (polygonal inputs; 0 for points/lines).

    Uses triangulated convex clipping with hole inclusion–exclusion:
    area(P∩Q) = a(Sp,Sq) − Σa(Sp,Hq) − Σa(Hp,Sq) + ΣΣa(Hp,Hq).
    """
    a, b = _as_geom(g1), _as_geom(g2)
    if _is_composite(a, b):
        if not _bbox_intersects(a.bbox, b.bbox):
            return 0.0
        pa = [p for p in _parts(a) if p.kind in _POLYGONAL_KINDS]
        pb = [p for p in _parts(b) if p.kind in _POLYGONAL_KINDS]
        # interior-disjoint members (validity premise): pairwise areas add
        return sum(intersection_area(x, y) for x in pa for y in pb)
    if a.kind not in ("POLYGON", "MULTIPOLYGON") or b.kind not in ("POLYGON", "MULTIPOLYGON"):
        return 0.0
    if not _bbox_intersects(a.bbox, b.bbox):
        return 0.0
    if a.is_rect and b.is_rect:
        # exact box intersection — identical value to triangulated
        # clipping of the two rectangles, at O(1)
        ab, bb = a.bbox, b.bbox
        iw = min(ab[2], bb[2]) - max(ab[0], bb[0])
        ih = min(ab[3], bb[3]) - max(ab[1], bb[1])
        return max(0.0, iw) * max(0.0, ih)
    total = 0.0
    for sa, ha in a.triangles:
        for sb, hb in b.triangles:
            total += simple_intersection_area(sa, sb)
            if hb:
                total -= simple_intersection_area(sa, hb)
            if ha:
                total -= simple_intersection_area(ha, sb)
                if hb:
                    total += simple_intersection_area(ha, hb)
    return max(0.0, total)


def _interiors_intersect(a: Geometry, b: Geometry) -> bool:
    if _is_composite(a, b):
        return any(
            _interiors_intersect(x, y) for x in _parts(a) for y in _parts(b)
        )
    if a.kind in ("POLYGON", "MULTIPOLYGON") and b.kind in ("POLYGON", "MULTIPOLYGON"):
        scale = max(abs(v) for v in (*a.bbox, *b.bbox, 1.0))
        return intersection_area(a, b) > _EPS * scale * scale
    if a.kind == "POINT" and b.kind in ("POLYGON", "MULTIPOLYGON"):
        x, y = a.payload
        return _point_in_polygon(x, y, b) == 2
    if b.kind == "POINT" and a.kind in ("POLYGON", "MULTIPOLYGON"):
        x, y = b.payload
        return _point_in_polygon(x, y, a) == 2
    if a.kind == "POINT" and b.kind == "POINT":
        return intersects(a, b)
    # line interiors: approximate via proper crossing
    return intersects(a, b)


def touches(g1, g2) -> bool:
    """Boundaries meet, interiors don't. Reference: ``spjoin_2d.hpp:143-145``."""
    a, b = _as_geom(g1), _as_geom(g2)
    return intersects(a, b) and not _interiors_intersect(a, b)


def crosses(g1, g2) -> bool:
    """GEOS crosses — only meaningful for mixed-dimension pairs; two
    areas never cross. Reference delegates to GEOS (``spjoin_2d.hpp:147-149``).

    Vertex-based line/area semantics (see module docstring); for
    multi/collection inputs the in/out evidence is pooled across every
    line part, so a MULTILINESTRING with one part inside and another
    outside correctly crosses even though no single part does."""
    a, b = _as_geom(g1), _as_geom(g2)
    la, lb = _line_seqs(a), _line_seqs(b)
    if la and _polygonal_content(b):
        return _lines_cross_polygon(la, b)
    if lb and _polygonal_content(a):
        return _lines_cross_polygon(lb, a)
    return False


def _line_seqs(g: Geometry) -> list:
    """Vertex sequences of every line part (LINESTRING /
    MULTILINESTRING / line members of a collection)."""
    if g.kind == "LINESTRING":
        return [g.payload]
    if g.kind == "MULTILINESTRING":
        return list(g.payload)
    if g.kind == "GEOMETRYCOLLECTION":
        return [seq for p in _parts(g) for seq in _line_seqs(p)]
    return []


def _polygonal_content(g: Geometry) -> bool:
    if g.kind in _POLYGONAL_KINDS:
        return True
    if g.kind == "GEOMETRYCOLLECTION":
        return any(p.kind in _POLYGONAL_KINDS for p in _parts(g))
    return False


def _lines_cross_polygon(seqs: list, poly: Geometry) -> bool:
    has_in = any(
        _point_in_polygon(float(x), float(y), poly) == 2 for seq in seqs for x, y in seq
    )
    if not has_in:
        return False
    return any(
        _point_in_polygon(float(x), float(y), poly) == 0 for seq in seqs for x, y in seq
    )


def _line_crosses_polygon(line: Geometry, poly: Geometry) -> bool:
    return _lines_cross_polygon(_line_seqs(line), poly)


def contains(g1, g2) -> bool:
    """g1 contains g2. Envelope short-circuit mirrors ``spjoin_2d.hpp:151-153``.

    Composite ``g2`` decomposes: every part must be contained (the
    union-aware point-in / summed intersection-area helpers make the
    per-part tests correct even when a part straddles two members of a
    composite ``g1``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    ab, bb = a.bbox, b.bbox
    if not (ab[0] <= bb[0] + _EPS and ab[1] <= bb[1] + _EPS and ab[2] >= bb[2] - _EPS and ab[3] >= bb[3] - _EPS):
        return False
    if b.kind in _COMPOSITE_KINDS:
        parts_b = _parts(b)
        return bool(parts_b) and all(contains(a, p) for p in parts_b)
    if a.kind == "MULTIPOINT":
        if b.kind == "POINT":
            x, y = b.payload
            return any(
                abs(float(px) - x) <= _EPS and abs(float(py) - y) <= _EPS
                for px, py in a.payload
            )
        return False
    if b.kind == "POINT":
        x, y = b.payload
        return _point_in_polygon(x, y, a) == 2 if a.kind != "POINT" else intersects(a, b)
    if a.kind == "POINT":
        return False
    if b.kind == "LINESTRING":
        return all(_point_in_polygon(float(x), float(y), a) > 0 for x, y in b.payload) and not _line_crosses_polygon(b, a)
    # area model: contains iff intersection covers b entirely (and b has interior)
    ia = intersection_area(a, b)
    scale = max(abs(v) for v in (*ab, *bb, 1.0))
    return b.area > 0 and ia >= b.area - _EPS * scale * scale


def within(g1, g2) -> bool:
    """``spjoin_2d.hpp:207-209``."""
    return contains(g2, g1)


def equals(g1, g2) -> bool:
    """Envelope short-circuit + area-model equality (``spjoin_2d.hpp:163-165``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    ab, bb = a.bbox, b.bbox
    tol = _EPS * max(abs(v) for v in (*ab, *bb, 1.0))
    if any(abs(ab[i] - bb[i]) > tol for i in range(4)):
        return False
    if a.kind == "POINT" and b.kind == "POINT":
        return True
    ia = intersection_area(a, b)
    return abs(ia - a.area) <= tol * tol + tol and abs(ia - b.area) <= tol * tol + tol


def overlaps(g1, g2) -> bool:
    """Same-dimension partial overlap (``spjoin_2d.hpp:211-213``) —
    evaluated for area-bearing inputs (including collections with
    polygonal members) through the area model."""
    a, b = _as_geom(g1), _as_geom(g2)
    if _polygonal_content(a) and _polygonal_content(b):
        ia = intersection_area(a, b)
        scale = max(abs(v) for v in (*a.bbox, *b.bbox, 1.0))
        tol = _EPS * scale * scale
        return ia > tol and ia < a.area - tol and ia < b.area - tol
    return False


def distance(g1, g2) -> float:
    """Euclidean min distance (GEOS ``DistanceOp``, ``spjoin_2d.hpp:252-263``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    if _is_composite(a, b):
        best = math.inf
        for pa in _parts(a):
            for pb in _parts(b):
                d = distance(pa, pb)
                if d < best:
                    best = d
                    if best == 0.0:
                        return 0.0
        return best
    if a.kind == "POINT" and b.kind == "POINT":
        (x1, y1), (x2, y2) = a.payload, b.payload
        return math.hypot(x1 - x2, y1 - y2)
    if intersects(a, b):
        return 0.0
    if a.is_rect and b.is_rect:
        # corner/edge gap — same expression shape as functions.boxes.box_distance
        ab, bb = a.bbox, b.bbox
        dx = max(0.0, max(bb[0] - ab[2], ab[0] - bb[2]))
        dy = max(0.0, max(bb[1] - ab[3], ab[1] - bb[3]))
        return math.sqrt(dx * dx + dy * dy)
    best = math.inf
    if a.kind == "POINT":
        x, y = a.payload
        for s1, s2 in _boundary_segments(b):
            best = min(best, _pt_seg_dist2((x, y), s1, s2))
        return math.sqrt(best)
    if b.kind == "POINT":
        return distance(b, a)
    segs_b = list(_boundary_segments(b))
    for s1, s2 in _boundary_segments(a):
        for t1, t2 in segs_b:
            d = _seg_seg_dist2(s1, s2, t1, t2)
            if d < best:
                best = d
                if best == 0.0:
                    return 0.0
    return math.sqrt(best)


def haversine_distance(g1, g2, unit_meters: bool = True) -> float:
    """Great-circle point distance with the reference's constants
    (EARTH_RADIUS=3958.75 mi, ×1609.00 → meters;
    ``src/extensions/specialmeasures/geographical.h:11-22``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    if a.kind != "POINT" or b.kind != "POINT":
        raise ValueError("haversine_distance requires POINT geometries")
    (lon1, lat1), (lon2, lat2) = a.payload, b.payload
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon / 2) ** 2
    )
    mi = EARTH_RADIUS_MI * 2 * math.asin(min(1.0, math.sqrt(h)))
    return mi * MI_TO_M if unit_meters else mi


def dwithin(g1, g2, d: float, geography: bool = False) -> bool:
    """``spjoin_2d.hpp:167-205``: point–point direct distance (euclidean
    or haversine), otherwise min-distance ≤ d."""
    a, b = _as_geom(g1), _as_geom(g2)
    if a.kind == "POINT" and b.kind == "POINT" and geography:
        return haversine_distance(a, b) <= d
    if not _bbox_intersects(a.bbox, b.bbox, pad=d):
        return False
    return distance(a, b) <= d


def area(g) -> float:
    """``geom->getArea()`` (``spjoin_2d.hpp:227-231``)."""
    return _as_geom(g).area


def union_area(g1, g2) -> float:
    """area(g1 ∪ g2) = area1 + area2 − intersection (``spjoin_2d.hpp:233-237``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    return a.area + b.area - intersection_area(a, b)


def jaccard(g1, g2) -> float:
    """intersection/union (``extensions/specialmeasures/pathology_metrics.h:1-5``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    ia = intersection_area(a, b)
    ua = a.area + b.area - ia
    return ia / ua if ua > 0 else 0.0


def dice(g1, g2) -> float:
    """2·intersection/(area1+area2) (``pathology_metrics.h:7-11``)."""
    a, b = _as_geom(g1), _as_geom(g2)
    s = a.area + b.area
    return 2.0 * intersection_area(a, b) / s if s > 0 else 0.0
