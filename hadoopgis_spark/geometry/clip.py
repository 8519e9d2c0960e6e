"""Polygon area machinery: shoelace, ear-clip triangulation, convex clip.

Exact intersection area of two arbitrary simple polygons is computed by
triangulating both (ear clipping) and summing pairwise triangle∩triangle
areas (each triangle pair intersection is convex → Sutherland–Hodgman).
Triangles of one triangulation are interior-disjoint, so the sum is the
exact intersection area.

This replaces GEOS ``intersection()->getArea()`` used by the reference
for the ``intersect``/``union``/``jaccard``/``dice`` output fields
(``/root/reference/src/resque/spjoin_2d.hpp:233-250``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ring_area",
    "triangulate",
    "convex_clip_area",
    "simple_intersection_area",
]

_EPS = 1e-12


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (positive = CCW)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y2 - x2 * y) / 2.0)


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c, eps) -> bool:
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    has_neg = (d1 < -eps) or (d2 < -eps) or (d3 < -eps)
    has_pos = (d1 > eps) or (d2 > eps) or (d3 > eps)
    return not (has_neg and has_pos)


def triangulate(ring: np.ndarray) -> list[np.ndarray]:
    """Ear-clip a simple closed ring into triangles (each (3,2) ndarray).

    O(n^2); polygons in this workload are small (reference test data is
    triangles, ``test/datagenerator/generatePolygons.py:26-41``).
    Degenerate (zero-area) ears are dropped.
    """
    pts = ring[:-1] if (ring[0] == ring[-1]).all() else ring
    n = len(pts)
    if n < 3:
        return []
    if n == 3:
        return [np.asarray(pts, dtype=np.float64)]
    # work on CCW orientation
    area = ring_area(np.vstack([pts, pts[:1]]))
    if area < 0:
        pts = pts[::-1]
    idx = list(range(len(pts)))
    tris: list[np.ndarray] = []
    scale = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1.0)
    eps = _EPS * scale * scale
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        ear_found = False
        m = len(idx)
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = pts[i0], pts[i1], pts[i2]
            cr = _cross(a, b, c)
            if cr <= eps:  # reflex or degenerate
                if abs(cr) <= eps:
                    # collinear vertex: clip it away as a zero-area ear
                    idx.pop(k)
                    ear_found = True
                    break
                continue
            # no other vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                if _point_in_tri(pts[j], a, b, c, eps):
                    ok = False
                    break
            if ok:
                tris.append(np.asarray([a, b, c], dtype=np.float64))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:
            # fallback: fan from first vertex (correct only for convex
            # remainder, but prevents infinite loops on degenerate input)
            break
    if len(idx) >= 3:
        base = idx[0]
        for k in range(1, len(idx) - 1):
            tri = np.asarray([pts[base], pts[idx[k]], pts[idx[k + 1]]], dtype=np.float64)
            if abs(_cross(tri[0], tri[1], tri[2])) > eps:
                tris.append(tri)
    return tris


def convex_clip_area(subject: np.ndarray, clip: np.ndarray) -> float:
    """Area of subject ∩ clip where ``clip`` is convex CCW (open rings, (N,2)).

    Sutherland–Hodgman; subject must also be convex for exactness (we
    only pass triangles).
    """
    output = [tuple(p) for p in subject]
    n = len(clip)
    for i in range(n):
        if not output:
            return 0.0
        cp1 = clip[i]
        cp2 = clip[(i + 1) % n]
        input_list = output
        output = []
        prev = input_list[-1]
        prev_side = _cross(cp1, cp2, prev)
        for cur in input_list:
            cur_side = _cross(cp1, cp2, cur)
            if cur_side >= -_EPS:  # inside (left of edge)
                if prev_side < -_EPS:
                    output.append(_line_intersect(prev, cur, cp1, cp2))
                output.append(cur)
            elif prev_side >= -_EPS:
                output.append(_line_intersect(prev, cur, cp1, cp2))
            prev, prev_side = cur, cur_side
    if len(output) < 3:
        return 0.0
    arr = np.asarray(output + [output[0]], dtype=np.float64)
    return abs(ring_area(arr))


def _line_intersect(p1, p2, q1, q2):
    """Intersection of infinite lines p1p2 and q1q2."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = q1
    x4, y4 = q2
    denom = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if abs(denom) < _EPS:
        return ((x1 + x2) / 2.0, (y1 + y2) / 2.0)
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / denom
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def _ccw_tri(t: np.ndarray) -> np.ndarray:
    return t if _cross(t[0], t[1], t[2]) >= 0 else t[::-1]


def simple_intersection_area(tris_a: list[np.ndarray], tris_b: list[np.ndarray]) -> float:
    """Exact area of intersection of two triangulated simple polygons."""
    total = 0.0
    # bbox prefilter per triangle keeps this O(n_a * n_b) worst case but
    # cheap in practice
    boxes_b = [(t[:, 0].min(), t[:, 1].min(), t[:, 0].max(), t[:, 1].max()) for t in tris_b]
    for ta in tris_a:
        ax0, ay0, ax1, ay1 = ta[:, 0].min(), ta[:, 1].min(), ta[:, 0].max(), ta[:, 1].max()
        ta_ccw = _ccw_tri(ta)
        for tb, (bx0, by0, bx1, by1) in zip(tris_b, boxes_b):
            if ax0 > bx1 or bx0 > ax1 or ay0 > by1 or by0 > ay1:
                continue
            total += convex_clip_area(ta_ccw, _ccw_tri(tb))
    return total
