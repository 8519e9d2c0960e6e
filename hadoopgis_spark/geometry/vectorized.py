"""Vectorized batch evaluation of polygon-polygon ``intersects``.

The refine step evaluates candidate pairs one by one in Python
(~30 µs/pair). For the dominant case — both geometries single-ring
polygons with few vertices — this module evaluates whole Arrow batches
with numpy: padded edge arrays, all-pairs orientation tests, and a
vectorized ray cast for the containment case.

Bit-parity with the scalar kernel is a hard requirement (the test suite
compares engine output against a brute force that uses the scalar
kernel): every formula and epsilon below mirrors
``hadoopgis_spark.geometry.kernel`` exactly. Padding repeats the last
vertex; a zero-length pad edge can only report contact where a real
edge sharing that vertex already does, so padding never changes the
answer.
"""

from __future__ import annotations

import numpy as np

from hadoopgis_spark.geometry.kernel import _EPS

__all__ = [
    "batch_single_ring_intersects",
    "batch_single_ring_intersects_padded",
    "batch_points_in_single_ring",
    "batch_points_in_single_ring_padded",
    "batch_single_ring_distance",
    "batch_single_ring_distance_padded",
    "batch_points_to_single_ring_distance",
    "batch_points_to_single_ring_distance_padded",
    "MAX_VECTOR_VERTS",
]

MAX_VECTOR_VERTS = 16  # rings larger than this go to the scalar kernel


def _pad_rings(rings: list[np.ndarray], maxv: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, maxv, 2) closed-ring vertex array (last vertex repeated) and
    per-row true edge counts."""
    n = len(rings)
    out = np.empty((n, maxv, 2), dtype=np.float64)
    counts = np.empty(n, dtype=np.int64)
    for i, r in enumerate(rings):
        m = len(r) - 1  # r is closed; m edges, vertices r[0..m-1]
        counts[i] = m
        out[i, :m] = r[:m]
        out[i, m:] = r[m - 1]
    return out, counts


def batch_single_ring_intersects(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> np.ndarray:
    """Pairwise intersects for equal-length lists of closed single
    rings (bbox prefilter assumed already applied upstream)."""
    n = len(rings_a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    ma = max(len(r) - 1 for r in rings_a)
    mb = max(len(r) - 1 for r in rings_b)
    A, ca = _pad_rings(rings_a, ma)
    B, cb = _pad_rings(rings_b, mb)
    return batch_single_ring_intersects_padded(A, ca, B, cb)


def batch_single_ring_intersects_padded(
    A: np.ndarray, ca: np.ndarray, B: np.ndarray, cb: np.ndarray
) -> np.ndarray:
    """Padded-array form of :func:`batch_single_ring_intersects` — the
    columnar refine path hands per-unique (n, maxv, 2) vertex arrays
    straight from the parse cache (pure fancy indexing, no per-pair
    Python). Pad positions repeat the last real vertex, so extra pad
    width is inert (the documented invariant); slicing to the chunk max
    keeps the flop count equal to the list form."""
    n = len(A)
    if n == 0:
        return np.zeros(0, dtype=bool)
    m = int(max(ca.max(), cb.max()))
    A, B = A[:, :m], B[:, :m]

    # edge endpoint arrays (n, m, 2): shift-by-one gives edges
    # (v_j, v_{j+1}); scatter-fix the closing edge (v_{m-1}, v_0).
    # Pad positions become zero-length edges (v_last, v_last) — inert.
    rows = np.arange(n)
    A2 = np.concatenate([A[:, 1:], A[:, -1:]], axis=1)
    A2[rows, ca - 1] = A[:, 0]
    B2 = np.concatenate([B[:, 1:], B[:, -1:]], axis=1)
    B2[rows, cb - 1] = B[:, 0]

    # all-pairs segment intersection per row: broadcast (n, ma, 1, 2) vs (n, 1, mb, 2)
    p1 = A[:, :, None, :]
    p2 = A2[:, :, None, :]
    p3 = B[:, None, :, :]
    p4 = B2[:, None, :, :]

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = orient(p3[..., 0], p3[..., 1], p4[..., 0], p4[..., 1], p1[..., 0], p1[..., 1])
    d2 = orient(p3[..., 0], p3[..., 1], p4[..., 0], p4[..., 1], p2[..., 0], p2[..., 1])
    d3 = orient(p1[..., 0], p1[..., 1], p2[..., 0], p2[..., 1], p3[..., 0], p3[..., 1])
    d4 = orient(p1[..., 0], p1[..., 1], p2[..., 0], p2[..., 1], p4[..., 0], p4[..., 1])

    proper = (((d1 > _EPS) & (d2 < -_EPS)) | ((d1 < -_EPS) & (d2 > _EPS))) & (
        ((d3 > _EPS) & (d4 < -_EPS)) | ((d3 < -_EPS) & (d4 > _EPS))
    )

    def on_seg(ax, ay, bx, by, px, py):
        return (
            (np.minimum(ax, bx) - _EPS <= px)
            & (px <= np.maximum(ax, bx) + _EPS)
            & (np.minimum(ay, by) - _EPS <= py)
            & (py <= np.maximum(ay, by) + _EPS)
        )

    touch = (
        ((np.abs(d1) <= _EPS) & on_seg(p3[..., 0], p3[..., 1], p4[..., 0], p4[..., 1], p1[..., 0], p1[..., 1]))
        | ((np.abs(d2) <= _EPS) & on_seg(p3[..., 0], p3[..., 1], p4[..., 0], p4[..., 1], p2[..., 0], p2[..., 1]))
        | ((np.abs(d3) <= _EPS) & on_seg(p1[..., 0], p1[..., 1], p2[..., 0], p2[..., 1], p3[..., 0], p3[..., 1]))
        | ((np.abs(d4) <= _EPS) & on_seg(p1[..., 0], p1[..., 1], p2[..., 0], p2[..., 1], p4[..., 0], p4[..., 1]))
    )

    hit = (proper | touch).any(axis=(1, 2))

    # containment (no boundary contact): first vertex of A in B, or of B in A
    rest = ~hit
    if rest.any():
        hit[rest] |= _points_in_rings(A[rest, 0, :], B[rest], B2[rest], cb[rest])
        rest = ~hit
    if rest.any():
        hit[rest] |= _points_in_rings(B[rest, 0, :], A[rest], A2[rest], ca[rest])
    return hit


def batch_points_in_single_ring(points: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Pairwise point-in-(closed single ring) — inside or on boundary —
    for (n, 2) points against n rings. Mirrors the scalar
    ``_point_in_ring(...) > 0`` semantics (the POINT∩POLYGON intersects
    case)."""
    n = len(rings)
    if n == 0:
        return np.zeros(0, dtype=bool)
    maxv = max(len(r) - 1 for r in rings)
    V, counts = _pad_rings(rings, maxv)
    return batch_points_in_single_ring_padded(points, V, counts)


def batch_points_in_single_ring_padded(
    points: np.ndarray, V: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Padded-array form of :func:`batch_points_in_single_ring`."""
    n = len(V)
    if n == 0:
        return np.zeros(0, dtype=bool)
    V = V[:, : int(counts.max())] if V.shape[1] > counts.max() else V
    rows = np.arange(n)
    V2 = np.concatenate([V[:, 1:], V[:, -1:]], axis=1)
    V2[rows, counts - 1] = V[:, 0]
    return _points_in_rings(points, V, V2, counts)


def _edges(V: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Edge END array matching start array ``V``: shift-by-one with the
    closing edge scatter-fixed; pad edges are zero-length (inert)."""
    rows = np.arange(len(V))
    V2 = np.concatenate([V[:, 1:], V[:, -1:]], axis=1)
    V2[rows, counts - 1] = V[:, 0]
    return V2


def _pts_to_segs_min_d2(P: np.ndarray, S: np.ndarray, S2: np.ndarray) -> np.ndarray:
    """Per-row min squared distance from any point of ``P`` (n, mp, 2)
    to any segment (``S``, ``S2``) (n, ms, 2). The clamped-projection
    formula is ``kernel._pt_seg_dist2`` verbatim (zero-length segments
    fall back to the endpoint distance via t=0), so every candidate
    term is bit-identical to the scalar kernel's and the min picks the
    same double."""
    px = P[:, :, None, 0]
    py = P[:, :, None, 1]
    ax = S[:, None, :, 0]
    ay = S[:, None, :, 1]
    bx = S2[:, None, :, 0]
    by = S2[:, None, :, 1]
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    t = np.where(
        l2 > 0,
        ((px - ax) * dx + (py - ay) * dy) / np.where(l2 > 0, l2, 1.0),
        0.0,
    )
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    # explicit multiplies (not **2): guaranteed correctly-rounded
    # squares on every numpy version, matching the scalar kernel
    ex, ey = px - cx, py - cy
    d2 = ex * ex + ey * ey
    return d2.min(axis=(1, 2))


def batch_single_ring_distance(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> np.ndarray:
    """Pairwise min distance for NON-INTERSECTING closed single-ring
    pairs (callers resolve intersecting pairs to 0.0 first, mirroring
    the scalar kernel's order). For disjoint rings no segment pair
    intersects, so ``kernel._seg_seg_dist2`` degenerates to the min of
    its four point-to-segment terms — and the union of those terms over
    ALL segment pairs is exactly {A-vertex × B-segment} ∪ {B-vertex ×
    A-segment}, which is what this evaluates. Pad vertices repeat a
    real vertex and pad segments are zero-length at a real vertex, so
    every pad term duplicates or dominates a real term — the min is
    untouched. Bit-identical to ``kernel.distance`` on this shape."""
    n = len(rings_a)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    ma = max(len(r) - 1 for r in rings_a)
    mb = max(len(r) - 1 for r in rings_b)
    A, ca = _pad_rings(rings_a, ma)
    B, cb = _pad_rings(rings_b, mb)
    return batch_single_ring_distance_padded(A, ca, B, cb)


def batch_single_ring_distance_padded(
    A: np.ndarray, ca: np.ndarray, B: np.ndarray, cb: np.ndarray
) -> np.ndarray:
    """Padded-array form of :func:`batch_single_ring_distance`."""
    n = len(A)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    m = int(max(ca.max(), cb.max()))
    A, B = A[:, :m], B[:, :m]
    A2 = _edges(A, ca)
    B2 = _edges(B, cb)
    d2 = np.minimum(
        _pts_to_segs_min_d2(A, B, B2),
        _pts_to_segs_min_d2(B, A, A2),
    )
    return np.sqrt(d2)


def batch_points_to_single_ring_distance(
    points: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Pairwise min distance from (n, 2) points to n closed single
    rings for points NOT intersecting their ring (callers resolve
    inside/boundary points to 0.0 first): min point-to-segment distance
    over the ring's edges — ``kernel.distance``'s POINT branch
    verbatim."""
    n = len(rings)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    maxv = max(len(r) - 1 for r in rings)
    V, counts = _pad_rings(rings, maxv)
    return batch_points_to_single_ring_distance_padded(points, V, counts)


def batch_points_to_single_ring_distance_padded(
    points: np.ndarray, V: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Padded-array form of :func:`batch_points_to_single_ring_distance`."""
    n = len(V)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    V = V[:, : int(counts.max())] if V.shape[1] > counts.max() else V
    V2 = _edges(V, counts)
    return np.sqrt(_pts_to_segs_min_d2(points[:, None, :], V, V2))


def _points_in_rings(pts: np.ndarray, V: np.ndarray, V2: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Vectorized _point_in_ring > 0 (inside or boundary) per row.

    ``V``/``V2`` are (n, m, 2) edge start/end arrays (padded edges are
    zero-length and cannot fire); mirrors the scalar kernel's boundary
    epsilon and crossing test exactly.
    """
    x = pts[:, 0:1]
    y = pts[:, 1:2]
    xs, ys = V[..., 0], V[..., 1]
    xe, ye = V2[..., 0], V2[..., 1]
    m = V.shape[1]
    valid = np.arange(m)[None, :] < counts[:, None]

    # boundary: point-to-segment distance (clamped projection)
    dx, dy = xe - xs, ye - ys
    seg2 = dx * dx + dy * dy
    t = np.where(seg2 > 0, ((x - xs) * dx + (y - ys) * dy) / np.where(seg2 > 0, seg2, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    px, py = xs + t * dx, ys + t * dy
    d2 = (x - px) ** 2 + (y - py) ** 2
    on_boundary = ((d2 <= _EPS * _EPS) & valid).any(axis=1)

    # ray cast
    cond = ((ys > y) != (ye > y)) & valid
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = xs + (y - ys) / np.where(ye - ys == 0, 1.0, ye - ys) * (xe - xs)
    crossings = (cond & (x < xint)).sum(axis=1)
    inside = crossings % 2 == 1
    return on_boundary | inside
