"""MBB (box) predicates and measures as pure Column expressions.

These are the JVM-side fast path of the filter-refine pipeline: the
candidate test the reference runs through its per-tile R*-tree
(``/root/reference/src/resque/spjoin_2d.hpp:73-87``) becomes a compound
range condition Catalyst can codegen, reorder, and push down. For
axis-aligned box geometries they are also *exact*, so queries on box
data never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "box_intersects",
    "box_contains",
    "box_intersection_area",
    "box_area",
    "box_union_area",
    "box_jaccard",
    "box_dice",
    "box_distance",
    "haversine_m",
    "geo_degree_pad",
    "EARTH_RADIUS_MI",
    "MI_TO_M",
    "EARTH_RADIUS_M",
    "M_PER_DEG",
]

# Reference constants (src/common/resque_constants_2d.h:2,
# src/extensions/specialmeasures/geographical.h:20-21)
EARTH_RADIUS_MI = 3958.75
MI_TO_M = 1609.00
EARTH_RADIUS_M = EARTH_RADIUS_MI * MI_TO_M
# meters per degree of latitude (= per degree of great-circle arc)
M_PER_DEG = EARTH_RADIUS_M * 3.141592653589793 / 180.0


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v) if isinstance(v, str) else F.lit(v)


def box_intersects(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1, pad=0.0) -> Column:
    """Closed-box overlap; ``pad`` expands box A by a distance (the
    reference's dwithin MBB expansion, ``spjoin_2d.hpp:61-66``).

    A statically-zero pad emits bare column comparisons — `xmin - 0.0`
    style arithmetic would block Parquet filter pushdown (the scan only
    skips row groups on untransformed column predicates).
    """
    ax0, ay0, ax1, ay1 = _c(ax0), _c(ay0), _c(ax1), _c(ay1)
    bx0, by0, bx1, by1 = _c(bx0), _c(by0), _c(bx1), _c(by1)
    if isinstance(pad, (int, float)) and pad == 0:
        return (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
    p = _c(pad)
    return (
        (ax0 - p <= bx1) & (bx0 <= ax1 + p) & (ay0 - p <= by1) & (by0 <= ay1 + p)
    )


def box_contains(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    """Box A contains box B (closure model)."""
    return (
        (_c(ax0) <= _c(bx0))
        & (_c(ay0) <= _c(by0))
        & (_c(ax1) >= _c(bx1))
        & (_c(ay1) >= _c(by1))
    )


def box_area(x0, y0, x1, y1) -> Column:
    return (_c(x1) - _c(x0)) * (_c(y1) - _c(y0))


def box_intersection_area(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    w = F.greatest(F.lit(0.0), F.least(_c(ax1), _c(bx1)) - F.greatest(_c(ax0), _c(bx0)))
    h = F.greatest(F.lit(0.0), F.least(_c(ay1), _c(by1)) - F.greatest(_c(ay0), _c(by0)))
    return w * h


def box_union_area(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    return (
        box_area(ax0, ay0, ax1, ay1)
        + box_area(bx0, by0, bx1, by1)
        - box_intersection_area(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
    )


def box_jaccard(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    i = box_intersection_area(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
    u = box_union_area(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
    return F.when(u > 0, i / u).otherwise(F.lit(0.0))


def box_dice(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    i = box_intersection_area(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
    s = box_area(ax0, ay0, ax1, ay1) + box_area(bx0, by0, bx1, by1)
    return F.when(s > 0, F.lit(2.0) * i / s).otherwise(F.lit(0.0))


def box_distance(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    """Min euclidean distance between two boxes (0 when overlapping)."""
    dx = F.greatest(F.lit(0.0), F.greatest(_c(bx0) - _c(ax1), _c(ax0) - _c(bx1)))
    dy = F.greatest(F.lit(0.0), F.greatest(_c(by0) - _c(ay1), _c(ay0) - _c(by1)))
    return F.sqrt(dx * dx + dy * dy)


def haversine_m(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle distance in meters with the reference's constants
    (EARTH_RADIUS=3958.75 mi × 1609.00 m/mi —
    ``src/extensions/specialmeasures/geographical.h:11-22``). Pure
    column math: stays in codegen."""
    rlat1, rlat2 = F.radians(_c(lat1)), F.radians(_c(lat2))
    dlat = rlat2 - rlat1
    dlon = F.radians(_c(lon2)) - F.radians(_c(lon1))
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_MI * MI_TO_M) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def geo_degree_pad(radius_m, ymin, ymax) -> Column:
    """Conservative DEGREE-space pad covering every lon/lat point within
    ``radius_m`` haversine METERS of a box whose latitude range is
    ``[ymin, ymax]`` (reference earth constants).

    This is the meters→degrees bridge the tile machinery needs under
    ``geography=True``: multicast pads and MBB range conditions act in
    planar degree space while distances are ranked in haversine meters
    — padding by raw meters either over-multicasts every object to
    every tile (meters ≫ degrees) or, scaled naively by a fixed factor,
    under-covers at high latitude (longitude compression). Derivation:

    * latitude — great-circle distance ≥ R·|Δφ|, so
      ``Δφ ≤ r / M_PER_DEG`` exactly;
    * longitude — from the haversine identity,
      ``dist ≥ 2R·√(cos φ₁ cos φ₂)·|sin(Δλ/2)|``, and every reachable
      point has ``|φ| ≤ φmax = min(90°, max(|ymin|,|ymax|) + Δφ)``, so
      ``|sin(Δλ/2)| ≤ r / (2R·cos φmax)``; when that bound reaches 1
      (the pole is reachable) every longitude qualifies and the pad
      degrades to the full circle.

    The max of the two pads is applied on BOTH axes — over-coverage is
    correctness-free because every consumer re-filters candidates on
    the true haversine metric. Monotone in ``radius_m`` (the straggler
    satisfaction proofs rely on it).

    Antimeridian: the pad bounds the WRAPPED angular difference
    ``min(|Δλ|, 360 − |Δλ|)`` (the derivation's ``sin(Δλ/2)`` terms are
    periodic), so a planar box padded by it misses pairs whose nearer
    representation crosses ±180° — consumers whose lon span exceeds
    180° therefore wrap-multicast ±360° copies
    (``operators.tile.wrap_antimeridian``, round 12); within 180° the
    direct difference IS the wrapped one and no copies are needed.

    Polar envelope: when the pole is reachable (``φmax ≥ 90°`` or the
    ``sin`` bound saturates) the pad degrades to the full circle — every
    object multicasts to every lon-overlapping tile. That is correct
    but a multicast cliff: a dataset at |lat| ≥ ~85° with a large
    radius pays all-tiles fan-out (contract-tested in
    ``tests/test_geography.py``); prefer smaller radii or coarser
    buckets near the poles.
    """
    r = _c(radius_m)
    dlat = r / F.lit(M_PER_DEG)
    phimax = F.least(
        F.lit(90.0), F.greatest(F.abs(_c(ymin)), F.abs(_c(ymax))) + dlat
    )
    s = r / (
        F.lit(2.0 * EARTH_RADIUS_M)
        * F.greatest(F.cos(F.radians(phimax)), F.lit(1e-12))
    )
    dlon = F.when(
        (s >= 1.0) | (phimax >= 90.0), F.lit(360.0)
    ).otherwise(F.degrees(F.lit(2.0) * F.asin(s)))
    return F.greatest(dlat, dlon)
