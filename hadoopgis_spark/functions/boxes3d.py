"""3-D MBB functions (the reference's rtree3d extension).

``mbb_3d`` + 3-D R-tree traversal exist in the reference only as
headers (``/root/reference/src/extensions/rtree3d/rtree_traversal3d.h:51-60``;
the ``resque3d`` binary shipped pre-built and is absent from the tree).
The engine supports 3-D boxes as six columns; joins reuse the 2-D tile
machinery on (x, y) — tiles still partition space correctly, the
z-overlap is one extra codegen conjunct — so the whole scale design
carries over unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "box3d_intersects",
    "box3d_contains",
    "box3d_volume",
    "box3d_intersection_volume",
    "box3d_distance",
    "spatial_join_3d",
]

MBB3_COLS = ("xmin", "ymin", "zmin", "xmax", "ymax", "zmax")


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v) if isinstance(v, str) else F.lit(v)


def box3d_intersects(a, b) -> Column:
    """a/b are 6-tuples (xmin, ymin, zmin, xmax, ymax, zmax)."""
    ax0, ay0, az0, ax1, ay1, az1 = map(_c, a)
    bx0, by0, bz0, bx1, by1, bz1 = map(_c, b)
    return (
        (ax0 <= bx1) & (bx0 <= ax1)
        & (ay0 <= by1) & (by0 <= ay1)
        & (az0 <= bz1) & (bz0 <= az1)
    )


def box3d_contains(a, b) -> Column:
    ax0, ay0, az0, ax1, ay1, az1 = map(_c, a)
    bx0, by0, bz0, bx1, by1, bz1 = map(_c, b)
    return (
        (ax0 <= bx0) & (ay0 <= by0) & (az0 <= bz0)
        & (ax1 >= bx1) & (ay1 >= by1) & (az1 >= bz1)
    )


def box3d_volume(a) -> Column:
    x0, y0, z0, x1, y1, z1 = map(_c, a)
    return (x1 - x0) * (y1 - y0) * (z1 - z0)


def box3d_intersection_volume(a, b) -> Column:
    ax0, ay0, az0, ax1, ay1, az1 = map(_c, a)
    bx0, by0, bz0, bx1, by1, bz1 = map(_c, b)
    w = F.greatest(F.lit(0.0), F.least(ax1, bx1) - F.greatest(ax0, bx0))
    h = F.greatest(F.lit(0.0), F.least(ay1, by1) - F.greatest(ay0, by0))
    d = F.greatest(F.lit(0.0), F.least(az1, bz1) - F.greatest(az0, bz0))
    return w * h * d


def box3d_distance(a, b) -> Column:
    ax0, ay0, az0, ax1, ay1, az1 = map(_c, a)
    bx0, by0, bz0, bx1, by1, bz1 = map(_c, b)
    dx = F.greatest(F.lit(0.0), F.greatest(bx0 - ax1, ax0 - bx1))
    dy = F.greatest(F.lit(0.0), F.greatest(by0 - ay1, ay0 - by1))
    dz = F.greatest(F.lit(0.0), F.greatest(bz0 - az1, az0 - bz1))
    return F.sqrt(dx * dx + dy * dy + dz * dz)


def spatial_join_3d(
    a: DataFrame,
    b: DataFrame | None = None,
    predicate: str = "st_intersects",
    **kwargs,
) -> DataFrame:
    """3-D box join: the 2-D engine partitions on (x, y); the z-overlap
    rides along as an extra filter on the co-located pairs.

    Inputs carry ``MBB3_COLS``; z columns are renamed around the 2-D
    engine (which owns the xmin..ymax names) and the z conjunct is
    applied before dedup, so reference-point semantics are unchanged
    (the refpoint is a function of x/y only — still unique per pair).
    """
    from hadoopgis_spark.operators.spatial_join import spatial_join

    if predicate not in ("st_intersects", "st_adjacent"):
        raise ValueError("spatial_join_3d supports st_intersects (box model)")
    self_join = b is None
    if self_join:
        b = a
    j = spatial_join(a, None if self_join else b, predicate, keep_mbb=True, **kwargs)
    z_cond = (F.col("zmin_1") <= F.col("zmax_2")) & (F.col("zmin_2") <= F.col("zmax_1"))
    return j.filter(z_cond)
