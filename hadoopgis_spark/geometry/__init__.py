"""Pure-Python/numpy geometry kernel.

The reference delegates exact geometry to GEOS (``src/resque/resque_2d.cpp:331-338``
uses ``WKTReader``; predicates in ``src/resque/spjoin_2d.hpp:114-266``). This
container has no GEOS binding, so the kernel is built from scratch:

* :mod:`hadoopgis_spark.geometry.wkt` — WKT parse / serialize
* :mod:`hadoopgis_spark.geometry.clip` — ear-clip triangulation + convex
  clipping (exact polygon intersection area by triangle decomposition)
* :mod:`hadoopgis_spark.geometry.kernel` — the 10 boolean predicates,
  distance / area / union / intersection / jaccard / dice measures

The kernel is scalar-per-geometry; the Spark layer batches it behind
Arrow pandas UDFs, and the engine's MBB filter-refine design keeps the
number of pairs that ever reach these functions small.
"""

from hadoopgis_spark.geometry.kernel import (
    Geometry,
    area,
    contains,
    crosses,
    disjoint,
    distance,
    dwithin,
    equals,
    haversine_distance,
    intersection_area,
    intersects,
    jaccard,
    dice,
    overlaps,
    touches,
    union_area,
    within,
)
from hadoopgis_spark.geometry.wkt import parse_wkt, to_wkt

__all__ = [
    "Geometry",
    "parse_wkt",
    "to_wkt",
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
    "union_area",
    "intersection_area",
    "jaccard",
    "dice",
]
