"""SQL-surface registration: use the engine from ``spark.sql``.

``register_all(spark)`` exposes the geometry UDFs under their reference
names (``st_intersects(geom1, geom2)`` …) plus measure/codec functions,
so SQL users can write::

    SELECT a.id, b.id FROM a JOIN b
      ON a.xmin <= b.xmax AND b.xmin <= a.xmax      -- filter (pushable)
     AND a.ymin <= b.ymax AND b.ymin <= a.ymax
     AND st_intersects(a.geom, b.geom)              -- refine

The box tier needs no registration — it is plain column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hadoopgis_spark.functions import spatial as S

__all__ = ["register_all", "REGISTERED_FUNCTIONS"]

REGISTERED_FUNCTIONS = {
    "st_intersects": S.st_intersects,
    "st_touches": S.st_touches,
    "st_crosses": S.st_crosses,
    "st_contains": S.st_contains,
    "st_within": S.st_within,
    "st_equals": S.st_equals,
    "st_overlaps": S.st_overlaps,
    "st_disjoint": S.st_disjoint,
    "st_adjacent": S.st_adjacent,
    "st_area": S.st_area,
    "st_distance": S.st_distance,
    "st_haversine_m": S.st_haversine_m,
    "st_intersection_area": S.st_intersection_area,
    "st_union_area": S.st_union_area,
    "st_jaccard": S.st_jaccard,
    "st_dice": S.st_dice,
    "st_is_valid": S.st_is_valid,
    "st_as_wkb": S.st_as_wkb,
    "st_as_wkt": S.st_as_wkt,
    "st_from_geojson": S.st_from_geojson,
    "st_as_geojson": S.st_as_geojson,
    "st_mbb": S.st_mbb,
}


def register_all(spark: SparkSession, prefix: str = "") -> list[str]:
    """Register every geometry UDF for SQL use; returns the names."""
    names = []
    for name, fn in REGISTERED_FUNCTIONS.items():
        full = f"{prefix}{name}"
        spark.udf.register(full, fn)
        names.append(full)
    return names
