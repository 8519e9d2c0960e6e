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

__all__ = ["register_all", "register_text_sql", "REGISTERED_FUNCTIONS", "TEXT_SQL_FUNCTIONS"]

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


# Text helpers as Spark SQL SCALAR FUNCTIONS (Spark 4 `CREATE FUNCTION
# ... RETURN <expr>`): unlike the Python geometry UDFs above, these are
# INLINED into the calling query's plan — whole-stage codegen, zero
# Python boundary — so the SQL surface costs the same as the Column API
# (`functions.text`). Bodies mirror the text module's expressions.
TEXT_SQL_FUNCTIONS: dict[str, str] = {
    "hgs_norm": (
        "(s STRING) RETURNS STRING RETURN "
        "trim(regexp_replace(regexp_replace(lower(s), '[^a-z0-9 ]', ' '), ' +', ' '))"
    ),
    "hgs_token_count": (
        "(s STRING) RETURNS INT RETURN "
        "CASE WHEN hgs_norm(s) = '' THEN 0 ELSE size(split(hgs_norm(s), ' ')) END"
    ),
    "hgs_fingerprint": "(s STRING) RETURNS STRING RETURN md5(hgs_norm(s))",
    "hgs_alpha_ratio": (
        "(s STRING) RETURNS DOUBLE RETURN "
        "CASE WHEN length(s) > 0 THEN "
        "CAST(length(regexp_replace(s, '[^A-Za-z]', '')) AS DOUBLE) / length(s) "
        "ELSE 0.0 END"
    ),
    "hgs_punct_ratio": (
        "(s STRING) RETURNS DOUBLE RETURN "
        "CASE WHEN length(s) > 0 THEN "
        "CAST(length(s) - length(regexp_replace(s, '[.,!?;:]', '')) AS DOUBLE) / length(s) "
        "ELSE 0.0 END"
    ),
}


# Geography distance as a native SQL SCALAR FUNCTION — the same
# inlined-codegen mechanism as the text helpers: the body mirrors
# ``functions.boxes.haversine_m`` expression-for-expression (reference
# mile constants, geographical.h:11-22), so SQL text gets the
# reference's -e true earth distance with zero Python boundary.
GEO_SQL_FUNCTIONS: dict[str, str] = {
    "hgs_haversine_m": (
        "(lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE) "
        "RETURNS DOUBLE RETURN "
        "2.0 * 3958.75 * 1609.00 * ASIN(LEAST(CAST(1.0 AS DOUBLE), SQRT("
        "POW(SIN((RADIANS(lat2) - RADIANS(lat1)) / 2), 2) "
        "+ COS(RADIANS(lat1)) * COS(RADIANS(lat2)) "
        "* POW(SIN((RADIANS(lon2) - RADIANS(lon1)) / 2), 2))))"
    ),
}


def register_geo_sql(spark: SparkSession) -> list[str]:
    """Register the geography SQL functions (temporary, session-scoped);
    idempotent via CREATE OR REPLACE."""
    for name, body in GEO_SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return sorted(GEO_SQL_FUNCTIONS)


def register_text_sql(spark: SparkSession) -> list[str]:
    """Register the text SQL functions (temporary, session-scoped);
    returns the names. Order matters: later bodies call earlier ones."""
    for name, sig in TEXT_SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig}")
    return list(TEXT_SQL_FUNCTIONS)
