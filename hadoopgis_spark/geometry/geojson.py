"""GeoJSON codec (RFC 7946 geometry objects).

The reference speaks WKT only (``resque_2d.cpp:331-338``); GeoJSON is
the other interchange format every spatial toolchain emits, so the
engine accepts and produces it. Same ``(kind, payload)`` model as
:mod:`hadoopgis_spark.geometry.wkt` — POINT / LINESTRING / POLYGON
(with holes) / MULTIPOLYGON; ``Feature`` wrappers are unwrapped;
malformed input raises ``ValueError`` (callers skip, matching the WKT
path's ``manipulate_2d.cpp:182-189`` semantics).
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["parse_geojson", "to_geojson"]


def _ring(coords) -> np.ndarray:
    a = np.asarray(coords, dtype=np.float64)
    if a.ndim != 2 or a.shape[1] < 2 or len(a) < 3:
        raise ValueError("ring needs >= 3 coordinate pairs")
    a = a[:, :2]
    if not (a[0] == a[-1]).all():  # GeoJSON rings SHOULD be closed; accept open
        a = np.vstack([a, a[:1]])
    if len(a) < 4:
        raise ValueError("closed ring needs >= 4 points")
    return a


def parse_geojson(text: str):
    """GeoJSON string → ``(kind, payload)``. Raises ValueError when malformed."""
    try:
        obj = json.loads(text)
    except (TypeError, json.JSONDecodeError) as e:
        raise ValueError(f"bad JSON: {e}") from None
    if not isinstance(obj, dict):
        raise ValueError("GeoJSON must be an object")
    if obj.get("type") == "Feature":
        obj = obj.get("geometry")
        if not isinstance(obj, dict):
            raise ValueError("Feature without geometry")
    t = obj.get("type")
    if t == "GeometryCollection":
        members = obj.get("geometries")
        if not isinstance(members, list) or not members:
            raise ValueError("GeometryCollection without geometries")
        return "GEOMETRYCOLLECTION", [
            parse_geojson(json.dumps(m)) for m in members
        ]
    c = obj.get("coordinates")
    if c is None:
        raise ValueError("missing coordinates")
    if t == "Point":
        if not isinstance(c, (list, tuple)) or len(c) < 2:
            raise ValueError("Point needs [x, y]")
        return "POINT", (float(c[0]), float(c[1]))
    if t == "LineString":
        a = np.asarray(c, dtype=np.float64)
        if a.ndim != 2 or a.shape[1] < 2 or len(a) < 2:
            raise ValueError("LineString needs >= 2 pairs")
        return "LINESTRING", a[:, :2]
    if t == "Polygon":
        if not c:
            raise ValueError("Polygon without rings")
        return "POLYGON", [_ring(r) for r in c]
    if t == "MultiPolygon":
        if not c:
            raise ValueError("MultiPolygon without polygons")
        return "MULTIPOLYGON", [[_ring(r) for r in poly] for poly in c]
    if t == "MultiPoint":
        a = np.asarray(c, dtype=np.float64)
        if a.ndim != 2 or a.shape[1] < 2 or len(a) < 1:
            raise ValueError("MultiPoint needs >= 1 pair")
        return "MULTIPOINT", a[:, :2]
    if t == "MultiLineString":
        if not c:
            raise ValueError("MultiLineString without lines")
        lines = []
        for ln in c:
            a = np.asarray(ln, dtype=np.float64)
            if a.ndim != 2 or a.shape[1] < 2 or len(a) < 2:
                raise ValueError("MultiLineString member needs >= 2 pairs")
            lines.append(a[:, :2])
        return "MULTILINESTRING", lines
    raise ValueError(f"unsupported GeoJSON type {t!r}")


def to_geojson(geom) -> str:
    """``(kind, payload)`` (or Geometry) → compact GeoJSON string."""
    kind, payload = (geom.kind, geom.payload) if hasattr(geom, "kind") else geom
    if kind == "POINT":
        coords = [float(payload[0]), float(payload[1])]
        t = "Point"
    elif kind == "LINESTRING":
        coords = np.asarray(payload, dtype=np.float64).tolist()
        t = "LineString"
    elif kind == "POLYGON":
        coords = [np.asarray(r, dtype=np.float64).tolist() for r in payload]
        t = "Polygon"
    elif kind == "MULTIPOLYGON":
        coords = [
            [np.asarray(r, dtype=np.float64).tolist() for r in poly] for poly in payload
        ]
        t = "MultiPolygon"
    elif kind == "MULTIPOINT":
        coords = np.asarray(payload, dtype=np.float64).tolist()
        t = "MultiPoint"
    elif kind == "MULTILINESTRING":
        coords = [np.asarray(ln, dtype=np.float64).tolist() for ln in payload]
        t = "MultiLineString"
    elif kind == "GEOMETRYCOLLECTION":
        return json.dumps(
            {
                "type": "GeometryCollection",
                "geometries": [json.loads(to_geojson(m)) for m in payload],
            },
            separators=(",", ":"),
        )
    else:
        raise ValueError(f"unsupported kind {kind!r}")
    return json.dumps(
        {"type": t, "coordinates": coords}, separators=(",", ":")
    )
