"""WKT parser / serializer.

The reference accepts anything GEOS parses
(``/root/reference/src/resque/resque_2d.cpp:331-338``), so ingest must
too: POINT, LINESTRING, POLYGON (with holes), MULTIPOINT,
MULTILINESTRING, MULTIPOLYGON, and GEOMETRYCOLLECTION (its own pipeline
only ever produces POINT and POLYGON —
``test/datagenerator/generatePolygons.py:26-41``).

Parse result is a ``(kind, payload)`` tuple:

* ``("POINT", (x, y))``
* ``("LINESTRING", ndarray[N,2])``
* ``("POLYGON", [shell_ndarray, hole_ndarray, ...])``
* ``("MULTIPOINT", ndarray[N,2])``
* ``("MULTILINESTRING", [ndarray[N,2], ...])``
* ``("MULTIPOLYGON", [rings_list, rings_list, ...])``
* ``("GEOMETRYCOLLECTION", [(kind, payload), ...])``

Malformed input raises ``ValueError`` — callers decide skip-vs-fail
(the reference silently skips bad rows, ``manipulate_2d.cpp:182-189``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_wkt", "to_wkt"]


def _parse_coord_seq(body: str) -> np.ndarray:
    """``"x1 y1, x2 y2, ..."`` → ndarray (N, 2)."""
    pts = []
    for pair in body.split(","):
        parts = pair.split()
        if len(parts) < 2:
            raise ValueError(f"bad coordinate pair: {pair!r}")
        pts.append((float(parts[0]), float(parts[1])))
    if not pts:
        raise ValueError("empty coordinate sequence")
    return np.asarray(pts, dtype=np.float64)


def _split_rings(body: str) -> list[str]:
    """Split ``"(...),(...)"`` at top level into ring bodies."""
    rings, depth, start = [], 0, -1
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                rings.append(body[start:i])
    if not rings:
        raise ValueError(f"no rings in: {body[:60]!r}")
    return rings


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) < 3:
        raise ValueError("ring with <3 points")
    if not (ring[0] == ring[-1]).all():
        ring = np.vstack([ring, ring[:1]])
    return ring


def parse_wkt(text: str):
    """Parse a WKT string. Raises ValueError on malformed input."""
    if text is None:
        raise ValueError("null WKT")
    s = text.strip()
    if not s:
        raise ValueError("empty WKT")
    upper = s[:20].upper()
    if "(" not in s or ")" not in s:
        raise ValueError(f"malformed WKT (no coordinate list): {s[:40]!r}")
    if upper.startswith("POINT"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        parts = inner.replace(",", " ").split()
        if len(parts) < 2:
            raise ValueError(f"bad POINT: {s!r}")
        return ("POINT", (float(parts[0]), float(parts[1])))
    if upper.startswith("LINESTRING"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        seq = _parse_coord_seq(inner)
        if len(seq) < 2:
            raise ValueError("LINESTRING with <2 points")
        return ("LINESTRING", seq)
    if upper.startswith("POLYGON"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        rings = [_close_ring(_parse_coord_seq(r)) for r in _split_rings(inner)]
        return ("POLYGON", rings)
    if upper.startswith("MULTIPOINT"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        if "(" in inner:
            # canonical form: MULTIPOINT ((1 2), (3 4))
            pts = [_parse_coord_seq(p) for p in _split_rings(inner)]
            if any(len(p) != 1 for p in pts):
                raise ValueError(f"bad MULTIPOINT member: {s[:60]!r}")
            return ("MULTIPOINT", np.vstack(pts))
        # bare form: MULTIPOINT (1 2, 3 4)
        return ("MULTIPOINT", _parse_coord_seq(inner))
    if upper.startswith("MULTILINESTRING"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        lines = [_parse_coord_seq(r) for r in _split_rings(inner)]
        if any(len(ln) < 2 for ln in lines):
            raise ValueError(f"MULTILINESTRING member with <2 points: {s[:60]!r}")
        return ("MULTILINESTRING", lines)
    if upper.startswith("GEOMETRYCOLLECTION"):
        inner = s[s.index("(") + 1 : s.rindex(")")].strip()
        if not inner:
            raise ValueError(f"empty GEOMETRYCOLLECTION: {s[:60]!r}")
        members, depth, start = [], 0, 0
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                members.append(inner[start:i])
                start = i + 1
        members.append(inner[start:])
        return ("GEOMETRYCOLLECTION", [parse_wkt(m) for m in members])
    if upper.startswith("MULTIPOLYGON"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        polys = []
        # Split top-level "((...),(...)),((...))" into polygon groups.
        depth, start = 0, -1
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    group = inner[start:i]
                    if "(" in group:
                        rings = [_close_ring(_parse_coord_seq(r)) for r in _split_rings(group)]
                    else:
                        rings = [_close_ring(_parse_coord_seq(group))]
                    polys.append(rings)
        if not polys:
            raise ValueError(f"bad MULTIPOLYGON: {s[:60]!r}")
        return ("MULTIPOLYGON", polys)
    raise ValueError(f"unsupported WKT type: {s[:30]!r}")


def _num(v: float) -> str:
    """Shortest exact round-trip float formatting (repr semantics);
    integral values print without the trailing '.0'."""
    f = float(v)
    if f.is_integer() and abs(f) < 1e16:
        return str(int(f))
    return repr(f)


def _ring_to_wkt(ring: np.ndarray) -> str:
    return "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in ring) + ")"


def to_wkt(geom) -> str:
    kind, payload = geom
    if kind == "POINT":
        x, y = payload
        return f"POINT ({_num(x)} {_num(y)})"
    if kind == "LINESTRING":
        return "LINESTRING " + _ring_to_wkt(payload)
    if kind == "POLYGON":
        return "POLYGON (" + ", ".join(_ring_to_wkt(r) for r in payload) + ")"
    if kind == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_ring_to_wkt(r) for r in rings) + ")" for rings in payload
        ) + ")"
    if kind == "MULTIPOINT":
        return "MULTIPOINT (" + ", ".join(
            f"({_num(x)} {_num(y)})" for x, y in payload
        ) + ")"
    if kind == "MULTILINESTRING":
        return "MULTILINESTRING (" + ", ".join(_ring_to_wkt(ln) for ln in payload) + ")"
    if kind == "GEOMETRYCOLLECTION":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(m) for m in payload) + ")"
    raise ValueError(f"unsupported geometry kind: {kind}")
