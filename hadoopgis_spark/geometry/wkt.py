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

__all__ = ["parse_wkt", "to_wkt", "batch_parse"]


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


# ---------------------------------------------------------------------------
# Bulk parse: the refine-stage hot path parses millions of WKT strings per
# task, and per-row Python (split + float) is the engine's last row-at-a-time
# cost. batch_parse vectorizes the three dominant shapes — POINT, LINESTRING,
# single-ring POLYGON — through one numpy byte pipeline: classify rows from
# raw bytes, blank type names / parens / commas, bulk-convert every number
# with a single C strtod sweep (np.fromstring), then slice per-row views.
# Soundness: rows are joined with a sentinel NUMBER between them, and the
# parse is accepted only when every sentinel lands at its expected index —
# any token the C parser reads differently from the scalar parser derails
# the alignment and the whole batch falls back to parse_wkt (the same
# global-fallback discipline as functions.spatial._mbb_batch). Anything
# unusual per row — other geometry types, multi-ring polygons, non-ascii,
# 3-D coordinates, disallowed characters — routes to parse_wkt row-wise.

_SENT = "-8.5e222"
_SENT_VAL = float(_SENT)
# bytes legal inside a coordinate list once structure chars are blanked
_ALLOWED = np.zeros(256, dtype=bool)
_ALLOWED[np.frombuffer(b"0123456789.+-eE \n", dtype=np.uint8)] = True


def _prefix_match(lower: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                  word: bytes) -> np.ndarray:
    """Rows whose text begins with `word` (case-insensitive) followed by
    a space or '('."""
    k = len(word)
    ok = lens > k
    for j, ch in enumerate(word):
        pos = np.minimum(starts + j, lower.size - 1)
        ok &= lower[pos] == ch
    nxt = lower[np.minimum(starts + k, lower.size - 1)]
    return ok & ((nxt == 0x20) | (nxt == 0x28))


def batch_parse(values, with_bbox: bool = False):
    """Bulk-parse a sequence of WKT strings.

    Returns a list aligned with ``values``: each entry is the
    ``(kind, payload)`` tuple ``parse_wkt`` would return, or ``None``
    where ``parse_wkt`` raises (the reference's malformed-row skip
    semantics, ``manipulate_2d.cpp:182-189``). Non-string entries are
    ``None``. Results are value-exact with the scalar parser (same
    strtod, same ring closure); the parity suite asserts it.

    With ``with_bbox=True`` returns ``(results, bboxes)`` where
    ``bboxes[i]`` is the geometry's ``(xmin, ymin, xmax, ymax)`` for
    rows the fast path handled (computed in the same numpy sweep —
    min/max over a coordinate list is closure-invariant) and ``None``
    for scalar-path rows, whose bbox the caller derives lazily.
    """
    n = len(values)
    out: list = [None] * n
    bboxes: list = [None] * n
    done = bytearray(n)

    # rows eligible for the byte pipeline; everything else (None, bytes,
    # non-ascii, embedded newlines) takes the scalar fallback loop below
    idx_str = [i for i, v in enumerate(values)
               if type(v) is str and v and v.isascii() and "\n" not in v]

    if idx_str:
        blob = "\n".join(values[i] for i in idx_str)
        a = np.frombuffer(blob.encode("ascii"), dtype=np.uint8)
        m = len(idx_str)
        nlpos = np.nonzero(a == 10)[0]
        starts = np.concatenate([[0], nlpos + 1])
        ends = np.concatenate([nlpos, [a.size]])
        lens = ends - starts
        lower = a | 0x20

        is_point = _prefix_match(lower, starts, lens, b"point")
        is_line = _prefix_match(lower, starts, lens, b"linestring")
        is_poly = _prefix_match(lower, starts, lens, b"polygon")

        def _count(ch: int) -> np.ndarray:
            p = np.nonzero(a == ch)[0]
            return np.searchsorted(p, ends) - np.searchsorted(p, starts)

        opens = _count(40)
        closes = _count(41)
        commas = _count(44)

        # ---- structural placement (not just counts) -------------------
        # Counts alone accept e.g. "POINT )1 2(" or "POLYGON ))...((";
        # require the first non-space byte(s) after the type word to be
        # "(" (nested "((" for POLYGON) and the last non-space byte(s)
        # of the row to be ")" (nested "))" for POLYGON). Together with
        # the exact open/close counts this pins the shape to
        # "(body)" / "((body))" with a paren-free body.
        kword = np.zeros(m, dtype=np.int64)
        kword[is_point] = 5
        kword[is_line] = 10
        kword[is_poly] = 7
        sp_mask = (a == 32) | (a == 10) | (a == 9) | (a == 13)
        nz = np.nonzero(~sp_mask)[0]
        if nz.size:
            fi = np.minimum(np.searchsorted(nz, starts + kword), nz.size - 1)
            pos1 = nz[fi]
            ok_open = (pos1 < ends) & (a[pos1] == 40)
            fi2 = np.minimum(fi + 1, nz.size - 1)
            pos2 = nz[fi2]
            ok_open2 = (pos2 < ends) & (a[pos2] == 40)
            li = np.maximum(np.searchsorted(nz, ends) - 1, 0)
            posl = nz[li]
            ok_close = (posl >= starts) & (a[posl] == 41)
            li2 = np.maximum(li - 1, 0)
            posl2 = nz[li2]
            ok_close2 = (posl2 >= starts) & (a[posl2] == 41)
            placed = ok_open & ok_close & np.where(
                is_poly, ok_open2 & ok_close2, True
            )
        else:
            # whitespace-only batch: no non-space byte exists, so no row
            # can be well-placed; route everything to the scalar fallback
            # (which yields None per the malformed-row skip contract)
            placed = np.zeros(m, dtype=bool)

        # blank type names, parens, commas; normalize tab/cr to space
        arrm = a.copy()
        klen = np.zeros(m, dtype=np.int64)
        klen[is_point] = 5
        klen[is_line] = 10
        klen[is_poly] = 7
        for kmask, kl in ((is_point, 5), (is_line, 10), (is_poly, 7)):
            srow = starts[kmask]
            for j in range(kl):
                arrm[srow + j] = 32
        arrm[(arrm == 40) | (arrm == 41) | (arrm == 44)
             | (arrm == 9) | (arrm == 13)] = 32

        badpos = np.nonzero(~_ALLOWED[arrm])[0]
        nbad = np.searchsorted(badpos, ends) - np.searchsorted(badpos, starts)

        nonspace = (arrm != 32) & (arrm != 10)
        tok_start = nonspace & np.concatenate([[True], ~nonspace[:-1]])
        tpos = np.nonzero(tok_start)[0]
        tokens = np.searchsorted(tpos, ends) - np.searchsorted(tpos, starts)

        pairs = commas + 1
        fast = (
            (is_point | is_line | is_poly)
            & placed
            & (nbad == 0)
            & (tokens == 2 * pairs)
            & np.where(is_poly, (opens == 2) & (closes == 2),
                       (opens == 1) & (closes == 1))
            & np.where(is_point, pairs == 1,
                       np.where(is_line, pairs >= 2, pairs >= 3))
        )

        # ---- comma placement: each comma must split the token stream
        # into exact 2-token groups (rejects "…,,…" / "1 2,3 4 5 6" —
        # token/pair COUNTS can coincide while placement is wrong). The
        # j-th comma of a row (0-based) must see exactly 2·(j+1) tokens
        # before it; the global token==2·pairs check then pins the last
        # group to 2 as well.
        cpos = np.nonzero(a == 44)[0]
        if cpos.size:
            rowc = np.searchsorted(starts, cpos, side="right") - 1
            cidx = np.arange(cpos.size) - np.searchsorted(cpos, starts)[rowc]
            tb = np.searchsorted(tpos, cpos) - np.searchsorted(tpos, starts)[rowc]
            badc = tb != 2 * (cidx + 1)
            if badc.any():
                fast[rowc[badc]] = False

        if fast.any():
            drop = np.nonzero(~fast)[0]
            if drop.size:
                keep = np.ones(a.size, dtype=bool)
                for r in drop:
                    s_, e_ = int(starts[r]), int(ends[r])
                    if r == m - 1:
                        keep[max(s_ - 1, 0):e_] = False
                    else:
                        keep[s_:min(e_ + 1, a.size)] = False
                kept = arrm[keep]
                # a dropped run reaching the batch tail leaves one
                # orphan separator ('\n' of the last surviving row) —
                # strip it or the sentinel count check below rejects the
                # whole batch and silently defeats the vectorization
                while kept.size and kept[-1] == 10:
                    kept = kept[:-1]
            else:
                kept = arrm
            clean = kept.tobytes().replace(b"\n", b" " + _SENT.encode() + b" ")
            import warnings

            try:
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    flat = np.fromstring(clean, sep=" ")  # noqa: NPY201
            except Exception:
                # np.fromstring is removed in NumPy 2.0 — same C strtod
                # via an explicit token array; any failure here must
                # degrade to the scalar path, never crash the batch
                try:
                    flat = np.array(clean.split(), dtype=np.float64)
                except Exception:
                    flat = np.empty(0, dtype=np.float64)
            frow = np.nonzero(fast)[0]
            tk = tokens[frow]
            nk = frow.size
            cs = np.cumsum(tk)
            sent_idx = cs[:-1] + np.arange(nk - 1)
            if flat.size == int(tk.sum()) + (nk - 1) and (
                nk < 2 or bool(np.all(flat[sent_idx] == _SENT_VAL))
            ):
                numbers = np.delete(flat, sent_idx) if nk > 1 else flat
                num_off = np.concatenate([[0], cs])
                # every fast row has an even token count, so the whole
                # batch reshapes to coordinate pairs once; per-row
                # payloads are O(1) views of it
                pairs2d = numbers.reshape(-1, 2)
                o0, o1 = num_off[:-1], num_off[1:]
                closed = ((numbers[o0] == numbers[o1 - 2])
                          & (numbers[o0 + 1] == numbers[o1 - 1])).tolist()
                first_xy = pairs2d[o0 // 2].tolist()
                poff_a = num_off // 2
                poff = poff_a.tolist()
                bb = None
                if with_bbox:
                    xs, ys = pairs2d[:, 0], pairs2d[:, 1]
                    red = poff_a[:-1]
                    bb = np.column_stack([
                        np.minimum.reduceat(xs, red),
                        np.minimum.reduceat(ys, red),
                        np.maximum.reduceat(xs, red),
                        np.maximum.reduceat(ys, red),
                    ]).tolist()
                kc = np.where(is_point, 1,
                              np.where(is_line, 2, 3))[frow].tolist()
                imap = [idx_str[r] for r in frow.tolist()]
                for j in range(nk):
                    i = imap[j]
                    k = kc[j]
                    if k == 3:
                        ring = pairs2d[poff[j]:poff[j + 1]]
                        if not closed[j]:
                            ring = np.vstack([ring, ring[:1]])
                        out[i] = ("POLYGON", [ring])
                    elif k == 1:
                        x, y = first_xy[j]
                        out[i] = ("POINT", (x, y))
                    else:
                        out[i] = ("LINESTRING", pairs2d[poff[j]:poff[j + 1]])
                    if bb is not None:
                        bboxes[i] = tuple(bb[j])
                    done[i] = 1
            # else: sentinel misalignment -> every fast row stays undone
            # and takes the scalar path below (global-fallback discipline)

    for i in range(n):
        if not done[i]:
            try:
                out[i] = parse_wkt(values[i])
            except (ValueError, IndexError, TypeError, AttributeError):
                out[i] = None
    return (out, bboxes) if with_bbox else out


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
