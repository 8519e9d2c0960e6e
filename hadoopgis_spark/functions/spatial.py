"""Exact geometry predicates/measures as Arrow pandas UDFs over WKT.

The refine step of the engine (reference: exact GEOS evaluation on
R-tree candidates, ``/root/reference/src/resque/spjoin_2d.hpp:87-93``).
Each batch parses every distinct WKT once (joins repeat geometries many
times per batch, so the cache hit rate is high), then evaluates the
scalar kernel. Malformed geometries evaluate to null — the engine's
callers drop them, mirroring the reference's silent skip
(``src/transform/manipulate_2d.cpp:182-189``).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hadoopgis_spark.geometry import kernel as K
from hadoopgis_spark.geometry.kernel import Geometry
from hadoopgis_spark.geometry.wkt import batch_parse

__all__ = [
    "st_mbb",
    "st_is_valid",
    "st_as_wkb",
    "st_as_wkt",
    "st_from_geojson",
    "st_as_geojson",
    "st_predicate",
    "st_window_hit",
    "st_intersects",
    "st_contains",
    "st_within",
    "st_touches",
    "st_equals",
    "st_overlaps",
    "st_crosses",
    "st_disjoint",
    "st_adjacent",
    "st_dwithin",
    "st_area",
    "st_distance",
    "st_haversine_m",
    "st_intersection_area",
    "st_union_area",
    "st_jaccard",
    "st_dice",
    "PREDICATES",
]

_MBB_SCHEMA = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


def _parse_cache(series: pd.Series, cache: dict):
    """Parse WKT strings or WKB bytes, once per distinct value per batch.

    String misses go through ``wkt.batch_parse`` — one numpy sweep for
    the dominant shapes (POINT / LINESTRING / single-ring POLYGON) with
    the bbox computed in the same sweep — so the per-row Python cost is
    one dict lookup; WKB and unusual shapes parse through the scalar
    kernel path."""
    codes, uniques = pd.factorize(series)
    miss_str: list = []
    miss_other: list = []
    ukeys: list = []
    for u in uniques:
        key = bytes(u) if isinstance(u, (bytearray, memoryview)) else u
        ukeys.append(key)
        if key not in cache:
            if isinstance(key, bytes):
                miss_other.append(key)
            else:
                miss_str.append(key)
    if miss_str:
        _fill_cache(cache, miss_str, batch_parse(miss_str, with_bbox=True))
    if miss_other:
        from hadoopgis_spark.geometry.wkb import batch_from_wkb

        _fill_cache(cache, miss_other,
                    batch_from_wkb(miss_other, with_bbox=True))
    ug = [cache[k] for k in ukeys]
    return [None if c < 0 else ug[c] for c in codes.tolist()]


def _fill_cache(cache: dict, keys: list, parsed_bbs) -> None:
    parsed, bbs = parsed_bbs
    for k, t, bb in zip(keys, parsed, bbs):
        if t is None:
            cache[k] = None
        else:
            g = Geometry(t[0], t[1])
            if bb is not None:
                g._bbox = bb
            cache[k] = g


# columnar kind codes (round-11 fused refine path)
_CK_NULL, _CK_POINT, _CK_SRING, _CK_OTHER = 0, 1, 2, 3


def _columnar_view(series: pd.Series, cache: dict):
    """Factorize + parse ``series`` and expose the UNIQUE geometries as
    numpy columns, so the pair kernels run on fancy-indexed arrays with
    no per-pair Python (the round-11 columnar refine: the per-pair
    attribute/classify/append loop was the refine stage's last
    row-at-a-time cost). Returns ``(codes, uniq_geoms, view)`` where
    ``view`` holds per-unique ``kind`` (0 null/malformed, 1 point,
    2 vectorizable single-ring polygon, 3 other), ``bbox`` (U, 4),
    ``ptxy`` (U, 2), ``isrect`` (U,), and for kind-2 rows the padded
    vertex array ``verts`` (U, MAX_VECTOR_VERTS, 2) + edge counts
    ``vcnt`` — exactly the padding ``vectorized._pad_rings`` produces,
    so the padded kernels stay bit-identical to the list-form path."""
    import numpy as np

    from hadoopgis_spark.geometry.vectorized import MAX_VECTOR_VERTS

    codes, uniques = pd.factorize(series)
    miss_str: list = []
    miss_other: list = []
    ukeys: list = []
    for u in uniques:
        key = bytes(u) if isinstance(u, (bytearray, memoryview)) else u
        ukeys.append(key)
        if key not in cache:
            if isinstance(key, bytes):
                miss_other.append(key)
            else:
                miss_str.append(key)
    if miss_str:
        _fill_cache(cache, miss_str, batch_parse(miss_str, with_bbox=True))
    if miss_other:
        from hadoopgis_spark.geometry.wkb import batch_from_wkb

        _fill_cache(cache, miss_other,
                    batch_from_wkb(miss_other, with_bbox=True))
    geoms = [cache[k] for k in ukeys]
    U = len(geoms)
    kind = np.zeros(U, dtype=np.int8)
    bbox = np.zeros((U, 4), dtype=np.float64)
    ptxy = np.zeros((U, 2), dtype=np.float64)
    isrect = np.zeros(U, dtype=bool)
    verts = np.zeros((U, MAX_VECTOR_VERTS, 2), dtype=np.float64)
    vcnt = np.ones(U, dtype=np.int64)
    for j, g in enumerate(geoms):
        if g is None:
            continue
        bbox[j] = g.bbox
        if g.kind == "POINT":
            kind[j] = _CK_POINT
            ptxy[j] = g.payload
        elif (g.kind == "POLYGON" and len(g.payload) == 1
              and len(g.payload[0]) <= MAX_VECTOR_VERTS):
            kind[j] = _CK_SRING
            r = g.payload[0]
            m = len(r) - 1
            vcnt[j] = m
            verts[j, :m] = r[:m]
            verts[j, m:] = r[m - 1]
            isrect[j] = g.is_rect
        else:
            kind[j] = _CK_OTHER
    view = {"kind": kind, "bbox": bbox, "ptxy": ptxy, "isrect": isrect,
            "verts": verts, "vcnt": vcnt}
    return np.asarray(codes), geoms, view


_NUM_RE = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
_MIN_NUMS = {
    "POINT": 2,
    "LINESTRING": 4,
    "POLYGON": 6,
    "MULTIPOLYGON": 6,
    "MULTIPOINT": 2,
    "MULTILINESTRING": 4,
    # GEOMETRYCOLLECTION is absent on purpose: nested type names leave
    # alphabetic residue, so it always takes the structured-parser path
}


def _mbb_batch(wkt: pd.Series) -> pd.DataFrame:
    """Vectorized MBB extraction: a geometry's bbox is the min/max over
    all its coordinates regardless of structure, so the hot path strips
    punctuation, bulk-parses every number with C-speed ``fromstring``,
    and reduces per row with ``minimum.reduceat``. Rows with leftover
    non-numeric residue or implausible arity fall back to the exact
    parser (preserving the malformed-row skip semantics,
    ``manipulate_2d.cpp:182-189``)."""
    import numpy as np

    n = len(wkt)
    out = np.full((n, 4), np.nan)
    if any(isinstance(v, (bytes, bytearray, memoryview)) for v in wkt.head(5)):
        # WKB batch: binary goes straight to the structured parser
        cache: dict = {}
        for j, g in enumerate(_parse_cache(wkt, cache)):
            if g is not None:
                out[j] = g.bbox
        df = pd.DataFrame(out, columns=["xmin", "ymin", "xmax", "ymax"])
        return df.where(pd.notna(df), None)
    s = wkt.fillna("")
    kind = s.str.extract(
        r"^\s*(MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|POINT|LINESTRING|POLYGON)\s*\(",
        expand=False,
    )
    stripped = s.str.replace(r"^\s*[A-Za-z]+", " ", regex=True).str.replace(
        r"[(),]", " ", regex=True
    )
    residue = stripped.str.replace(_NUM_RE, "", regex=True).str.replace(
        r"\s+", "", regex=True
    )
    counts = stripped.str.count(_NUM_RE).to_numpy()
    fast = (
        kind.notna().to_numpy()
        & (residue.str.len() == 0).to_numpy()
        & (counts % 2 == 0)
        & (counts >= np.array([_MIN_NUMS.get(k, 10**9) for k in kind.fillna("")]))
    )
    if fast.any():
        flat = np.fromstring(" ".join(stripped[fast]), sep=" ")  # noqa: NPY201
        lens = counts[fast]
        if len(flat) == lens.sum():
            offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
            # even positions are x, odd are y
            idx = np.arange(len(flat))
            row_of = np.repeat(np.arange(len(lens)), lens)
            is_x = (idx - np.repeat(offs, lens)) % 2 == 0
            xs, ys = flat[is_x], flat[~is_x]
            half = lens // 2
            hoffs = np.concatenate([[0], np.cumsum(half)])[:-1]
            bbox = np.column_stack(
                [
                    np.minimum.reduceat(xs, hoffs),
                    np.minimum.reduceat(ys, hoffs),
                    np.maximum.reduceat(xs, hoffs),
                    np.maximum.reduceat(ys, hoffs),
                ]
            )
            out[np.nonzero(fast)[0]] = bbox
        else:  # parse disagreement — run everything through the parser
            fast = np.zeros(n, dtype=bool)
    slow_idx = np.nonzero(~fast)[0]
    if len(slow_idx):
        cache: dict = {}
        geoms = _parse_cache(wkt.iloc[slow_idx], cache)
        for j, g in zip(slow_idx, geoms):
            if g is not None:
                out[j] = g.bbox
    df = pd.DataFrame(out, columns=["xmin", "ymin", "xmax", "ymax"])
    return df.where(pd.notna(df), None)


@F.pandas_udf(_MBB_SCHEMA)
def st_mbb(wkt: pd.Series) -> pd.DataFrame:
    """WKT → MBB struct; nulls for malformed rows (T1,
    ``manipulate_2d.cpp:104-135``)."""
    return _mbb_batch(wkt)


@F.pandas_udf(T.BooleanType())
def st_is_valid(wkt: pd.Series) -> pd.Series:
    cache: dict = {}
    return pd.Series([g is not None for g in _parse_cache(wkt, cache)])


@F.pandas_udf(T.BinaryType())
def st_as_wkb(wkt: pd.Series) -> pd.Series:
    """WKT → WKB (the at-scale storage form: binary, no float text)."""
    from hadoopgis_spark.geometry.wkb import to_wkb

    cache: dict = {}
    return pd.Series(
        [to_wkb((g.kind, g.payload)) if g is not None else None
         for g in _parse_cache(wkt, cache)]
    )


@F.pandas_udf(T.StringType())
def st_as_wkt(geom: pd.Series) -> pd.Series:
    """WKB (or WKT) → canonical WKT text."""
    from hadoopgis_spark.geometry.wkt import to_wkt

    cache: dict = {}
    return pd.Series(
        [to_wkt((g.kind, g.payload)) if g is not None else None
         for g in _parse_cache(geom, cache)]
    )


@F.pandas_udf(T.StringType())
def st_from_geojson(js: pd.Series) -> pd.Series:
    """GeoJSON geometry/Feature string → canonical WKT (null when
    malformed — the engine's skip semantics)."""
    from hadoopgis_spark.geometry.geojson import parse_geojson
    from hadoopgis_spark.geometry.wkt import to_wkt

    out = []
    for t in js:
        try:
            out.append(to_wkt(parse_geojson(t)) if t is not None else None)
        except ValueError:
            out.append(None)
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def st_as_geojson(geom: pd.Series) -> pd.Series:
    """WKT (or WKB) → compact GeoJSON string; null when malformed."""
    from hadoopgis_spark.geometry.geojson import to_geojson

    cache: dict = {}
    return pd.Series(
        [to_geojson((g.kind, g.payload)) if g is not None else None
         for g in _parse_cache(geom, cache)]
    )


def _binary_pred_udf(fn: Callable) -> Callable:
    @F.pandas_udf(T.BooleanType())
    def _udf(w1: pd.Series, w2: pd.Series) -> pd.Series:
        cache: dict = {}
        g1s = _parse_cache(w1, cache)
        g2s = _parse_cache(w2, cache)
        return pd.Series(
            [fn(a, b) if a is not None and b is not None else None for a, b in zip(g1s, g2s)]
        )

    return _udf


def _binary_measure_udf(fn: Callable) -> Callable:
    @F.pandas_udf(T.DoubleType())
    def _udf(w1: pd.Series, w2: pd.Series) -> pd.Series:
        cache: dict = {}
        g1s = _parse_cache(w1, cache)
        g2s = _parse_cache(w2, cache)
        return pd.Series(
            [fn(a, b) if a is not None and b is not None else None for a, b in zip(g1s, g2s)]
        )

    return _udf


# Predicate UDFs — names/dispatch mirror get_join_predicate
# (resque_params_2d.hpp:164-208)


def _intersects_columnar(c1, g1u, v1, c2, g2u, v2):
    """Columnar intersects over factorized pair codes: the bbox
    prefilter, the pair classification, and the kernel inputs are ALL
    numpy fancy indexing over the per-unique columns — no per-pair
    Python except the (rare) non-vectorizable shapes. Bit-identical to
    the former per-row loop: same _EPS bbox prefilter, same
    single-ring/point classification, same padded kernels."""
    import numpy as np

    from hadoopgis_spark.geometry.vectorized import (
        batch_points_in_single_ring_padded,
        batch_single_ring_intersects_padded,
    )

    n = len(c1)
    out = np.zeros(n, dtype=object)
    i1 = np.maximum(c1, 0)
    i2 = np.maximum(c2, 0)
    k1 = v1["kind"][i1]
    k2 = v2["kind"][i2]
    isnull = (c1 < 0) | (c2 < 0) | (k1 == _CK_NULL) | (k2 == _CK_NULL)
    b1 = v1["bbox"][i1]
    b2 = v2["bbox"][i2]
    eps = K._EPS
    # _EPS-padded, matching kernel.intersects' prefilter exactly
    sep = (
        (b1[:, 0] > b2[:, 2] + eps) | (b2[:, 0] > b1[:, 2] + eps)
        | (b1[:, 1] > b2[:, 3] + eps) | (b2[:, 1] > b1[:, 3] + eps)
    )
    out[isnull] = None
    live = ~isnull
    out[live & sep] = False
    cand = live & ~sep
    pp = cand & (k1 == _CK_SRING) & (k2 == _CK_SRING)
    ptp = cand & (
        ((k1 == _CK_POINT) & (k2 == _CK_SRING))
        | ((k1 == _CK_SRING) & (k2 == _CK_POINT))
    )
    for i in np.nonzero(cand & ~pp & ~ptp)[0]:
        out[i] = K.intersects(g1u[c1[i]], g2u[c2[i]])
    CHUNK = 4096
    idx = np.nonzero(pp)[0]
    for s in range(0, len(idx), CHUNK):
        sub = idx[s:s + CHUNK]
        res = batch_single_ring_intersects_padded(
            v1["verts"][c1[sub]], v1["vcnt"][c1[sub]],
            v2["verts"][c2[sub]], v2["vcnt"][c2[sub]],
        )
        out[sub] = res.astype(object)
    idx = np.nonzero(ptp)[0]
    for s in range(0, len(idx), CHUNK):
        sub = idx[s:s + CHUNK]
        a_pt = k1[sub] == _CK_POINT
        pts = np.where(a_pt[:, None], v1["ptxy"][c1[sub]], v2["ptxy"][c2[sub]])
        V = np.where(a_pt[:, None, None],
                     v2["verts"][c2[sub]], v1["verts"][c1[sub]])
        cnt = np.where(a_pt, v2["vcnt"][c2[sub]], v1["vcnt"][c1[sub]])
        res = batch_points_in_single_ring_padded(pts, V, cnt)
        out[sub] = res.astype(object)
    return out


@F.pandas_udf(T.BooleanType())
def st_intersects(w1: pd.Series, w2: pd.Series) -> pd.Series:
    """Intersects with the columnar batch fast path (single-ring
    polygon and point/polygon pairs — the dominant refine cases);
    everything else evaluates through the scalar kernel. Bit-identical
    results either way (parity pinned in TestColumnarRefineParity)."""
    cache: dict = {}
    c1, g1u, v1 = _columnar_view(w1, cache)
    c2, g2u, v2 = _columnar_view(w2, cache)
    return pd.Series(_intersects_columnar(c1, g1u, v1, c2, g2u, v2))
st_touches = _binary_pred_udf(K.touches)
st_crosses = _binary_pred_udf(K.crosses)
st_contains = _binary_pred_udf(K.contains)
st_within = _binary_pred_udf(K.within)
st_equals = _binary_pred_udf(K.equals)
st_overlaps = _binary_pred_udf(K.overlaps)
st_disjoint = _binary_pred_udf(K.disjoint)
# st_adjacent ≡ !disjoint in the reference (spjoin_2d.hpp:155-157)
st_adjacent = _binary_pred_udf(lambda a, b: K.intersects(a, b))


@F.pandas_udf(T.DoubleType())
def st_area(wkt: pd.Series) -> pd.Series:
    cache: dict = {}
    return pd.Series([g.area if g is not None else None for g in _parse_cache(wkt, cache)])


def _distance_columnar(c1, g1u, v1, c2, g2u, v2, sel=None):
    """Columnar distance dispatch over factorized
    pair codes (round-11): classification and kernel inputs are numpy
    fancy indexing; only point-point (one ``math.hypot`` each — kept
    scalar to preserve its exact bits) and non-vectorizable shapes loop
    in Python. Rect-rect pairs vectorize too: batch intersects is
    bit-identical to the scalar kernel on single rings, and the box
    corner/edge-gap formula is replicated elementwise. ``sel`` limits
    evaluation to a boolean row mask (the dwithin survivor set).
    Returns an object array: distance, or None where either side is
    null/malformed (unselected rows stay 0)."""
    import numpy as np

    from hadoopgis_spark.geometry.vectorized import (
        batch_points_in_single_ring_padded,
        batch_points_to_single_ring_distance_padded,
        batch_single_ring_distance_padded,
        batch_single_ring_intersects_padded,
    )

    n = len(c1)
    out = np.zeros(n, dtype=object)
    i1 = np.maximum(c1, 0)
    i2 = np.maximum(c2, 0)
    k1 = v1["kind"][i1]
    k2 = v2["kind"][i2]
    null = (c1 < 0) | (c2 < 0) | (k1 == _CK_NULL) | (k2 == _CK_NULL)
    live = ~null
    if sel is not None:
        live &= sel
        null &= sel
    out[null] = None
    ptpt = live & (k1 == _CK_POINT) & (k2 == _CK_POINT)
    srsr = live & (k1 == _CK_SRING) & (k2 == _CK_SRING)
    rect = srsr & v1["isrect"][i1] & v2["isrect"][i2]
    vec = srsr & ~rect
    ptsr = live & (
        ((k1 == _CK_POINT) & (k2 == _CK_SRING))
        | ((k1 == _CK_SRING) & (k2 == _CK_POINT))
    )
    rest = live & ~ptpt & ~srsr & ~ptsr
    for i in np.nonzero(ptpt | rest)[0]:
        out[i] = K.distance(g1u[c1[i]], g2u[c2[i]])
    CHUNK = 4096

    def _pp_chunks(mask, dis_fn):
        idx = np.nonzero(mask)[0]
        for s in range(0, len(idx), CHUNK):
            sub = idx[s:s + CHUNK]
            A, ca = v1["verts"][c1[sub]], v1["vcnt"][c1[sub]]
            B, cb = v2["verts"][c2[sub]], v2["vcnt"][c2[sub]]
            # intersects first (scalar kernel order): intersecting
            # pairs are 0.0, only disjoint pairs reach the formula
            inter = batch_single_ring_intersects_padded(A, ca, B, cb)
            res = np.zeros(len(sub), dtype=np.float64)
            dis = np.nonzero(~inter)[0]
            if len(dis):
                res[dis] = dis_fn(sub[dis], A[dis], ca[dis], B[dis], cb[dis])
            out[sub] = res.astype(object)

    _pp_chunks(vec, lambda sub, A, ca, B, cb:
               batch_single_ring_distance_padded(A, ca, B, cb))

    def _rect_gap(sub, A, ca, B, cb):
        # kernel.distance's rect-rect shortcut, elementwise: the same
        # max/sqrt expression shape as functions.boxes.box_distance
        ab = v1["bbox"][c1[sub]]
        bb = v2["bbox"][c2[sub]]
        dx = np.maximum(0.0, np.maximum(bb[:, 0] - ab[:, 2],
                                        ab[:, 0] - bb[:, 2]))
        dy = np.maximum(0.0, np.maximum(bb[:, 1] - ab[:, 3],
                                        ab[:, 1] - bb[:, 3]))
        return np.sqrt(dx * dx + dy * dy)

    _pp_chunks(rect, _rect_gap)

    idx = np.nonzero(ptsr)[0]
    for s in range(0, len(idx), CHUNK):
        sub = idx[s:s + CHUNK]
        a_pt = k1[sub] == _CK_POINT
        pts = np.where(a_pt[:, None], v1["ptxy"][c1[sub]], v2["ptxy"][c2[sub]])
        V = np.where(a_pt[:, None, None],
                     v2["verts"][c2[sub]], v1["verts"][c1[sub]])
        cnt = np.where(a_pt, v2["vcnt"][c2[sub]], v1["vcnt"][c1[sub]])
        ins = batch_points_in_single_ring_padded(pts, V, cnt)
        res = np.zeros(len(sub), dtype=np.float64)
        dis = np.nonzero(~ins)[0]
        if len(dis):
            res[dis] = batch_points_to_single_ring_distance_padded(
                pts[dis], V[dis], cnt[dis])
        out[sub] = res.astype(object)
    return out


@F.pandas_udf(T.DoubleType())
def st_distance(w1: pd.Series, w2: pd.Series) -> pd.Series:
    """Min distance through the columnar batch path
    (:func:`_distance_columnar`); bit-identical to the scalar kernel."""
    cache: dict = {}
    c1, g1u, v1 = _columnar_view(w1, cache)
    c2, g2u, v2 = _columnar_view(w2, cache)
    return pd.Series(_distance_columnar(c1, g1u, v1, c2, g2u, v2))


st_haversine_m = _binary_measure_udf(K.haversine_distance)
st_intersection_area = _binary_measure_udf(K.intersection_area)
st_union_area = _binary_measure_udf(K.union_area)
st_jaccard = _binary_measure_udf(K.jaccard)
st_dice = _binary_measure_udf(K.dice)


_KERNEL_PREDS: dict[str, Callable] = {
    "st_intersects": K.intersects,
    "st_touches": K.touches,
    "st_crosses": K.crosses,
    "st_contains": K.contains,
    "st_within": K.within,
    "st_equals": K.equals,
    "st_overlaps": K.overlaps,
    "st_disjoint": K.disjoint,
    "st_adjacent": K.intersects,  # ≡ !disjoint (spjoin_2d.hpp:155-157)
}


def st_window_hit(
    window_wkt: str,
    predicate: str = "st_intersects",
    distance: float | None = None,
    geography: bool = False,
) -> Callable:
    """Fused containment kernel: bbox extraction + window-MBB prune +
    exact refine against a CONSTANT window, in ONE Arrow stage.

    Replaces the two-stage ``with_mbb`` → predicate-UDF pipeline inside
    :func:`operators.containment.containment` for WKT data (the
    reference's filter+refine containment pass,
    ``query_containment.hpp:62-163`` + ``resque_2d.cpp:127-273``) — the
    per-row work is identical, but geometry text crosses the Arrow
    boundary once instead of twice, and only bbox-surviving rows reach
    the exact kernel inside the same batch.

    Returns a pandas UDF producing a struct ``{xmin,ymin,xmax,ymax,hit}``
    — ``hit`` null for malformed rows (the caller drops them, matching
    ``manipulate_2d.cpp:182-189``); bbox columns preserved so callers
    keep the ``with_mbb`` output schema.

    Prune/refine parity: the prune replicates ``boxes.box_intersects``
    (closed comparisons, ``pad=distance``) exactly as the two-stage
    pipeline applies it, and the refine replicates the per-predicate
    dispatch of :func:`st_predicate` / :func:`st_dwithin` — results are
    bit-identical to the unfused path.
    """
    pad = float(distance or 0.0)
    if predicate == "st_dwithin":
        if distance is None:
            raise ValueError("st_dwithin requires distance=")
    elif predicate not in _KERNEL_PREDS:
        raise ValueError(f"unknown predicate {predicate!r}")
    state: dict = {}

    @F.pandas_udf(_WINDOW_HIT_SCHEMA)
    def _udf(wkt: pd.Series) -> pd.DataFrame:
        import numpy as np

        from hadoopgis_spark.geometry.vectorized import (
            MAX_VECTOR_VERTS,
            batch_points_in_single_ring,
            batch_single_ring_intersects,
        )

        win = state.get("g")
        if win is None:
            win = state["g"] = Geometry.from_wkt(window_wkt)
        wx0, wy0, wx1, wy1 = win.bbox
        bbox = _mbb_batch(wkt)
        arr = bbox.to_numpy(dtype=np.float64, na_value=np.nan)
        valid = ~np.isnan(arr[:, 0])
        # closed-box overlap, pad-expanded — boxes.box_intersects verbatim
        cand = (
            valid
            & (arr[:, 0] - pad <= wx1)
            & (wx0 <= arr[:, 2] + pad)
            & (arr[:, 1] - pad <= wy1)
            & (wy0 <= arr[:, 3] + pad)
        )
        # non-candidates stay False — the unfused pipeline's box prefilter
        # drops them before any predicate runs (even st_disjoint), and the
        # fused path preserves that behavior exactly
        n = len(wkt)
        hit = np.full(n, False, dtype=object)
        hit[~valid] = None
        idx = np.nonzero(cand)[0]
        if len(idx):
            cache: dict = {}
            geoms = _parse_cache(wkt.iloc[idx], cache)
            win_ring = (
                win.payload[0]
                if win.kind == "POLYGON"
                and len(win.payload) == 1
                and len(win.payload[0]) <= MAX_VECTOR_VERTS
                else None
            )
            rest: list[tuple[int, object]] = []
            pt_i: list[int] = []
            pt_g: list = []
            ring_i: list[int] = []
            ring_g: list = []
            for i, g in zip(idx, geoms):
                if g is None:
                    hit[i] = None
                elif predicate == "st_intersects" and win_ring is not None and g.kind == "POINT":
                    pt_i.append(i)
                    pt_g.append(g.payload)
                elif (
                    predicate == "st_intersects"
                    and win_ring is not None
                    and g.kind == "POLYGON"
                    and len(g.payload) == 1
                    and len(g.payload[0]) <= MAX_VECTOR_VERTS
                ):
                    ring_i.append(i)
                    ring_g.append(g.payload[0])
                else:
                    rest.append((i, g))
            CHUNK = 4096
            for s in range(0, len(pt_i), CHUNK):
                part = slice(s, s + CHUNK)
                res = batch_points_in_single_ring(
                    np.array(pt_g[part]), [win_ring] * len(pt_i[part])
                )
                for j, i in enumerate(pt_i[part]):
                    hit[i] = bool(res[j])
            for s in range(0, len(ring_i), CHUNK):
                part = slice(s, s + CHUNK)
                res = batch_single_ring_intersects(
                    ring_g[part], [win_ring] * len(ring_i[part])
                )
                for j, i in enumerate(ring_i[part]):
                    hit[i] = bool(res[j])
            for i, g in rest:
                if predicate == "st_dwithin":
                    hit[i] = bool(K.dwithin(g, win, distance, geography=geography))
                else:
                    hit[i] = bool(_KERNEL_PREDS[predicate](g, win))
        out = bbox.copy()
        out["hit"] = hit
        return out

    return _udf


_WINDOW_HIT_SCHEMA = T.StructType(
    list(_MBB_SCHEMA.fields) + [T.StructField("hit", T.BooleanType())]
)


def st_dwithin_pd(a: pd.Series, b: pd.Series, d: float,
                  geography: bool = False) -> pd.Series:
    """Pandas-level body of :func:`st_dwithin` (exposed for the
    columnar parity suite)."""
    import numpy as np

    cache: dict = {}
    if geography:
        # haversine point pairs / geographic dwithin: scalar path
        g1s = _parse_cache(a, cache)
        g2s = _parse_cache(b, cache)
        return pd.Series([
            (K.dwithin(x, y, d, geography=True)
             if x is not None and y is not None else None)
            for x, y in zip(g1s, g2s)
        ], dtype=object)
    # planar: the d-padded bbox prefilter (kernel.dwithin verbatim,
    # vectorized over the per-unique bbox columns), then the columnar
    # distance dispatch on survivors, compared to d
    c1, g1u, v1 = _columnar_view(a, cache)
    c2, g2u, v2 = _columnar_view(b, cache)
    n = len(c1)
    out = np.zeros(n, dtype=object)
    i1 = np.maximum(c1, 0)
    i2 = np.maximum(c2, 0)
    null = ((c1 < 0) | (c2 < 0)
            | (v1["kind"][i1] == _CK_NULL) | (v2["kind"][i2] == _CK_NULL))
    b1 = v1["bbox"][i1]
    b2 = v2["bbox"][i2]
    sep = (
        (b1[:, 0] > b2[:, 2] + d) | (b2[:, 0] > b1[:, 2] + d)
        | (b1[:, 1] > b2[:, 3] + d) | (b2[:, 1] > b1[:, 3] + d)
    )
    out[null] = None
    live = ~null
    out[live & sep] = False
    sel = live & ~sep
    if sel.any():
        dist = _distance_columnar(c1, g1u, v1, c2, g2u, v2, sel=sel)
        idx = np.nonzero(sel)[0]
        hit = np.array([dist[i] <= d for i in idx], dtype=bool)
        out[idx] = hit.astype(object)
    return pd.Series(out)


def st_dwithin(w1: Column, w2: Column, d: float, geography: bool = False) -> Column:
    """distance(g1,g2) ≤ d (haversine for geography point pairs) —
    ``spjoin_2d.hpp:167-205``."""

    @F.pandas_udf(T.BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return st_dwithin_pd(a, b, d, geography)

    return _udf(w1, w2)


PREDICATES: dict[str, Callable] = {
    "st_intersects": st_intersects,
    "st_touches": st_touches,
    "st_crosses": st_crosses,
    "st_contains": st_contains,
    "st_within": st_within,
    "st_equals": st_equals,
    "st_overlaps": st_overlaps,
    "st_disjoint": st_disjoint,
    "st_adjacent": st_adjacent,
}


def st_predicate(name: str) -> Callable:
    """Predicate UDF by reference name (``resque_params_2d.hpp:10-12``)."""
    try:
        return PREDICATES[name]
    except KeyError:
        raise ValueError(
            f"unknown predicate {name!r}; choose from {sorted(PREDICATES)} "
            "(st_dwithin/st_nearest take parameters — use st_dwithin() / knn_join())"
        ) from None
