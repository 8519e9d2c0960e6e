"""Containment / window query (J3).

Reference: ``execute_containment`` prunes tiles intersecting the window
and runs a mapper-only filter-refine pass over the surviving tile files
(``/root/reference/src/framework/query_containment.hpp:62-163``; window
parse ``utilities/queryprocessor_aux.h:20-54``; probe
``resque_2d.cpp:127-273``).

Spark restatement: a plain ``filter`` whose cheap conjunct is the MBB
range condition — Catalyst pushes it into the Parquet scan (row-group
min/max skipping over the xmin/ymin/xmax/ymax columns does the
reference's tile pruning automatically), and the exact predicate UDF
refines only survivors. On data loaded with
``sources.loader.save_partitioned`` the tile_id partition column prunes
whole directories too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.functions import boxes as B
from hadoopgis_spark.functions.spatial import st_dwithin, st_predicate, st_window_hit
from hadoopgis_spark.geometry import Geometry
from hadoopgis_spark.operators.mbb import MBB_COLS, with_mbb

__all__ = ["containment", "parse_window", "geo_window"]


def parse_window(window: str) -> tuple[str | None, tuple[float, float, float, float]]:
    """Accept WKT, the reference's bare-MBB form ``"x0,y0,x1,y1"``
    (``--containrange``, ``queryprocessor_aux.h:20-44``), or ``"@path"``
    — read the window spec from the first line of a file, the
    ``--containfile`` mode (``query_containment.hpp:98-105``).
    Returns (wkt_or_None, mbb)."""
    s = window.strip()
    if s.startswith("@"):
        with open(s[1:]) as fh:
            s = fh.readline().strip()
    if "(" in s:
        g = Geometry.from_wkt(s)
        return s, g.bbox
    parts = [float(v) for v in s.replace(",", " ").split()]
    if len(parts) != 4:
        raise ValueError(f"window must be WKT or 'x0,y0,x1,y1': {window!r}")
    x0, y0, x1, y1 = parts
    return None, (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))


def containment(
    df: DataFrame,
    window: str,
    predicate: str = "st_intersects",
    *,
    geom_col: str = "geom",
    distance: float | None = None,
    geography: bool = False,
) -> DataFrame:
    """Rows of ``df`` satisfying ``predicate(geom, window)``.

    The window is a constant, so the MBB conjunct is a literal range
    filter — fully pushable. WKT windows refine with the exact kernel;
    bare-MBB windows (or box-native data) stay entirely in the JVM.
    """
    wkt, (wx0, wy0, wx1, wy1) = parse_window(window)
    wkt_mode = geom_col in df.columns
    pad = float(distance or 0.0)
    window_is_box = wkt is None or _wkt_is_rectangle(wkt)
    needs_refine = not (window_is_box and predicate == "st_intersects" and pad == 0.0)

    if wkt_mode and needs_refine and not all(c in df.columns for c in MBB_COLS):
        # fused single-Arrow-stage path: bbox + window prune + exact
        # refine in one batch kernel (same per-row work, half the IPC);
        # output schema matches the unfused with_mbb pipeline
        hit = st_window_hit(
            wkt if wkt is not None else _mbb_wkt(wx0, wy0, wx1, wy1),
            predicate,
            distance=distance,
            geography=geography,
        )
        once = hit.asNondeterministic()(F.col(geom_col))
        return (
            df.withColumn("_w", once)
            .select(
                "*",
                F.col("_w.xmin").alias("xmin"),
                F.col("_w.ymin").alias("ymin"),
                F.col("_w.xmax").alias("xmax"),
                F.col("_w.ymax").alias("ymax"),
                F.col("_w.hit").alias("_hit"),
            )
            .drop("_w")
            .filter(F.col("_hit"))
            .drop("_hit")
        )

    df = with_mbb(df, geom_col) if wkt_mode else df

    prefilter = B.box_intersects(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        F.lit(wx0), F.lit(wy0), F.lit(wx1), F.lit(wy1), pad=pad,
    )
    out = df.filter(prefilter)

    if wkt_mode and needs_refine:
        w = F.lit(wkt if wkt is not None else _mbb_wkt(wx0, wy0, wx1, wy1))
        if predicate == "st_dwithin":
            if distance is None:
                raise ValueError("st_dwithin requires distance=")
            out = out.filter(st_dwithin(F.col(geom_col), w, distance, geography=geography))
        else:
            out = out.filter(st_predicate(predicate)(F.col(geom_col), w))
    elif not wkt_mode and predicate != "st_intersects":
        m = [F.col(c) for c in MBB_COLS]
        wlits = [F.lit(wx0), F.lit(wy0), F.lit(wx1), F.lit(wy1)]
        if predicate == "st_within":
            out = out.filter(B.box_contains(*wlits, *m))
        elif predicate == "st_contains":
            out = out.filter(B.box_contains(*m, *wlits))
        elif predicate == "st_dwithin":
            out = df.filter(B.box_distance(*m, *wlits) <= pad)
        else:
            raise ValueError(f"unsupported box containment predicate {predicate}")
    return out


def geo_window(
    df: DataFrame,
    center: tuple[float, float],
    radius_m: float,
    *,
    geom_col: str = "geom",
    stat_col: str | None = None,
) -> DataFrame:
    """Geography circular window — the meter-radius face of J3 (round
    13): rows of ``df`` whose POINT lies within ``radius_m`` haversine
    meters of ``center = (lon, lat)``, reference earth constants
    (``geographical.h:11-22``; the reference ships no geography
    containment — this extends its ``-e true`` earth branch,
    ``spjoin_2d.hpp:167-205``, to the window query).

    Pure Column pipeline, no join, no multicast: the window is a
    literal, so the candidate test is a map-side conjunct —
    ``|Δφ| ≤ r / M_PER_DEG`` (a plain pushable range on the lat
    column for box-native data) AND wrapped ``min(|Δλ|, 360 − |Δλ|) ≤
    geo_degree_pad(r)`` — and the exact haversine refine decides. A
    filter, unlike a join, can test the WRAPPED angular difference
    directly, so this face is antimeridian-correct by construction
    with no ±360° copies, in both the [-180, 180] and [0, 360] lon
    conventions (the window center may sit on either side of the
    seam). POINT data only, validated up front like every geography
    face (``require_points_geo``: point-degenerate MBBs, lat within
    [-90, 90], lon span ≤ 360°). ``stat_col`` attaches the haversine
    meters to the surviving rows."""
    from hadoopgis_spark.operators.mbb import (extent_and_spans,
                                               require_points_geo, with_mbb)

    clon, clat = float(center[0]), float(center[1])
    if not -90.0 <= clat <= 90.0:
        raise ValueError(f"geo_window center latitude {clat} outside "
                         "[-90, 90]")
    out = df
    if geom_col in df.columns and not all(c in df.columns for c in MBB_COLS):
        out = with_mbb(out, geom_col)
    ext = extent_and_spans(out.select(*MBB_COLS))
    require_points_geo(ext, "geo_window")
    r = float(radius_m)
    x, y = F.col("xmin"), F.col("ymin")  # degenerate point MBB corner
    dphi = F.lit(r / B.M_PER_DEG)
    dlam = B.geo_degree_pad(F.lit(r), F.lit(clat), F.lit(clat))
    adl = F.abs(x - F.lit(clon))
    cand = (F.abs(y - F.lit(clat)) <= dphi) & (
        F.least(adl, F.lit(360.0) - adl) <= dlam)
    hav = B.haversine_m(F.lit(clon), F.lit(clat), x, y)
    out = out.filter(cand).filter(hav <= F.lit(r))
    if stat_col is not None:
        out = out.withColumn(stat_col, hav)
    return out


def _mbb_wkt(x0, y0, x1, y1) -> str:
    return f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"


def _wkt_is_rectangle(wkt: str) -> bool:
    try:
        g = Geometry.from_wkt(wkt)
    except ValueError:
        return False
    if g.kind != "POLYGON" or len(g.payload) != 1:
        return False
    ring = g.payload[0]
    if len(ring) != 5:
        return False
    x0, y0, x1, y1 = g.bbox
    corners = {(x0, y0), (x1, y0), (x1, y1), (x0, y1)}
    return {(float(p[0]), float(p[1])) for p in ring[:-1]} == corners
