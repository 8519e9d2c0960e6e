"""Transform / utility operators (SURVEY §2.8, §2.4, §2.6).

* ``normalize_mbb``/``denormalize_mbb`` — T2 unit-space rescaling
  (``/root/reference/src/progparams/partition_params.hpp:71-96``)
* ``discretize_coords`` — T3 per-tile integer-grid vertex snapping
  (``src/transform/discretize_cords.cpp:39-330``)
* ``partition_quality_stats`` — A2+A3 per-tile histogram + quality
  aggregate (``framework/queryprocessor_2d.cpp:61-105``)
* ``uniqpart`` — O5 dedup ignoring trailing columns
  (``boundaryhandler/duplicate_remover.cpp:45-63``)
* ``bernoulli_sample`` — S7 (``transform/sampler.cpp:14-38``)
* ``rect_union_area`` — T5 sweep-line union area of tile rectangles
  (``utilities/tile_rectangle.h:23-158``), driver-side quality metric
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_mbb",
    "denormalize_mbb",
    "discretize_coords",
    "partition_quality_stats",
    "uniqpart",
    "bernoulli_sample",
    "rect_union_area",
]


def normalize_mbb(df: DataFrame, extent: tuple[float, float, float, float]) -> DataFrame:
    """Rescale MBB columns into unit space [0,1]² (T2 ``--norm``)."""
    x0, y0, x1, y1 = extent
    w = max(x1 - x0, 1e-300)
    h = max(y1 - y0, 1e-300)
    return df.withColumns(
        {
            "xmin": (F.col("xmin") - x0) / w,
            "xmax": (F.col("xmax") - x0) / w,
            "ymin": (F.col("ymin") - y0) / h,
            "ymax": (F.col("ymax") - y0) / h,
        }
    )


def denormalize_mbb(df: DataFrame, extent: tuple[float, float, float, float]) -> DataFrame:
    """Inverse of :func:`normalize_mbb` (T2 ``--denorm``)."""
    x0, y0, x1, y1 = extent
    w, h = x1 - x0, y1 - y0
    return df.withColumns(
        {
            "xmin": F.col("xmin") * w + x0,
            "xmax": F.col("xmax") * w + x0,
            "ymin": F.col("ymin") * h + y0,
            "ymax": F.col("ymax") * h + y0,
        }
    )


def discretize_coords(
    df: DataFrame,
    geom_col: str = "geom",
    cell: float = 1.0,
    origin: tuple[float, float] = (0.0, 0.0),
    skip_complex: bool = False,
) -> DataFrame:
    """Snap polygon vertices to an integer grid and re-emit WKT (T3).

    ``skip_complex`` drops polygons with holes, like the reference's
    ``--skipcomplex`` (``discretize_cords.cpp:192-202``). Runs as an
    Arrow-batched pandas UDF over the WKT column.
    """
    from pyspark.sql import types as T

    from hadoopgis_spark.geometry.wkt import parse_wkt, to_wkt

    ox, oy = origin

    @F.pandas_udf(T.StringType())
    def snap(wkt: pd.Series) -> pd.Series:
        out = []
        for w in wkt:
            try:
                kind, payload = parse_wkt(w)
            except (ValueError, TypeError):
                out.append(None)
                continue
            if kind != "POLYGON":
                out.append(None)
                continue
            if skip_complex and len(payload) > 1:
                out.append(None)
                continue
            rings = [
                np.round((r - np.array([ox, oy])) / cell).astype(np.int64).astype(np.float64)
                for r in payload
            ]
            out.append(to_wkt(("POLYGON", rings)))
        return pd.Series(out)

    return df.withColumn(geom_col, snap(F.col(geom_col))).filter(F.col(geom_col).isNotNull())


def partition_quality_stats(assigned: DataFrame, tile_col: str = "tile_id") -> DataFrame:
    """A3: one-row quality summary over per-tile object counts —
    n_tiles, total, avg/min/max/stddev of tile occupancy."""
    hist = assigned.groupBy(tile_col).agg(F.count(F.lit(1)).alias("n"))
    # avg/stddev derived from exact integer moments (count, Σn, Σn²) so a
    # SQL oracle computing the identical expression shape produces the
    # bit-identical double before rounding (cross-engine hash stability;
    # native STDDEV_SAMP accumulates doubles in engine-specific order).
    m = hist.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.min("n").alias("min_per_tile"),
        F.max("n").alias("max_per_tile"),
    )
    c = F.col("c").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    return m.select(
        F.col("c").alias("n_tiles"),
        F.col("s1").alias("n_objects"),
        F.round(s1 / c, 6).alias("avg_per_tile"),
        "min_per_tile",
        "max_per_tile",
        # clamp: s2 - s1²/c can round slightly negative when variance ≈ 0
        # and s1² exceeds 2^53 (≥ ~9.4e7 total objects — inside the 100 TB
        # design point); sqrt(neg) is NaN here but a hard error in DuckDB,
        # so both engines clamp with the identical expression shape
        F.round(
            F.when(
                F.col("c") > 1,
                F.sqrt(F.greatest((s2 - s1 * s1 / c) / (c - F.lit(1.0)), F.lit(0.0))),
            ),
            6,
        ).alias("stddev_per_tile"),
    )


def uniqpart(df: DataFrame, ignore_last: int = 1) -> DataFrame:
    """O5 ``uniqpart``: dedup ignoring the last ``ignore_last`` columns
    (keeps the first row per key by all remaining columns)."""
    keys = df.columns[: len(df.columns) - ignore_last]
    return df.dropDuplicates(keys)


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """S7 coin-flip sampler."""
    return df.sample(fraction=fraction, seed=seed)


def rect_union_area(tiles: np.ndarray) -> float:
    """Exact union area of axis-aligned rectangles (driver-side, T5).

    Coordinate-compression grid sweep over the (small) tile table —
    replaces the reference's segment-tree sweep for a metric that is
    only ever computed over O(n/bucket) tiles.
    """
    if len(tiles) == 0:
        return 0.0
    t = np.asarray(tiles, dtype=np.float64)
    xs = np.unique(np.concatenate([t[:, 0], t[:, 2]]))
    ys = np.unique(np.concatenate([t[:, 1], t[:, 3]]))
    if len(xs) < 2 or len(ys) < 2:
        return 0.0
    covered = np.zeros((len(xs) - 1, len(ys) - 1), dtype=bool)
    for x0, y0, x1, y1 in t:
        i0, i1 = np.searchsorted(xs, x0), np.searchsorted(xs, x1)
        j0, j1 = np.searchsorted(ys, y0), np.searchsorted(ys, y1)
        covered[i0:i1, j0:j1] = True
    dx = np.diff(xs)
    dy = np.diff(ys)
    return float((covered * np.outer(dx, dy)).sum())
