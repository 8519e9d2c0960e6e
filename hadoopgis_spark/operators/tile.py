"""Tile tables and multicast tile assignment (J6).

The reference maps every object to every tile its MBB intersects via an
R-tree over the broadcast tile index
(``/root/reference/src/transform/manipulate_2d.cpp:151-180,218-234``).
Here the tile table is a small broadcast DataFrame and assignment is a
broadcast range join — pure column conditions, JVM-side, no UDF. Tile
counts are O(data/bucket_size) and bounded by the driver-side sample,
so the broadcast stays small at any data scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.functions.boxes import box_intersects

__all__ = ["tiles_dataframe", "assign_tiles", "sample_mbbs"]

TILE_SCHEMA = "tile_id string, t_xmin double, t_ymin double, t_xmax double, t_ymax double"


def tiles_dataframe(spark: SparkSession, tiles) -> DataFrame:
    """Materialize driver-side tile rows [(tile_id, x0, y0, x1, y1), ...]
    as the broadcastable tile table (partition.idx analogue,
    ``query_partition.hpp:271-278``)."""
    rows = [(t[0], float(t[1]), float(t[2]), float(t[3]), float(t[4])) for t in tiles]
    return spark.createDataFrame(rows, TILE_SCHEMA)


def assign_tiles(
    df: DataFrame,
    tiles_df: DataFrame,
    pad: float = 0.0,
    mbb_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
) -> DataFrame:
    """Multicast each row to every tile its (optionally padded) MBB
    intersects. Boundary-crossing rows are replicated — the joins
    dedup downstream (reference-point or distinct, see spatial_join).
    """
    cond = box_intersects(
        F.col(mbb_cols[0]), F.col(mbb_cols[1]), F.col(mbb_cols[2]), F.col(mbb_cols[3]),
        F.col("t_xmin"), F.col("t_ymin"), F.col("t_xmax"), F.col("t_ymax"),
        pad=pad,
    )
    return df.join(F.broadcast(tiles_df), cond, "inner")


def sample_mbbs(df: DataFrame, n_rows: int, max_sample: int = 200_000) -> np.ndarray:
    """Bounded driver-side MBB sample for the partitioner (the reference
    samples with a coin flip in the partition job's mapper,
    ``src/transform/sampler.cpp:14-38``). Driver memory stays
    O(max_sample) regardless of data size."""
    frac = min(1.0, max_sample / max(1, n_rows))
    s = df.select("xmin", "ymin", "xmax", "ymax")
    if frac < 1.0:
        s = s.sample(fraction=frac, seed=42)
    pdf = s.toPandas()
    return pdf.to_numpy(dtype=np.float64)
