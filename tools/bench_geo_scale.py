#!/usr/bin/env python
"""Geography-surface scale benchmark (round 11, BASELINE.md).

Measures the two geography fixes at sf0.1-like scale on derived
lon/lat points:

* ``dwithin`` — 15k x 40k points, 200 km threshold: the meters→degrees
  pad keeps the multicast bounded (pre-fix, the 200,000 "degree" pad
  multicast every object to every tile — accidental all-pairs).
  Also prints the assignment blowup factor (assigned rows / objects).
* ``knn`` — 15k x 40k exact geography kNN k=3 through the
  meter-radius/degree-pad machinery (native JVM haversine end to end).

Usage: python tools/bench_geo_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoopgis_spark.operators import knn_join, spatial_join
from hadoopgis_spark.session import get_spark

spark = get_spark("geo-bench")


def pts(n, seed, lon0=-40.0, lon_span=80.0, lat0=45.0, lat_span=35.0):
    df = spark.range(1, n + 1)
    r1 = F.abs(F.hash(F.col("id"), F.lit(seed)) % 1000000) / 1000000.0
    r2 = F.abs(F.hash(F.col("id"), F.lit(seed + 1)) % 1000000) / 1000000.0
    lon = lon0 + r1 * lon_span
    lat = lat0 + r2 * lat_span
    return df.select("id", lon.alias("xmin"), lat.alias("ymin"),
                     lon.alias("xmax"), lat.alias("ymax"))


def main():
    a, b = pts(15_000, 3), pts(40_000, 900)
    # warm
    spatial_join(pts(2000, 1), pts(2000, 5), "st_dwithin",
                 distance=100_000.0, geography=True).count()

    t0 = time.time()
    n = spatial_join(a, b, "st_dwithin", distance=200_000.0,
                     geography=True).count()
    t_dw = time.time() - t0
    print(f"GEO DWITHIN 15k x 40k @200km: {n} pairs in {t_dw:.1f}s",
          flush=True)

    # multicast contract at this scale: assignment blowup factor
    import numpy as np

    from hadoopgis_spark.functions import boxes as B
    from hadoopgis_spark.operators.spatial_join import (
        _suffix_all, default_bucket_size)
    from hadoopgis_spark.operators.tile import (
        assign_tiles, sample_mbbs, tiles_dataframe)
    from hadoopgis_spark.partition import partition_tiles

    n_a = 15_000
    sample = sample_mbbs(a, n_a, 200_000)
    tiles = partition_tiles(
        sample, default_bucket_size(n_a, spark), "bsp", cover_plane=True)
    tdf = tiles_dataframe(spark, tiles)
    at = _suffix_all(a, "_1")
    pad = B.geo_degree_pad(F.lit(200_000.0), F.col("ymin_1"), F.col("ymax_1"))
    assigned = assign_tiles(
        at, tdf, pad=pad,
        mbb_cols=("xmin_1", "ymin_1", "xmax_1", "ymax_1")).count()
    print(f"GEO MULTICAST: {assigned} assigned rows / {n_a} objects "
          f"({len(tiles)} tiles) = {assigned / n_a:.2f}x "
          f"(pre-fix: {len(tiles)}x)", flush=True)

    t0 = time.time()
    nk = knn_join(a, b, k=3, mode="exact", geography=True).count()
    print(f"GEO KNN 15k x 40k k=3: {nk} rows in {time.time() - t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
