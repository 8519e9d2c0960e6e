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
* ``seam`` (round 12) — the same dwithin/kNN shapes on a GLOBAL lon
  grid (±180°): the antimeridian wrap-multicast engages, and the extra
  A-side copies stay proportional to the seam-adjacent fraction (the
  wrap's scale contract), while a brute cross-join haversine count
  verifies the seam pairs are actually found.

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

    # ---- round 12: antimeridian seam at scale --------------------------
    # global lon grid spanning the full ±180°: the wrap engages (span >
    # 180°), every within-radius pair — including cross-seam — must be
    # found, and the wrap's multicast overhead stays proportional to
    # the seam-adjacent fraction of A
    ga = pts(15_000, 31, lon0=-180.0, lon_span=360.0, lat0=-30.0,
             lat_span=60.0)
    gb = pts(40_000, 977, lon0=-180.0, lon_span=360.0, lat0=-30.0,
             lat_span=60.0)
    t0 = time.time()
    ns = spatial_join(ga, gb, "st_dwithin", distance=200_000.0,
                      geography=True).count()
    t_seam = time.time() - t0
    # oracle: one cross-join haversine count (Spark-side, exact)
    hav = (
        F.lit(2.0 * B.EARTH_RADIUS_MI * B.MI_TO_M)
        * F.asin(F.least(F.lit(1.0), F.sqrt(
            F.pow(F.sin((F.radians(F.col("by")) - F.radians(F.col("ay"))) / 2), 2)
            + F.cos(F.radians(F.col("ay"))) * F.cos(F.radians(F.col("by")))
            * F.pow(F.sin((F.radians(F.col("bx")) - F.radians(F.col("ax"))) / 2), 2)
        )))
    )
    brute = (
        ga.select(F.col("xmin").alias("ax"), F.col("ymin").alias("ay"))
        .crossJoin(gb.select(F.col("xmin").alias("bx"),
                             F.col("ymin").alias("by")))
        .filter(hav <= 200_000.0).count()
    )
    ok = "OK" if ns == brute else f"MISMATCH (brute={brute})"
    print(f"GEO SEAM DWITHIN 15k x 40k global @200km: {ns} pairs in "
          f"{t_seam:.1f}s — brute-parity {ok}", flush=True)

    # wrap overhead: A-side rows entering assignment vs plain A
    from hadoopgis_spark.operators.tile import wrap_antimeridian
    gat = _suffix_all(ga, "_1")
    gpad = B.geo_degree_pad(F.lit(200_000.0), F.col("ymin_1"),
                            F.col("ymax_1"))
    wrapped = wrap_antimeridian(
        gat, gpad, ("xmin_1", "ymin_1", "xmax_1", "ymax_1"),
        (-180.0, 180.0)).count()
    print(f"GEO SEAM WRAP OVERHEAD: {wrapped} assignment rows / 15000 "
          f"objects = {wrapped / 15_000:.3f}x (copies = seam-adjacent "
          "fraction only)", flush=True)

    t0 = time.time()
    nks = knn_join(ga, gb, k=3, mode="exact", geography=True).count()
    print(f"GEO SEAM KNN 15k x 40k global k=3: {nks} rows in "
          f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
