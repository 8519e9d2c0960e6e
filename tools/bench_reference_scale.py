#!/usr/bin/env python
"""Reference-scale spatial benchmarks (BASELINE.md §BENCH reference points).

Reproduces the reference's own test workload scales on derived triangle
data (``/root/reference/test/testPolygonJoins.sh:10-11,20,80`` — 500k ×
800k polygons, st_intersects + mindist; ``testPolygonNN.sh:10-12,18`` —
20k × 30k, k=3) through the full WKT engine path. Identical data
generation to the round-1 recording, so timings are comparable across
rounds. Prints one line per workload.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoopgis_spark.operators import knn_join, spatial_join
from hadoopgis_spark.session import get_spark

spark = get_spark("tri-bench-full")


def tri_df(n, seed, extent=10000.0, size=12.0):
    # WKT triangles derived from range() — no driver-side lists
    df = spark.range(1, n + 1).withColumn("r1", F.hash(F.col("id"), F.lit(seed)) % 1000000 / 1000000.0)
    df = df.withColumn("r2", F.hash(F.col("id"), F.lit(seed + 1)) % 1000000 / 1000000.0)
    df = df.withColumn("x", F.abs(F.col("r1")) * extent).withColumn("y", F.abs(F.col("r2")) * extent)
    s = size
    wkt = F.concat(
        F.lit("POLYGON (("), F.col("x"), F.lit(" "), F.col("y"), F.lit(", "),
        F.col("x") + s, F.lit(" "), F.col("y"), F.lit(", "),
        F.col("x"), F.lit(" "), F.col("y") + s, F.lit(", "),
        F.col("x"), F.lit(" "), F.col("y"), F.lit("))"))
    return df.select("id", wkt.alias("geom"))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "std"
    # warm the JVM / codegen
    spatial_join(tri_df(5000, 1), tri_df(5000, 99), "st_intersects").count()

    if which in ("std", "all"):
        a, b = tri_df(500_000, 1), tri_df(800_000, 1000)
        t0 = time.time()
        n = spatial_join(a, b, "st_intersects", stats=["mindist"]).count()
        print(f"JOIN 500k x 800k: {n} pairs in {time.time() - t0:.1f}s", flush=True)

        a2, b2 = tri_df(20_000, 7, extent=3000.0), tri_df(30_000, 77, extent=3000.0)
        t0 = time.time()
        nk = knn_join(a2, b2, k=3, mode="exact").count()
        print(f"KNN 20k x 30k k=3: {nk} rows in {time.time() - t0:.1f}s", flush=True)

    if which in ("knn10x", "all"):
        # 10x the reference's own kNN test scale (testPolygonNN.sh is
        # 20k x 30k): feasible ONLY with the round-9 two-round tile
        # formulation — the pre-round-9 broadcast NLJ would score every
        # padded pair of a 200k x 300k product per expansion round
        a3, b3 = tri_df(200_000, 7, extent=9000.0), tri_df(300_000, 77, extent=9000.0)
        t0 = time.time()
        nk = knn_join(a3, b3, k=3, mode="exact").count()
        print(f"KNN 200k x 300k k=3: {nk} rows in {time.time() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
