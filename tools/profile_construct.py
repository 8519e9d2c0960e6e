#!/usr/bin/env python
"""cProfile the CONSTRUCTION of named registry queries (queries()[q]
built twice; the second, warm build is profiled) and print the top
cumulative-time call sites — splits py4j chatter from driver actions.

Usage: python tools/profile_construct.py <query> [top_n]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoopgis_spark.session import get_spark
    import hadoopgis_spark.workload as wl

    spark = get_spark("hgs-profile-construct")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    q = wl.REGISTRY[name]
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # cold

    prof = cProfile.Profile()
    prof.enable()
    q.fn(spark, sf_dir)
    prof.disable()
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(top_n)


if __name__ == "__main__":
    main()
