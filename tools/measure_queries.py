#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds.

For each named query (default: all of REGISTRY) this runs the query
through the noop sink (guide §1.4) inside its own Spark job group and
reports:

  wall      — seconds for the noop materialization (build excluded,
              reported separately: the memoized one-time builds run
              under their own span, exactly like bench.py's split)
  jobs      — number of Spark jobs the query launched (statusTracker
              per job group): at gate scale (~17 MB of parquet) wall is
              dominated by fixed per-job latency, so job count is the
              structural metric to shrink
  build     — seconds spent inside memoized one-time builds this query
              triggered (first-run only)

Usage: python tools/measure_queries.py [--repeat N] [query ...]
Output: one JSON line per query to stdout (grep '^{').
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i:i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoopgis_spark.session import get_spark
    import hadoopgis_spark.workload as wl

    spark = get_spark("hgs-measure")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    names = args or list(wl.REGISTRY)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        q = wl.REGISTRY[name]
        for it in range(repeat):
            group = f"measure:{name}:{it}"
            sc.setJobGroup(group, name)
            b0 = wl._MEMO_BUILD_SECONDS
            t0 = time.time()
            try:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                err = None
            except Exception as e:  # noqa: BLE001
                wall = time.time() - t0
                err = f"{type(e).__name__}: {e}"[:200]
            build = wl._MEMO_BUILD_SECONDS - b0
            jobs = len(tracker.getJobIdsForGroup(group))
            print(json.dumps({
                "q": name, "it": it, "wall": round(wall, 3),
                "build": round(build, 3), "jobs": jobs, "err": err,
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
