#!/usr/bin/env python
"""Split per-query DataFrame CONSTRUCTION time (driver-side py4j/plan
assembly in ``queries()[q]``) from noop-sink EXECUTION time.

Wave 2 found the ANN family spending 10-38 s in pure construction; this
tool re-checks the rest of the registry for the same class of cost.

Usage: python tools/measure_construct.py [--repeat N] [query ...]
Output: one JSON line per (query, iteration) to stdout (grep '^{').
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = list(sys.argv[1:])
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i:i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoopgis_spark.session import get_spark
    import hadoopgis_spark.workload as wl

    spark = get_spark("hgs-measure-construct")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm

    names = args or list(wl.REGISTRY)
    for name in names:
        q = wl.REGISTRY[name]
        for it in range(repeat):
            b0 = wl._MEMO_BUILD_SECONDS
            t0 = time.time()
            err = None
            try:
                df = q.fn(spark, sf_dir)
                t1 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.time()
            except Exception as e:  # keep sweeping
                err = f"{type(e).__name__}: {e}"[:200]
                t1 = t2 = time.time()
            build = wl._MEMO_BUILD_SECONDS - b0
            print(json.dumps({
                "query": name, "it": it,
                "construct": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "build": round(build, 3),
                "error": err,
            }), flush=True)


if __name__ == "__main__":
    main()
