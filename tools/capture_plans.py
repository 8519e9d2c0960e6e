#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<dir>.

Usage: python tools/capture_plans.py --out plans/r13 --suffix before q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    out, suffix = "plans/r13", "before"
    if "--out" in args:
        i = args.index("--out"); out = args[i + 1]; del args[i:i + 2]
    if "--suffix" in args:
        i = args.index("--suffix"); suffix = args[i + 1]; del args[i:i + 2]
    os.makedirs(out, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoopgis_spark.session import get_spark
    import hadoopgis_spark.workload as wl

    spark = get_spark("hgs-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in args:
        q = wl.REGISTRY[name]
        df = q.fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        p = os.path.join(out, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(txt)
        print(f"wrote {p} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
