#!/usr/bin/env python
"""Enumerate every Spark job a query launches, with call-site names.

Runs each named query through the noop sink inside its own job group,
then reads the driver UI's REST API (/api/v1) to list the jobs that ran
in that group with their name (call site), stage count, and task count.
Pure diagnosis — used in the optimization rounds to attribute fixed
per-job latency to the exact driver action that launched it.

Usage: python tools/profile_jobs.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoopgis_spark.session import get_spark
    import hadoopgis_spark.workload as wl

    spark = get_spark("hgs-profile", **{"spark.ui.enabled": "true"})
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def jobs_for_group(group: str):
        url = f"{ui}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url) as r:
            alljobs = json.load(r)
        return [j for j in alljobs if j.get("jobGroup") == group]

    for name in names:
        q = wl.REGISTRY[name]
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        js = sorted(jobs_for_group(group), key=lambda j: j["jobId"])
        print(f"=== {name}: {wall:.2f}s, {len(js)} jobs")
        for j in js:
            dur = ""
            try:
                from datetime import datetime
                st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                ct = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(ct - st).total_seconds():6.2f}s"
            except Exception:
                dur = "     ?"
            print(f"  job {j['jobId']:4d} {dur} tasks={j.get('numTasks', '?'):4} "
                  f"{j.get('name', '')[:110]}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
