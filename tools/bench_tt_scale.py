#!/usr/bin/env python
"""Time-travel scale A/B — the round-10 evidence for snapshot reads.

One workload over a key-clustered table (16 files, 20M rows by
default) on local disk:

1. versioned vs unversioned DELETE of a 25% retention band — the
   versioning overhead is file RENAMES instead of deletes plus one
   small JSON snapshot, so the delta should be noise;
2. ``read_version(1)`` reproduces the pre-delete table exactly (count
   + two checksums) — the snapshot replays from active + retired files;
3. pruned historical read: ``read_version(1, where=...)`` over a
   band that now lives ONLY in retired files opens a bounded subset of
   the snapshot's files (reported), exact against the reference;
4. ``vacuum_versions`` reclaims history and reports what it deleted.

The naive alternative at any scale is a full table COPY per retained
snapshot; the versioned layout stores each surviving byte once
(retired boundary/interior files + live files), which is what makes
audit reads affordable at 100 TB.

Usage: python tools/bench_tt_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = int(os.environ.get("TT_AB_ROWS", 20_000_000))


def main() -> None:
    from hadoopgis_spark.session import get_spark
    from hadoopgis_spark.sources import skipping as sk

    spark = get_spark("tt-scale-ab")
    base = f"/tmp/hgs_tt_scale_{spark.sparkContext.applicationId}"
    df = spark.range(0, N_ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 9973).alias("v"))
    lo, hi = N_ROWS // 2, N_ROWS // 2 + N_ROWS // 4 - 1

    # unversioned delete (the control)
    p0 = f"{base}/plain"
    sk.save_range_sorted(df, p0, "k", n_files=16)
    t0 = time.time()
    s0 = sk.delete_range(spark, p0, "k", lo, hi)
    t_plain = time.time() - t0
    print(f"unversioned delete: {s0} in {t_plain:.1f}s", flush=True)

    # versioned delete (retirement + snapshot record)
    p1 = f"{base}/versioned"
    sk.save_range_sorted(df, p1, "k", n_files=16)
    sk.enable_time_travel(spark, p1)
    t0 = time.time()
    s1 = sk.delete_range(spark, p1, "k", lo, hi)
    t_vers = time.time() - t0
    print(f"versioned delete:   {s1} in {t_vers:.1f}s "
          f"(overhead {t_vers - t_plain:+.1f}s)", flush=True)

    # snapshot replay exactness
    ref = df.agg(F.count(F.lit(1)), F.sum("k"), F.sum("v")).collect()[0]
    t0 = time.time()
    got = (sk.read_version(spark, p1, 1)
           .agg(F.count(F.lit(1)), F.sum("k"), F.sum("v")).collect()[0])
    t_replay = time.time() - t0
    ok = tuple(got) == tuple(ref)
    print(f"read_version(1) full replay: exact={ok} rows={got[0]:,} "
          f"in {t_replay:.1f}s", flush=True)
    if not ok:
        raise SystemExit(f"MISMATCH: {tuple(got)} vs {tuple(ref)}")

    # pruned historical read over a since-deleted band
    blo, bhi = lo + N_ROWS // 32, lo + N_ROWS // 32 + 99_999
    t0 = time.time()
    hist = sk.read_version(spark, p1, 1, where={"k": (blo, bhi)})
    h = hist.agg(F.count(F.lit(1)), F.sum("k")).collect()[0]
    t_hist = time.time() - t0
    opened = hist.inputFiles()
    import os as _os
    _led = set(sk._retired_ledger(p1))
    n_retired = sum(
        "_hgs_retired" in f or _os.path.basename(f) in _led for f in opened)
    exp_n = bhi - blo + 1
    exp_sum = (blo + bhi) * exp_n // 2
    ok = (h[0], h[1]) == (exp_n, exp_sum)
    print(f"pruned historical read: exact={ok} rows={h[0]:,} opened "
          f"{len(opened)}/16 snapshot files ({n_retired} retired) in "
          f"{t_hist:.1f}s", flush=True)
    if not ok or len(opened) >= 16:
        raise SystemExit(
            f"pruned read wrong/unpruned: {tuple(h)} files={len(opened)}")

    vac = sk.vacuum_versions(spark, p1, keep_last=1, grace_s=0.0)
    print(f"vacuum keep_last=1: {vac}", flush=True)
    cur = (sk.read_range(spark, p1, "k")
           .agg(F.count(F.lit(1))).collect()[0][0])
    print(f"current rows after vacuum: {cur:,}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
