#!/usr/bin/env python
"""MERGE/upsert scale A/B — the round-10 evidence for ``merge_range``.

One workload over a 20M-row key-clustered table (16 files) on local
disk: upsert a 200k-row correction batch whose keys live in a 1%-wide
key band PLUS 10k brand-new keys at the domain tail (the bimodal shape
that defeats envelope-only pricing). Reports which files were
rewritten vs untouched, the wall clock, and exactness: the merged
table equals the delete-then-insert reference computed with plain
DataFrame ops.

The comparison row is the naive alternative — rewriting the WHOLE
table through ``save_range_sorted`` with the merged content — which is
what an engine without zonemap-priced MERGE does at any scale.

Usage: python tools/bench_merge_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = int(os.environ.get("MERGE_AB_ROWS", 20_000_000))
BATCH_UPD = 200_000
BATCH_INS = 10_000


def main() -> None:
    from hadoopgis_spark.session import get_spark
    from hadoopgis_spark.sources import skipping as sk

    spark = get_spark("merge-scale-ab")
    base = f"/tmp/hgs_merge_scale_{spark.sparkContext.applicationId}"
    path = f"{base}/t"
    df = spark.range(0, N_ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 9973).alias("v"))
    t0 = time.time()
    sk.save_range_sorted(df, path, "k", n_files=16)
    t_build = time.time() - t0
    print(f"layout: {N_ROWS:,} rows, 16 files, built in {t_build:.1f}s",
          flush=True)

    lo = N_ROWS // 2
    batch = spark.range(lo, lo + BATCH_UPD).select(
        F.col("id").alias("k"), F.lit(-1).alias("v"))
    inserts = spark.range(N_ROWS + 10, N_ROWS + 10 + BATCH_INS).select(
        F.col("id").alias("k"), F.lit(-2).alias("v"))
    batch = batch.unionByName(inserts)

    t0 = time.time()
    stats = sk.merge_range(spark, path, batch, "k", n_files=2)
    t_merge = time.time() - t0
    print(f"merge_range: {stats} in {t_merge:.1f}s", flush=True)

    # exactness vs the delete-then-insert reference
    got = (sk.read_range(spark, path, "k")
           .agg(F.count(F.lit(1)), F.sum("k"), F.sum("v")).collect()[0])
    ref = (df.join(batch.select("k"), "k", "left_anti").unionByName(batch)
           .agg(F.count(F.lit(1)), F.sum("k"), F.sum("v")).collect()[0])
    ok = tuple(got) == tuple(ref)
    print(f"exact: {ok} (rows={got[0]:,})", flush=True)
    if not ok:
        raise SystemExit(f"MISMATCH: {tuple(got)} vs {tuple(ref)}")

    # the naive alternative: full-table rewrite with the merged content
    naive = f"{base}/naive"
    merged = df.join(batch.select("k"), "k", "left_anti").unionByName(batch)
    t0 = time.time()
    sk.save_range_sorted(merged, naive, "k", n_files=16)
    t_naive = time.time() - t0
    print(f"naive full rewrite: {t_naive:.1f}s  "
          f"(merge_range was {t_naive / max(t_merge, 1e-9):.1f}x faster)",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
