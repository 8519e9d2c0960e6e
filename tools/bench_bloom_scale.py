#!/usr/bin/env python
"""Bloom-index scale A/B — the repeatable form of the round-8 bloom
evidence in BASELINE.md.

A 20M-row table clustered on ``ts`` across 64 files whose ``id`` column
is a permutation (every file's id min/max spans the whole domain — the
zonemap-can't-help case). Measures:

* bloom build cost (one distributed Arrow pass, OR-merged bitsets);
* point-lookup pruning with vs without the index (files kept, wall
  clock, identical results);
* measured false-positive sharpness over 200 random absent keys.

Honest-read caveat (same as the zonemap A/Bs): on warm local SSD the
no-index scan still benefits from row-group stats? No — ids scatter, so
row-group min/max don't prune either; the no-bloom path reads all 64
files. The bloom win here is real locally AND is the listing/footer
round-trip win on an object store.

Usage: python tools/bench_bloom_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = 20_000_000
N_FILES = 64
MULT = 99_999_989  # coprime with N_ROWS → id = (row * MULT) % N_ROWS is a permutation


def main() -> None:
    from hadoopgis_spark.session import get_spark
    from hadoopgis_spark.sources.bloom import (
        build_bloom_index, prune_files_eq, read_eq)

    spark = get_spark("bloom-scale-ab")
    path = "/tmp/hgs_ab_bloom"
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(N_ROWS).select(
        F.col("id").alias("ts"),
        ((F.col("id") * MULT) % N_ROWS).alias("id"),
        (F.col("id") % 97).alias("v"),
    )
    t0 = time.time()
    (df.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts")
       .write.mode("overwrite").parquet(path))
    print(f"bloom: layout write {time.time() - t0:.1f}s "
          f"({N_ROWS} rows, {N_FILES} files)")

    t0 = time.time()
    info = build_bloom_index(spark, path, ["id"],
                             n_items=N_ROWS // N_FILES, fpp=0.01)
    idx_bytes = sum(
        os.path.getsize(os.path.join(path, "_hgs_bloom", f))
        for f in os.listdir(os.path.join(path, "_hgs_bloom")))
    print(f"bloom: build {time.time() - t0:.1f}s {info}, "
          f"index {idx_bytes / 1e6:.1f} MB "
          f"({idx_bytes / N_ROWS:.2f} B/row)")

    keys = [(k * 7_654_321) % N_ROWS for k in range(1, 11)]

    def run_bloom(k):
        return read_eq(spark, path, {"id": k}).agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()[0]

    def run_scan(k):
        return (spark.read.parquet(path).filter(F.col("id") == k)
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("v").alias("s")).collect()[0])

    kept_counts, t_bloom, t_scan = [], [], []
    for k in keys:
        kept, total = prune_files_eq(spark, path, {"id": k})
        kept_counts.append(len(kept))
        t0 = time.time(); rb = run_bloom(k); t_bloom.append(time.time() - t0)
        t0 = time.time(); rs = run_scan(k); t_scan.append(time.time() - t0)
        # v derives from the pre-permutation row id, so only parity
        # (and the exactly-one-row contract) is asserted
        assert (rb.n, rb.s) == (rs.n, rs.s) and rb.n == 1, (rb, rs, k)
    print(f"bloom: 10 point lookups — kept files "
          f"{min(kept_counts)}-{max(kept_counts)}/{total}, "
          f"query med bloom {sorted(t_bloom)[5]:.2f}s vs "
          f"full-scan {sorted(t_scan)[5]:.2f}s, parity ok")

    absent = [N_ROWS + 1 + i for i in range(200)]
    fp = sum(
        len(prune_files_eq(spark, path, {"id": k})[0]) for k in absent)
    print(f"bloom: absent-key sweep — {fp} files kept over "
          f"{200 * total} tests (measured fpp {fp / (200 * total):.4f} "
          f"vs 0.01 target)")

    # incremental maintenance really is O(batch): append 50k rows, then
    # extend the index — only the new file is read
    batch = spark.range(N_ROWS, N_ROWS + 50_000).select(
        F.col("id").alias("ts"), F.col("id").alias("id"),
        (F.col("id") % 97).alias("v"))
    batch.coalesce(1).write.mode("append").parquet(path)
    t0 = time.time()
    info = build_bloom_index(spark, path, ["id"],
                             n_items=N_ROWS // N_FILES, fpp=0.01)
    t_inc = time.time() - t0
    t0 = time.time()
    noop = build_bloom_index(spark, path, ["id"],
                             n_items=N_ROWS // N_FILES, fpp=0.01)
    print(f"bloom: incremental build after 50k-row append {t_inc:.1f}s "
          f"{info}; repeat call (no-op) {time.time() - t0:.2f}s {noop}")
    assert info["indexed"] == 1 and noop["indexed"] == 0
    kept, total = prune_files_eq(spark, path, {"id": N_ROWS + 7})
    assert 1 <= len(kept) <= 3 and total == 65
    spark.stop()


if __name__ == "__main__":
    main()
