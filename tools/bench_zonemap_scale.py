#!/usr/bin/env python
"""Zonemap-maintenance scale A/Bs — the repeatable form of the round-8
evidence in BASELINE.md ("Compaction A/B", "Z-order vs 1-D A/B").

Two workloads over a 20M-row synthetic table on local disk:

* ``compact``: 16-file range layout + 64 small appended batches, a
  1%-selective range query before/after ``compact_range_sorted``
  (files kept, wall clock, bit-identical results, large files
  untouched).
* ``zorder``: the same rows clustered 1-D vs Z-order on two independent
  dims; a ~3% range query on the NON-primary dimension (the 1-D layout
  keeps every file; Z-order prunes both dims).

Honest-read caveat recorded with the numbers: on warm local SSD,
parquet row-group stats already skip data pages, so wall-clock parity
at these file counts is expected — the manifest's win is the avoided
LISTING + FOOTER round trips, which is the object-store / 100 TB case.

Usage: python tools/bench_zonemap_scale.py [compact|zorder|all]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_ROWS = 20_000_000


def _spark():
    from hadoopgis_spark.session import get_spark
    return get_spark("zonemap-scale-ab")


def bench_compact(spark) -> None:
    from hadoopgis_spark.sources.skipping import (
        append_range_sorted, compact_range_sorted, prune_files, read_range,
        save_range_sorted)

    path = "/tmp/hgs_ab_compact"
    shutil.rmtree(path, ignore_errors=True)
    base = spark.range(0, N_ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v"))
    save_range_sorted(base, path, "k", n_files=16)
    t0 = time.time()
    for b in range(64):
        lo = N_ROWS + b * 50_000
        batch = spark.range(lo, lo + 50_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v"))
        append_range_sorted(batch, path, "k", n_files=1)
    print(f"compact: 64 appends {time.time() - t0:.1f}s")

    qlo, qhi = N_ROWS + 500_000, N_ROWS + 730_000

    def q():
        return read_range(spark, path, "k", qlo, qhi).agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()[0]

    kept, total = prune_files(spark, path, {"k": (qlo, qhi)})
    times = []
    for _ in range(3):
        t0 = time.time(); r = q(); times.append(time.time() - t0)
    print(f"compact: fragmented kept {len(kept)}/{total}, "
          f"query min {min(times):.2f}s, n={r.n}")
    sizes = sorted(os.path.getsize(os.path.join(path, f))
                   for f in os.listdir(path)
                   if f.endswith(".parquet") and not f.startswith(("_", ".")))
    thresh = (sizes[63] + sizes[64]) // 2  # between batch and base files
    t0 = time.time()
    stats = compact_range_sorted(spark, path, "k",
                                 small_bytes=thresh, n_files=4)
    print(f"compact: ran {time.time() - t0:.1f}s {stats}")
    kept, total = prune_files(spark, path, {"k": (qlo, qhi)})
    times = []
    for _ in range(3):
        t0 = time.time(); r2 = q(); times.append(time.time() - t0)
    print(f"compact: compacted kept {len(kept)}/{total}, "
          f"query min {min(times):.2f}s, n={r2.n}")
    assert (r.n, r.s) == (r2.n, r2.s), "compaction parity broken"
    print("compact: parity ok")


def bench_zorder(spark) -> None:
    from hadoopgis_spark.sources.skipping import (
        _write_manifest, prune_files, read_multi, save_range_sorted,
        save_zorder_sorted)

    df = spark.range(0, N_ROWS).select(
        F.col("id").alias("rid"),
        F.xxhash64(F.col("id")).bitwiseAND(F.lit((1 << 24) - 1)).alias("a"),
        F.xxhash64(F.col("id"), F.lit(7)).bitwiseAND(F.lit((1 << 24) - 1)).alias("b"),
    )
    p1, pz = "/tmp/hgs_ab_1d", "/tmp/hgs_ab_zo"
    for p in (p1, pz):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.time(); save_range_sorted(df, p1, "a", n_files=64)
    t_1d = time.time() - t0
    _write_manifest(spark, p1, ["a", "b"])  # give 1-D a fair manifest on b
    t0 = time.time(); save_zorder_sorted(df, pz, ["a", "b"], n_files=64)
    print(f"zorder: layout write 1d {t_1d:.1f}s, zorder {time.time() - t0:.1f}s")
    lo, hi = 8_000_000, 8_500_000  # ~3% of the 24-bit domain
    for tag, p in (("1d-sorted-on-a", p1), ("zorder(a,b)", pz)):
        kept, total = prune_files(spark, p, {"b": (lo, hi)})
        times = []
        for _ in range(3):
            t0 = time.time()
            r = read_multi(spark, p, {"b": (lo, hi)}).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("rid").alias("s")).collect()[0]
            times.append(time.time() - t0)
        kept_a, _ = prune_files(spark, p, {"a": (lo, hi)})
        print(f"zorder: {tag} kept {len(kept)}/{total} on b "
              f"({len(kept_a)}/{total} on a), query min {min(times):.2f}s, "
              f"n={r.n} s={r.s}")


def bench_count(spark) -> None:
    """Metadata-only COUNT vs a full scan-count on a 20M-row layout:
    interior files come from manifest row counts, only the 2 boundary
    files are read."""
    from hadoopgis_spark.sources.skipping import (
        count_range, prune_files, save_range_sorted)

    path = "/tmp/hgs_ab_count"
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(0, N_ROWS).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v"))
    save_range_sorted(df, path, "k", n_files=64)
    lo, hi = 1_000_000, 18_123_456  # ~86%: almost all interior
    kept, total, interior = prune_files(
        spark, path, {"k": (lo, hi)}, classify=True)
    t_meta, t_scan = [], []
    for _ in range(3):
        t0 = time.time()
        n_meta = count_range(spark, path, "k", lo, hi)
        t_meta.append(time.time() - t0)
        t0 = time.time()
        n_scan = (spark.read.parquet(path)
                  .filter((F.col("k") >= lo) & (F.col("k") <= hi)).count())
        t_scan.append(time.time() - t0)
    assert n_meta == n_scan == hi - lo + 1
    print(f"count: interior {len(interior)}/{len(kept)} kept files "
          f"({sum(interior.values())} of {n_meta} rows from metadata), "
          f"count_range min {min(t_meta):.2f}s vs scan-count min "
          f"{min(t_scan):.2f}s, exact")


def bench_sum(spark) -> None:
    """Metadata-mostly SUM vs a full scan-sum on a 20M-row layout with
    a per-file exact-integer sum manifest: interior files contribute
    stored sums (python-int merge), only the 2 boundary files are read."""
    import shutil as _sh
    from hadoopgis_spark.sources.skipping import (
        prune_files, save_range_sorted, sum_range)

    path = "/tmp/hgs_ab_sum"
    _sh.rmtree(path, ignore_errors=True)
    df = spark.range(0, N_ROWS).select(
        F.col("id").alias("k"), ((F.col("id") % 9973) * 100).alias("v_c"))
    t0 = time.time()
    save_range_sorted(df, path, "k", n_files=64, agg_cols=["v_c"])
    print(f"sum: layout+agg-manifest write {time.time() - t0:.1f}s")
    lo, hi = 1_000_000, 18_123_456  # ~86%: almost all interior
    kept, total, interior = prune_files(
        spark, path, {"k": (lo, hi)}, classify=True)
    t_meta, t_scan = [], []
    for _ in range(3):
        t0 = time.time()
        s_meta, n_meta = sum_range(spark, path, "v_c", {"k": (lo, hi)})
        t_meta.append(time.time() - t0)
        t0 = time.time()
        row = (spark.read.parquet(path)
               .filter((F.col("k") >= lo) & (F.col("k") <= hi))
               .agg(F.sum(F.col("v_c").cast("decimal(38,0)")).alias("s"),
                    F.count("v_c").alias("n")).collect()[0])
        t_scan.append(time.time() - t0)
    assert (s_meta, n_meta) == (int(row["s"]), int(row["n"]))
    expect = sum((k % 9973) * 100 for k in range(lo, hi + 1))
    assert s_meta == expect, "exactness vs python oracle"
    print(f"sum: interior {len(interior)}/{len(kept)} kept files, "
          f"sum_range min {min(t_meta):.2f}s vs scan-sum min "
          f"{min(t_scan):.2f}s, exact ({s_meta})")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if which in ("compact", "all"):
        bench_compact(spark)
    if which in ("zorder", "all"):
        bench_zorder(spark)
    if which in ("count", "all"):
        bench_count(spark)
    if which in ("sum", "all"):
        bench_sum(spark)
    spark.stop()


if __name__ == "__main__":
    main()
