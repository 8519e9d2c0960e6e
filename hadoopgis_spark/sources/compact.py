"""Small-files compaction — the operational fix for fragmented layouts.

Streaming sinks, per-tile writers, and incremental ingestion all
accrete small files; at cluster scale a 100k-file directory costs more
in scheduler/listing/footer overhead than in actual I/O. ``compact``
rewrites a parquet directory to approximately ``target_bytes`` files
while preserving (or re-deriving) a partition column layout.

Sizing uses the CURRENT on-disk bytes (cheap listing, no data read) —
compression ratios carry over when rewriting like-for-like parquet, so
output files land near the target without a pre-pass over the data.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from hadoopgis_spark.sources import fsio as _fs

__all__ = ["compact", "dir_stats"]


def dir_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the data files under ``path`` — ONE
    recursive listing call through the fsio facade (one LIST round trip
    on an object store, not a per-file stat walk)."""
    n = total = 0
    for name, size, _, isdir in _fs.listdir_stat(path, recursive=True):
        if isdir or name.startswith(("_", ".")):
            continue
        n += 1
        total += size or 0
    return n, total


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: str | None = None,
) -> dict:
    """Rewrite the parquet directory ``src`` into ``dst`` with files
    sized around ``target_bytes``.

    * Unpartitioned: one ``repartition(ceil(bytes/target))`` — a single
      round-robin shuffle, every output file near-equal.
    * ``partition_by``: files are rebalanced WITHIN each partition value
      by repartitioning on (partition, uniform salt) so a hot partition
      still splits into multiple target-sized files while small
      partitions collapse to one — no global sort, one shuffle.

    Refuses ``dst == src`` (an in-place overwrite that dies mid-write
    loses data; write aside and swap atomically at the catalog layer).
    Returns ``{"files_before", "bytes", "files_after"}``.
    """
    if os.path.abspath(dst) == os.path.abspath(src):
        raise ValueError("compact refuses in-place rewrite: write aside, then swap")
    n_before, total = dir_stats(src)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    if partition_by is None:
        df.repartition(n_out).write.mode("overwrite").parquet(dst)
    else:
        from pyspark.sql import functions as F

        # per-partition rebalance: salt width ~ files per partition value
        n_parts = max(1, df.select(partition_by).distinct().count())
        salt_w = max(1, math.ceil(n_out / n_parts))
        salted = df.withColumn(
            "__salt", (F.monotonically_increasing_id() % salt_w).cast("int")
        )
        (
            salted.repartition(max(n_out, n_parts), F.col(partition_by), F.col("__salt"))
            .drop("__salt")
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(dst)
        )
    n_after, _ = dir_stats(dst)
    return {"files_before": n_before, "bytes": total, "files_after": n_after}
