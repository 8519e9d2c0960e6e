"""Streaming ingestion into the zonemap (file-skipping) layout.

The write half of a streaming lakehouse table: micro-batches land as
range-clustered parquet files in a ``sources.skipping`` layout, and the
footer min/max manifest is rebuilt after each batch — so the table is
range-queryable with file pruning THE MOMENT a batch commits, while
batch readers see an ordinary parquet directory.

Exactly-once despite foreachBatch's at-least-once contract: each
batch's files are written to a staging directory and MOVED in under
deterministic ``b{batch_id}-`` names; a retried batch first deletes any
files carrying its id, then re-lands them. Replays therefore overwrite
themselves instead of duplicating rows (the same idempotency scheme
Delta's transaction log provides, done here with batch-keyed file
names). File moves go through ``sources.fsio`` (pyarrow.fs) — local
here, the same code over ``s3://``/``hdfs://`` table roots, same
protocol.

Appends accumulate value-range overlap exactly like
``append_range_sorted`` — pass ``compact_every`` to fold the crash-safe
small-file compaction (``skipping.compact_range_sorted``) into the
ingest loop every N batches, or re-cluster with ``save_range_sorted``
for a full rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.sources.skipping import (
    _load_manifest,
    _settle_compaction,
    _stats_friendly_writer,
    _update_manifest,
    _write_manifest,
)

__all__ = [
    "ingest_batch_sorted",
    "streaming_ingest_sorted",
    "ingest_batch_merge",
    "streaming_ingest_merge",
]


def ingest_batch_sorted(df: DataFrame, batch_id: int, path: str,
                        order_col: str, *, n_files: int = 4) -> None:
    """Land one micro-batch into the layout at ``path`` (idempotent per
    ``batch_id``). Usable directly as a foreachBatch body via
    functools.partial, or through :func:`streaming_ingest_sorted`.

    An EXISTING layout's manifest is honored, not replaced: its column
    coverage (incl. any ``stat_cols``) carries forward, the footer
    reads touch only this batch's files (O(batch), not O(table)), and
    a layout clustered on a different column refuses — the same
    guards as ``append_range_sorted``."""
    spark = df.sparkSession
    cols = [order_col]
    existing = _fs.is_dir(os.path.join(path, "_hgs_manifest"))
    if existing:
        _settle_compaction(spark, path)  # finish/undo a dangling compaction
        cols = sorted({r.col for r in _load_manifest(spark, path)})
        if order_col not in cols:
            raise ValueError(
                f"manifest under {path!r} covers {cols}, not {order_col!r}")
    staging = f"{path}__stage_{batch_id}"
    with _stats_friendly_writer(spark):
        (df.repartitionByRange(n_files, F.col(order_col))
           .sortWithinPartitions(order_col)
           .write.mode("overwrite").parquet(staging))
    # empty-batch check from the STAGED footers (driver-side, no job):
    # the old df.isEmpty() pre-check cost one Spark job on EVERY batch
    # to save a tiny write job on the rare empty one — footer row
    # counts answer it for free after the write, and an empty stage is
    # simply discarded before the table is touched
    staged_rows = sum(
        _fs.read_metadata(os.path.join(staging, n)).num_rows
        for n in _fs.listdir(staging)
        if n.endswith(".parquet") and not n.startswith(("_", ".")))
    if staged_rows == 0:
        _fs.rmtree(staging)
        return
    _fs.makedirs(path)
    prefix = f"b{batch_id}-"
    for name in _fs.listdir(path):
        if name.startswith(prefix):
            _fs.remove(os.path.join(path, name))  # replayed batch: self-overwrite
    landed = set()
    for name in sorted(_fs.listdir(staging)):
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            _fs.rename(os.path.join(staging, name),
                       os.path.join(path, prefix + name))
            landed.add(prefix + name)
    _fs.rmtree(staging)
    if existing:
        _update_manifest(spark, path, cols, landed)
    else:
        _write_manifest(spark, path, cols)


def streaming_ingest_sorted(stream: DataFrame, path: str, order_col: str,
                            *, n_files: int = 4, checkpoint: str,
                            trigger: dict | None = None,
                            compact_every: int | None = None,
                            compact_small_bytes: int = 32 * 1024 * 1024,
                            compact_n_files: int = 1,
                            bloom_cols: tuple[str, ...] = (),
                            bloom_n_items: int = 100_000,
                            agg_cols: tuple[str, ...] = ()):
    """Start the ingestion query: every micro-batch of ``stream`` lands
    range-clustered under ``path`` with the manifest refreshed. With
    ``compact_every=N``, every Nth batch additionally folds the
    accumulated small files into ``compact_n_files`` freshly-sorted ones
    (crash-safe commit record; a retried batch re-settles first), so a
    long-running ingest keeps a bounded file count without ever pausing
    the stream for a full rewrite. With ``bloom_cols``, the per-file
    bloom index over those point-lookup keys is extended incrementally
    after each batch — O(batch) work, since ``build_bloom_index`` reads
    only files that lack index rows (fresh batch files, and compaction
    outputs right after a fold) — so equality probes via
    ``sources.bloom.read_eq`` stay sharp for the whole table while the
    stream runs. A replayed batch's re-landed files get fresh rows (the
    old files vanished, so their rows drop out on the same rebuild).
    ``agg_cols`` does the same for the per-file sum manifest (integer
    columns; ``sources.skipping.sum_range``) — metadata-mostly SUM/AVG
    keeps up with the stream at O(batch) per refresh.
    Returns the running StreamingQuery."""
    from hadoopgis_spark.sources.bloom import build_bloom_index
    from hadoopgis_spark.sources.skipping import (build_agg_index,
                                                  compact_range_sorted)

    def _body(df: DataFrame, bid: int) -> None:
        ingest_batch_sorted(df, bid, path, order_col, n_files=n_files)
        if compact_every and (bid + 1) % compact_every == 0:
            compact_range_sorted(df.sparkSession, path, order_col,
                                 small_bytes=compact_small_bytes,
                                 n_files=compact_n_files)
        if bloom_cols:
            build_bloom_index(df.sparkSession, path, list(bloom_cols),
                              n_items=bloom_n_items)
        if agg_cols:
            build_agg_index(df.sparkSession, path, list(agg_cols))

    writer = stream.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def ingest_batch_merge(df: DataFrame, batch_id: int, path: str,
                       key_col: str, *, n_files: int | None = None) -> None:
    """CDC-style UPSERT of one micro-batch keyed on ``key_col``: the
    first batch creates the clustered layout
    (``skipping.save_range_sorted``); every later batch merges through
    ``skipping.merge_range`` — delete-then-insert per key, priced by
    the zonemap (only key-containing files rewritten, under the
    crash-safe commit record).

    NATURALLY idempotent under foreachBatch's at-least-once contract:
    re-merging a replayed batch deletes exactly the rows its previous
    attempt inserted and re-inserts them — same final state, NO
    batch-id bookkeeping (the append path needs its ``b{id}-`` file
    naming; the merge path's semantics make replay a no-op by
    construction). ``batch_id`` is accepted for the foreachBatch
    signature and ignored. Single-writer per table, like every
    maintenance op in the skipping module. Batch keys must be non-null
    (merge_range refuses) — CDC keys are primary keys."""
    spark = df.sparkSession
    from hadoopgis_spark.sources.skipping import (merge_range,
                                                  save_range_sorted)
    if _fs.is_dir(os.path.join(path, "_hgs_manifest")):
        # no isEmpty pre-check on the merge path: merge_range's own
        # bounds aggregate detects an empty batch and no-ops, so the
        # pre-check was a pure extra Spark job per micro-batch
        merge_range(spark, path, df, key_col, n_files=n_files)
    else:
        if df.isEmpty():  # an empty FIRST batch must not create a layout
            return
        # a crash between the first batch's data write and its manifest
        # write leaves a manifest-less directory; the retry lands here
        # again and save's overwrite mode clears it — exactly-once
        save_range_sorted(df, path, key_col, n_files=n_files or 4)


def streaming_ingest_merge(stream: DataFrame, path: str, key_col: str,
                           *, checkpoint: str,
                           n_files: int | None = None,
                           trigger: dict | None = None,
                           compact_every: int | None = None,
                           compact_small_bytes: int = 32 * 1024 * 1024,
                           compact_n_files: int = 1,
                           bloom_cols: tuple[str, ...] = (),
                           bloom_n_items: int = 100_000,
                           agg_cols: tuple[str, ...] = ()):
    """Start a CDC upsert query: every micro-batch of ``stream`` is
    MERGED by ``key_col`` into the layout at ``path`` (last writer
    wins per key — the streaming face of ``merge_range``, the way
    ``streaming_ingest_sorted`` is the streaming face of append).
    ``compact_every``/``bloom_cols``/``agg_cols`` fold the same
    maintenance hooks into the loop as the append ingest: merge keeps
    rewritten files clustered, pure-insert batches accrete files that
    compaction folds, and the bloom/sum manifests stay O(batch) fresh
    (rewritten files lost their index rows with the old files; the
    incremental builders re-cover them). Returns the running
    StreamingQuery."""
    from hadoopgis_spark.sources.bloom import build_bloom_index
    from hadoopgis_spark.sources.skipping import (build_agg_index,
                                                  compact_range_sorted)

    def _body(df: DataFrame, bid: int) -> None:
        ingest_batch_merge(df, bid, path, key_col, n_files=n_files)
        if compact_every and (bid + 1) % compact_every == 0:
            compact_range_sorted(df.sparkSession, path, key_col,
                                 small_bytes=compact_small_bytes,
                                 n_files=compact_n_files)
        if bloom_cols:
            build_bloom_index(df.sparkSession, path, list(bloom_cols),
                              n_items=bloom_n_items)
        if agg_cols:
            build_agg_index(df.sparkSession, path, list(agg_cols))

    writer = stream.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
