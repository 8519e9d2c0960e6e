"""Persistent minhash-band dedup index: dedup NEW data against an
EXISTING corpus without rescanning it.

The production near-dup shape is incremental — "is this crawl batch a
near-duplicate of anything already ingested?" — not a full-corpus
self-join per batch. ``save_dedup_index`` writes the corpus's banded
minhash keys once (aggregated to one row per (band_idx, key) with the
owning min-id and the bucket population); ``dedup_against_index`` then
flags an incoming batch by a semi join of its bands against the stored
keys. The corpus text never moves again: the index holds
``n_bands`` keys per document, orders of magnitude smaller than the
corpus, and the probe is keyed on (band_idx, key) so it
shuffle-partitions (or broadcasts, when the index is small) cleanly.

Same band construction as ``streaming.neardedup`` / the LSH pipeline
(shingle → md5 family → linear minhash → bands), so an index built by
any face matches keys produced by any other.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.sources import lease as _lease
from pyspark.sql import functions as F

from hadoopgis_spark.materialize import durable_checkpoint
from hadoopgis_spark.streaming.neardedup import minhash_band_rows

__all__ = ["save_dedup_index", "dedup_against_index"]


def _dedup_root(spark: SparkSession) -> str:
    configured = spark.conf.get("hgs.indexRoot", None)
    return configured or f"/tmp/hgs_ivf_{spark.sparkContext.applicationId}"


def _dedup_mutator(op: str):
    """Single-writer lease on the dedup-index base dir (sources.lease)."""
    import functools
    import inspect

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            b = sig.bind(*args, **kwargs)
            b.apply_defaults()
            arg = b.arguments
            spark = arg["df"].sparkSession
            base = f"{arg.get('root') or _dedup_root(spark)}/{arg['name']}"
            with _lease.writer_lease(base, op=op):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@_dedup_mutator('save')
def save_dedup_index(
    df: DataFrame,
    name: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_n: int = 2,
    root: str | None = None,
    bands: DataFrame | None = None,
) -> None:
    """Write ``{root}/{name}/bands``: one row per distinct (band_idx,
    key) with ``owner`` (min id — the canonical original a later dup can
    be attributed to) and ``n_docs`` (bucket population, the skew /
    collision diagnostic). Partitioned by band_idx so each band is an
    independently scannable sub-index.

    Pass a precomputed ``bands`` frame ((id, band_idx, key), e.g. the
    one the LSH self-dedup pipeline already materialized) to reuse it —
    a corpus's band keys are computed once and serve self-dedup,
    streaming suppression and this index alike; the parameters must
    then match what the frame was built with."""
    spark = df.sparkSession
    base = f"{root or _dedup_root(spark)}/{name}"
    if bands is None:
        bands = minhash_band_rows(df, text_col, id_col, n_hashes, n_bands, shingle_n)
    agg = bands.groupBy("band_idx", "key").agg(
        F.min("id").alias("owner"), F.count(F.lit(1)).alias("n_docs")
    )
    # cluster output by the partition column: one writer task per band
    # instead of every reducer emitting a sliver into every band dir
    agg.repartition("band_idx").write.mode("overwrite").partitionBy(
        "band_idx"
    ).parquet(f"{base}/bands")
    # band parameters are a dozen bytes of driver-known JSON — land
    # them driver-side (the old one-row coalesce(1) Spark write paid a
    # fixed job-latency round trip per index build)
    _fs.write_bytes_atomic(
        f"{base}/meta.json",
        json.dumps(
            {"n_hashes": n_hashes, "n_bands": n_bands, "shingle_n": shingle_n}
        ).encode())


def _load_meta(spark: SparkSession, base: str) -> dict:
    """Band parameters: driver-side ``meta.json`` (round 13), falling
    back to the pre-round-13 one-row Spark-parquet ``meta`` dir so an
    index persisted by older code keeps probing."""
    if _fs.exists(f"{base}/meta.json"):
        return json.loads(_fs.read_bytes(f"{base}/meta.json"))
    return json.loads(spark.read.parquet(f"{base}/meta").collect()[0].meta)


def dedup_against_index(
    new_df: DataFrame,
    name: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    root: str | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """(id, is_dup) for every bandable document of ``new_df``: is_dup
    iff ANY of its band keys exists in the stored corpus index — the
    same any-band-collision rule as streaming suppression. Band
    parameters come from the index's meta, so probe keys are built with
    the exact construction the index was written with (or pass a
    precomputed ``bands`` frame built with matching parameters)."""
    spark = new_df.sparkSession
    base = f"{root or _dedup_root(spark)}/{name}"
    idx = spark.read.parquet(f"{base}/bands").select("band_idx", "key")
    if bands is None:
        meta = _load_meta(spark, base)
        bands = minhash_band_rows(
            new_df, text_col, id_col,
            meta["n_hashes"], meta["n_bands"], meta["shingle_n"],
        )
    bands = durable_checkpoint(bands)
    hits = (
        bands.join(idx, ["band_idx", "key"], "left_semi")
        .select("id").distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        bands.select("id").distinct()
        .join(hits, "id", "left")
        .select("id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
    )
