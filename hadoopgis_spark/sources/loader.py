"""Partitioned data loading (§3.2) — the reference's ``-q partition``.

Reference pipeline (``/root/reference/src/framework/query_partition.hpp:77-293``):
MBB extract → partition → multicast assignment → one text file per tile
(``CustomMultiOutputFormat``) + ``partition.idx`` + ``info.cfg``.

Spark restatement with a deliberate improvement for scale: each object
is stored **once**, in the tile owning its MBB reference point
(xmin,ymin), via ``write.partitionBy('tile_id')`` parquet. Boundary
correctness at query time comes from padding the window by the global
maximum object extent (stored in the metadata), instead of replicating
boundary objects into every tile file like the reference does — 100 TB
of data is written once, not ×replication-factor, and containment
queries stay exact:

    object intersects window  ⟹  its refpoint tile intersects
    window expanded by (max_w, max_h)   (since the object's box extends
    at most max_w/max_h beyond its refpoint).

Metadata (the ``info.cfg``/``partition.idx`` analogue,
``query_partition.hpp:270-288``) is JSON + the tile table itself stored
as parquet under ``<path>/_hgs_meta``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.operators.containment import parse_window
from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.operators.mbb import (MBB_COLS, extent_count_sample,
                                           with_mbb)
from hadoopgis_spark.operators.spatial_join import default_bucket_size
from hadoopgis_spark.operators.tile import tiles_dataframe
from hadoopgis_spark.partition import partition_tiles

__all__ = ["save_partitioned", "load_partitioned"]


def save_partitioned(
    df: DataFrame,
    path: str,
    *,
    geom_col: str = "geom",
    partitioner: str = "bsp",
    bucket_size: int | None = None,
    max_sample: int = 200_000,
    overwrite: bool = True,
    store_wkb: bool = False,
) -> dict:
    """Spatially partition and persist a dataset. Returns the metadata.

    ``overwrite=False`` memoizes: if the artifact already exists its
    metadata is returned and nothing is recomputed — the reference's
    stage-skip guard (S8, ``hdfs_check_data``,
    ``query_spjoin.hpp:107,162``).

    ``store_wkb=True`` persists the geometry column as WKB ``binary``
    instead of WKT text (~2-4× smaller at rest, no float formatting/
    parsing round-trip); every reader — ``load_partitioned``,
    ``containment``, the ``st_`` predicate surface — accepts WKB and
    WKT interchangeably, so queries are unchanged.
    """
    if not overwrite and _fs.exists(f"{path}/_hgs_meta/info.json"):
        return json.loads(_fs.read_bytes(f"{path}/_hgs_meta/info.json"))
    spark = df.sparkSession
    wkt_mode = geom_col in df.columns
    df = with_mbb(df, geom_col) if wkt_mode else df
    if store_wkb:
        if not wkt_mode:
            raise ValueError("store_wkb=True needs a geometry column")
        from hadoopgis_spark.functions.spatial import st_as_wkb

        df = df.withColumn(geom_col, st_as_wkb(F.col(geom_col)))
    # extent + count + max spans + the partitioner sample in ONE pass
    # when the footer row bound proves the input fits the sample budget
    # (extent_count_sample); exact aggregate + Bernoulli sample otherwise
    ext, sample = extent_count_sample(
        df.select(*MBB_COLS), max_sample, spans=True)
    n = int(ext[4])
    if n == 0:
        raise ValueError("cannot save an empty dataset")
    x0, y0, x1, y1 = float(ext[0]), float(ext[1]), float(ext[2]), float(ext[3])
    max_w, max_h = float(ext[5]), float(ext[6])
    bucket = bucket_size or default_bucket_size(n, spark)
    scaled = max(1, int(bucket * min(1.0, max_sample / n)))
    tiles = partition_tiles(sample, scaled, partitioner, cover_plane=True)
    tiles_df = tiles_dataframe(spark, tiles)

    # refpoint (xmin,ymin) owns the object → exactly one tile per object;
    # half-open ownership test matches the join's refpoint dedup
    owned = df.join(
        F.broadcast(tiles_df),
        (F.col("xmin") >= F.col("t_xmin"))
        & (F.col("xmin") < F.col("t_xmax"))
        & (F.col("ymin") >= F.col("t_ymin"))
        & (F.col("ymin") < F.col("t_ymax")),
        "inner",
    ).drop("t_xmin", "t_ymin", "t_xmax", "t_ymax")

    # co-locate each tile's rows before the write: one parquet file per
    # tile directory instead of (writer tasks × tiles) shards — the
    # at-scale small-files fix, and the write shuffle is bounded by
    # bucket_size per task
    owned.repartition("tile_id").write.partitionBy("tile_id").mode("overwrite").parquet(path)
    meta = {
        "extent": [x0, y0, x1, y1],
        "count": n,
        "partitioner": partitioner,
        "bucket_size": bucket,
        "geom_col": geom_col if wkt_mode else None,
        "geom_format": "wkb" if store_wkb else ("wkt" if wkt_mode else None),
        "max_obj_w": max_w,
        "max_obj_h": max_h,
        "n_tiles": len(tiles),
    }
    _write_tiles_table(f"{path}/_hgs_meta/tiles", tiles)
    # write info JSON through the JVM-free driver-side path (fsio —
    # local or object store alike)
    _fs.makedirs(f"{path}/_hgs_meta")
    _fs.write_bytes_atomic(f"{path}/_hgs_meta/info.json",
                           json.dumps(meta).encode())
    return meta


def _write_tiles_table(tdir: str, tiles) -> None:
    """Land the KB-sized tile table DRIVER-side (pyarrow) — the rows
    are a driver list already (``partition_tiles`` output), so the old
    Spark write paid one fixed-latency job per save for kilobytes.
    Same directory layout as the old Spark write: pyarrow and Spark
    readers both accept it."""
    import pyarrow as pa

    sch = pa.schema([
        ("tile_id", pa.string()), ("t_xmin", pa.float64()),
        ("t_ymin", pa.float64()), ("t_xmax", pa.float64()),
        ("t_ymax", pa.float64()),
    ])
    t = pa.Table.from_pylist(
        [{"tile_id": tt[0], "t_xmin": float(tt[1]), "t_ymin": float(tt[2]),
          "t_xmax": float(tt[3]), "t_ymax": float(tt[4])} for tt in tiles],
        schema=sch)
    if _fs.is_dir(tdir):  # overwrite semantics of the old Spark write
        _fs.rmtree(tdir)
    _fs.makedirs(tdir)
    _fs.write_table_atomic(f"{tdir}/part-00000.parquet", t)


def _read_tiles_table(tdir: str):
    """Tile rows [(tile_id, x0, y0, x1, y1), ...] — driver-side pyarrow
    read (kilobytes; reads Spark-written pre-round-13 dirs and pyarrow
    dirs alike). Window pruning over this list is pure Python: a tile
    probe must cost microseconds, not a Spark job."""
    parts = [f"{tdir}/{n}" for n in _fs.listdir(tdir)
             if n.endswith(".parquet") and not n.startswith(("_", "."))]
    d = _fs.read_table(parts).to_pydict()
    return list(zip(d["tile_id"], d["t_xmin"], d["t_ymin"],
                    d["t_xmax"], d["t_ymax"]))


def load_partitioned(
    spark: SparkSession,
    path: str,
    window: str | None = None,
    predicate: str = "st_intersects",
) -> DataFrame:
    """Read a spatially-partitioned dataset; with ``window``, prune tiles
    on the partition column (directory-level skip — the reference's
    ``partition.idx`` pruning, ``query_containment.hpp:124-138``) plus the
    row-level MBB filter, then exact refine where needed."""
    meta = json.loads(_fs.read_bytes(f"{path}/_hgs_meta/info.json"))
    df = spark.read.parquet(path)
    df = df.filter(~F.col("tile_id").isNull())  # excludes _hgs_meta rows if any
    if window is None:
        return df
    _, (wx0, wy0, wx1, wy1) = parse_window(window)
    pw = (wx0 - meta["max_obj_w"], wy0 - meta["max_obj_h"], wx1, wy1)
    # driver-side tile prune (same closed-box test as boxes.
    # box_intersects): the tile table is KBs and already bounded by the
    # partitioner sample, so probing it through a Spark job charged a
    # fixed-latency round trip per windowed read
    keep = [
        tid
        for tid, tx0, ty0, tx1, ty1 in _read_tiles_table(f"{path}/_hgs_meta/tiles")
        if tx0 <= pw[2] and pw[0] <= tx1 and ty0 <= pw[3] and pw[1] <= ty1
    ]
    pruned = df.filter(F.col("tile_id").isin(keep))
    from hadoopgis_spark.operators.containment import containment

    return containment(
        pruned, window, predicate,
        geom_col=meta["geom_col"] or "geom",
    )
