"""Bucketed spatial storage — zero-shuffle repeated joins (§3.2 at scale).

The reference re-partitions (or re-reads a partitioned copy of) both
inputs on every join job; its loader (``query_partition.hpp:77-293``)
replicates boundary objects into every tile file so the per-tile join
sees complete candidate sets. This module is the Spark-native upgrade of
that idea: assign tiles ONCE at write time (multicast replication,
exactly like the join's runtime assignment), then persist with
``bucketBy(n, "tile_id")`` so the files themselves carry the shuffle
layout. Every later join between two tables bucketed over the SAME tile
table is a plain equi-join on ``tile_id`` that Spark executes with
**zero Exchange** — at 100 TB the write-once shuffle is amortized across
every subsequent join, the classic bucketed-warehouse pattern.

Write amplification equals the tile replication factor (objects crossing
tile boundaries are stored once per touched tile, typically 1.0-1.2×);
pair dedup at query time is the same reference-point filter the runtime
join uses — pure column predicate, no extra shuffle.

``bucketBy`` requires the table catalog (``saveAsTable``); tables live in
the session's warehouse directory, and the fitted tile table rides along
as ``<table>__tiles`` so both join sides provably share one tiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.functions import boxes as B
from hadoopgis_spark.functions.spatial import st_predicate
from hadoopgis_spark.operators.mbb import MBB_COLS, space_extent, with_mbb
from hadoopgis_spark.operators.spatial_join import default_bucket_size
from hadoopgis_spark.operators.tile import assign_tiles, sample_mbbs, tiles_dataframe
from hadoopgis_spark.partition import partition_tiles

__all__ = ["save_bucketed", "spatial_join_bucketed"]

# external-table root: keeps the data path writable and deterministic
# regardless of the session's warehouse directory (a cluster deployment
# would point this at the shared filesystem)
_BUCKET_ROOT = "/tmp/hgs_bucketed"


def save_bucketed(
    df: DataFrame,
    table: str,
    *,
    geom_col: str = "geom",
    tiles_table: str | None = None,
    partitioner: str = "bsp",
    bucket_size: int | None = None,
    n_buckets: int = 32,
    max_sample: int = 200_000,
    overwrite: bool = True,
) -> str:
    """Tile-assign ``df`` and persist it bucketed on ``tile_id``.

    ``tiles_table``: reuse an existing fitted tiling (REQUIRED for the
    second join side — both sides must share one tile table for the
    equi-join to be complete). Returns the tiles table name.
    """
    spark = df.sparkSession
    if not overwrite and spark.catalog.tableExists(table):
        return tiles_table or f"{table}__tiles"
    wkt_mode = geom_col in df.columns
    df = with_mbb(df, geom_col) if wkt_mode else df

    if tiles_table is None:
        x0, y0, x1, y1, n = space_extent(df.select(*MBB_COLS))
        if n == 0:
            raise ValueError("cannot save an empty dataset")
        bucket = bucket_size or default_bucket_size(n, spark)
        sample = sample_mbbs(df.select(*MBB_COLS), n, max_sample)
        scaled = max(1, int(bucket * min(1.0, max_sample / n)))
        tiles = partition_tiles(sample, scaled, partitioner, cover_plane=True)
        tiles_df = tiles_dataframe(spark, tiles)
        tiles_table = f"{table}__tiles"
        (
            tiles_df.write.mode("overwrite")
            .option("path", f"{_BUCKET_ROOT}/{tiles_table}")
            .saveAsTable(tiles_table)
        )
    tiles_df = spark.table(tiles_table)

    # multicast: one stored row per touched tile (the reference loader's
    # boundary replication) — keeps per-tile candidate sets complete, and
    # the tile bounds ride along for the query-time refpoint dedup
    assigned = assign_tiles(df, tiles_df)
    # co-locate rows by the bucket hash before the write: bucketBy makes
    # each task emit one file PER BUCKET it sees (tasks × buckets shards
    # otherwise); with the pre-shuffle each bucket is one task → one file
    (
        assigned.repartition(n_buckets, F.col("tile_id"))
        .write.bucketBy(n_buckets, "tile_id")
        .sortBy("tile_id")
        .mode("overwrite")
        .format("parquet")
        .option("path", f"{_BUCKET_ROOT}/{table}")
        .saveAsTable(table)
    )
    return tiles_table


def spatial_join_bucketed(
    spark: SparkSession,
    table_a: str,
    table_b: str,
    predicate: str = "st_intersects",
    *,
    geom_col: str = "geom",
    distance: float | None = None,
    geography: bool = False,
    suffixes: tuple[str, str] = ("_1", "_2"),
    keep_mbb: bool = False,
) -> DataFrame:
    """Join two co-bucketed tables — no Exchange on either side.

    Both tables MUST have been written by :func:`save_bucketed` over the
    same tiles table (pass ``tiles_table=`` on the second save). The plan
    is scan → sort-merge/shuffled-hash join on ``tile_id`` whose shuffle
    is satisfied by the bucket layout → MBB filter → exact refine →
    reference-point dedup. ``tests/test_plans.py`` pins the
    zero-exchange contract.
    """
    pad = float(distance or 0.0)
    if pad > 0.0 and predicate != "st_dwithin":
        raise ValueError("distance= is only meaningful with st_dwithin")
    if predicate == "st_dwithin":
        # the stored layout assigned tiles with pad=0: two objects within
        # distance d but in disjoint tiles would never meet, silently
        # dropping pairs — padded joins must re-assign at runtime
        raise ValueError(
            "st_dwithin needs pad-expanded tile assignment; the bucketed "
            "layout was written unpadded — use spatial_join(strategy='tile') "
            "for distance joins"
        )
    sfx1, sfx2 = suffixes
    a = spark.table(table_a)
    b = spark.table(table_b)
    wkt_mode = geom_col in a.columns

    def _sfx(df, sfx):
        keep = [c for c in df.columns if c not in ("tile_id",)]
        return df.select(
            "tile_id", *[F.col(c).alias(f"{c}{sfx}") for c in keep]
        )

    tb = ("t_xmin", "t_ymin", "t_xmax", "t_ymax")
    at = _sfx(a, sfx1)
    bt = _sfx(b, sfx2).drop(*[f"{c}{sfx2}" for c in tb])
    m1 = [f"{c}{sfx1}" for c in MBB_COLS]
    m2 = [f"{c}{sfx2}" for c in MBB_COLS]
    cond = B.box_intersects(*[F.col(c) for c in m1], *[F.col(c) for c in m2], pad=pad)
    joined = at.join(bt, on=["tile_id"], how="inner").filter(cond)

    g1, g2 = f"{geom_col}{sfx1}", f"{geom_col}{sfx2}"
    if wkt_mode:
        joined = joined.filter(st_predicate(predicate)(F.col(g1), F.col(g2)))
    else:
        from hadoopgis_spark.operators.spatial_join import _box_predicate

        joined = joined.filter(_box_predicate(predicate, m1, m2, pad))

    # reference-point dedup on the stored tile bounds (side A carries them)
    rx = F.greatest(F.col(m1[0]), F.col(m2[0]))
    ry = F.greatest(F.col(m1[1]), F.col(m2[1]))
    t1 = [f"{c}{sfx1}" for c in tb]
    joined = joined.filter(
        (rx >= F.col(t1[0])) & (rx < F.col(t1[2]))
        & (ry >= F.col(t1[1])) & (ry < F.col(t1[3]))
    )
    # drop exactly the engine-added columns, never same-prefixed user ones
    drop = [f"{c}{s}" for c in tb for s in suffixes]
    if not keep_mbb:
        drop += [f"{m}{s}" for m in MBB_COLS for s in suffixes]
    return joined.drop("tile_id", *[c for c in drop if c in joined.columns])
