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

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.functions import boxes as B
from hadoopgis_spark.functions.spatial import st_dwithin, st_predicate
from hadoopgis_spark.operators.mbb import MBB_COLS, space_extent, with_mbb
from hadoopgis_spark.operators.spatial_join import default_bucket_size
from hadoopgis_spark.operators.tile import assign_tiles, sample_mbbs, tiles_dataframe
from hadoopgis_spark.partition import partition_tiles

__all__ = ["save_bucketed", "spatial_join_bucketed"]


def _bucket_root(spark: SparkSession) -> str:
    """External-table root. ``hgs.bucketRoot`` points a cluster deployment
    at the shared filesystem; the default is keyed by applicationId so two
    concurrent sessions (pytest next to check_oracle, two users) can never
    clobber each other's bucketed files mid-join."""
    configured = spark.conf.get("hgs.bucketRoot", None)
    return configured or f"/tmp/hgs_bucketed_{spark.sparkContext.applicationId}"


def _tiles_fingerprint(tiles_df: DataFrame) -> str:
    """md5 over the sorted tile bounds — identifies a tiling by VALUE, so
    the join guard catches two tables bucketed over same-named but
    differently-fitted tile tables (the silent-pair-drop hazard)."""
    rows = tiles_df.select("tile_id", "t_xmin", "t_ymin", "t_xmax", "t_ymax").collect()
    canon = ";".join(
        f"{r.tile_id}:{r.t_xmin!r}:{r.t_ymin!r}:{r.t_xmax!r}:{r.t_ymax!r}"
        for r in sorted(rows, key=lambda r: r.tile_id)
    )
    return hashlib.md5(canon.encode()).hexdigest()


def _table_props(spark: SparkSession, table: str) -> dict[str, str]:
    return {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }


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
    pad: float = 0.0,
) -> str:
    """Tile-assign ``df`` and persist it bucketed on ``tile_id``.

    ``tiles_table``: reuse an existing fitted tiling (REQUIRED for the
    second join side — both sides must share one tile table for the
    equi-join to be complete). Returns the tiles table name.

    ``pad``: expand every object's MBB by this margin during tile
    assignment. A layout written with pad ``p`` replicates each row into
    every tile within ``p`` of its box, so a later ``st_dwithin`` join
    between tables with declared pads ``p_a`` and ``p_b`` is complete for
    any ``distance <= p_a + p_b`` — still zero-shuffle. Costs write
    amplification proportional to the padded perimeter; 0 keeps the
    exact layout for intersecting predicates.

    The tiling's declared name, value fingerprint, and pad are recorded
    in TBLPROPERTIES; :func:`spatial_join_bucketed` refuses joins whose
    sides disagree, instead of silently dropping pairs.
    """
    spark = df.sparkSession
    if not overwrite and spark.catalog.tableExists(table):
        return tiles_table or f"{table}__tiles"
    root = _bucket_root(spark)
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
            .option("path", f"{root}/{tiles_table}")
            .saveAsTable(tiles_table)
        )
    tiles_df = spark.table(tiles_table)

    # multicast: one stored row per touched tile (the reference loader's
    # boundary replication, padded by the declared distance margin) —
    # keeps per-tile candidate sets complete, and the tile bounds ride
    # along for the query-time refpoint dedup
    assigned = assign_tiles(df, tiles_df, pad=pad)
    # co-locate rows by the bucket hash before the write: bucketBy makes
    # each task emit one file PER BUCKET it sees (tasks × buckets shards
    # otherwise); with the pre-shuffle each bucket is one task → one file
    (
        assigned.repartition(n_buckets, F.col("tile_id"))
        .write.bucketBy(n_buckets, "tile_id")
        .sortBy("tile_id")
        .mode("overwrite")
        .format("parquet")
        .option("path", f"{root}/{table}")
        .saveAsTable(table)
    )
    fp = _tiles_fingerprint(tiles_df)
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'hgs.tilesTable'='{tiles_table}', 'hgs.tilesFp'='{fp}', 'hgs.pad'='{pad!r}')"
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
    same tiles table (pass ``tiles_table=`` on the second save); the
    recorded tiling fingerprints are compared and a mismatch raises
    instead of silently dropping pairs. The plan is scan →
    sort-merge/shuffled-hash join on ``tile_id`` whose shuffle is
    satisfied by the bucket layout → MBB filter → exact refine →
    reference-point dedup. ``tests/test_plans.py`` pins the
    zero-exchange contract.

    ``st_dwithin`` is served zero-shuffle when the stored layouts
    declare enough pad: complete iff ``distance <= pad_a + pad_b``
    (each row was replicated into every tile within its declared pad,
    so any pair within that distance shares the tile owning the padded
    reference point). Larger distances raise — re-assign at runtime
    with ``spatial_join(strategy='tile')``.
    """
    pad = float(distance or 0.0)
    if pad > 0.0 and predicate != "st_dwithin":
        raise ValueError("distance= is only meaningful with st_dwithin")
    props_a = _table_props(spark, table_a)
    props_b = _table_props(spark, table_b)
    fp_a, fp_b = props_a.get("hgs.tilesFp"), props_b.get("hgs.tilesFp")
    if fp_a != fp_b or fp_a is None:
        raise ValueError(
            f"{table_a} and {table_b} were not bucketed over the same tiling "
            f"(fingerprints {fp_a} vs {fp_b}) — the tile_id equi-join would "
            f"silently drop pairs; re-save the second side with "
            f"tiles_table={props_a.get('hgs.tilesTable')!r}"
        )
    pad_a = float(props_a.get("hgs.pad", "0.0"))
    pad_b = float(props_b.get("hgs.pad", "0.0"))
    if predicate == "st_dwithin" and pad > pad_a + pad_b:
        # beyond the stored margins two objects within `distance` can sit
        # in disjoint tile sets and would never meet in the equi-join
        raise ValueError(
            f"st_dwithin(distance={pad}) exceeds the stored layout margin "
            f"pad_a + pad_b = {pad_a + pad_b}; save with pad= or use "
            f"spatial_join(strategy='tile') for runtime re-assignment"
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
        if predicate == "st_dwithin":
            joined = joined.filter(
                st_dwithin(F.col(g1), F.col(g2), pad, geography=geography)
            )
        else:
            joined = joined.filter(st_predicate(predicate)(F.col(g1), F.col(g2)))
    else:
        from hadoopgis_spark.operators.spatial_join import _box_predicate

        joined = joined.filter(_box_predicate(predicate, m1, m2, pad))

    # reference-point dedup on the stored tile bounds (side A carries
    # them). The refpoint must lie inside BOTH sides' assignment boxes —
    # the boxes each row's tile replication was computed from — so for
    # distance joins it shifts by each side's declared pad: the point is
    # then in (boxA + pad_a) ∩ (boxB + pad_b), which is non-empty for any
    # surviving pair (distance ≤ pad_a + pad_b) and whose owning tile
    # received both rows. Exactly-once either way: one refpoint, one tile.
    rx = F.greatest(F.col(m1[0]) - F.lit(pad_a), F.col(m2[0]) - F.lit(pad_b))
    ry = F.greatest(F.col(m1[1]) - F.lit(pad_a), F.col(m2[1]) - F.lit(pad_b))
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
