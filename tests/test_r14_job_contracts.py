"""Round-14 optimization contracts: the storage tier's per-mutation
fixed costs stay collapsed.

Same philosophy as test_r13_job_contracts.py: at 100 TB the cost that
multiplies is the number of sequential driver actions (Spark jobs,
metadata round trips) per mutation, so a regression that quietly
reintroduces one — a schema-inference job on the first post-mutation
read, a per-file retirement-ledger rewrite, an eager batch checkpoint
job per merge — is a scale regression even though results stay
identical. Job counts come from the status tracker under a dedicated
job group; host noise cannot move them.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F


def _jobs_during(spark, fn):
    group = f"jobcount-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "job-count contract")
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group)), out


def _layout(spark, tmp_path, name="t", n_files=8):
    from hadoopgis_spark.sources import skipping as sk

    p = str(tmp_path / name)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    sk.save_range_sorted(df, p, "k", n_files=n_files)
    return p


class TestFooterSchemaPin:
    def test_footer_schema_matches_spark_inference(self, spark, tmp_path):
        """_footer_schema (driver-side pyarrow footer → Spark schema)
        must equal spark.read.parquet's own inferred schema EXACTLY —
        including nullability — for the types managed layouts carry;
        any divergence would silently change managed-read dtypes."""
        from hadoopgis_spark.sources import skipping as sk

        p = str(tmp_path / "types")
        df = spark.range(0, 50).select(
            F.col("id").cast("int").alias("i"),
            F.col("id").alias("l"),
            (F.col("id") * 1.5).alias("d"),
            F.col("id").cast("string").alias("s"),
            F.col("id").cast("decimal(12,2)").alias("dec"),
            F.timestamp_seconds(F.col("id")).alias("ts"),
            F.timestamp_seconds(F.col("id")).cast("timestamp_ntz").alias("tsn"),
            F.to_date(F.timestamp_seconds(F.col("id") * 86400)).alias("dt"),
        )
        with sk._stats_friendly_writer(spark):
            df.write.mode("overwrite").parquet(p)
        got = sk._footer_schema(spark, p)
        assert got is not None
        assert got == spark.read.parquet(p).schema

    def test_footer_schema_bails_on_int96(self, spark, tmp_path):
        """INT96 physical timestamps read as TimestampType in Spark but
        tz-less nanos through arrow — the driver-side pin must refuse
        (None → Spark's own inference job), never mis-pin."""
        from hadoopgis_spark.sources import skipping as sk

        p = str(tmp_path / "int96")
        old = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
        try:
            spark.range(0, 10).select(
                F.timestamp_seconds(F.col("id")).alias("ts")
            ).write.mode("overwrite").parquet(p)
        finally:
            if old is None:
                spark.conf.unset("spark.sql.parquet.outputTimestampType")
            else:
                spark.conf.set("spark.sql.parquet.outputTimestampType", old)
        assert sk._footer_schema(spark, p) is None

    def test_post_mutation_read_plans_with_zero_jobs(self, spark, tmp_path):
        """Every mutation pops the schema memo; the next read must
        re-pin DRIVER-side (one pyarrow footer read) instead of paying
        a 1-task Spark inference job — one job per mutation at any
        scale before round 14."""
        from hadoopgis_spark.sources import skipping as sk

        p = _layout(spark, tmp_path)
        sk.delete_range(spark, p, "k", 100, 200)  # pops the memo
        n_jobs, df = _jobs_during(
            spark, lambda: sk.read_range(spark, p, "k", 1, 50))
        assert n_jobs == 0, f"post-mutation read planning ran {n_jobs} jobs"
        assert df.count() == 50


class TestRowBoundThroughFacade:
    def test_plan_rows_upper_fires_on_non_local_filesystem(
            self, spark, tmp_path):
        """_plan_rows_upper's stat + footer reads route through the fsio
        facade (round 14, r13 verdict watch item): under an injected
        pyarrow filesystem — standing in for an s3://-style root, where
        the old os.stat silently returned None and re-enabled the exact
        two-pass extent+sample — the zero-job footer bound still fires."""
        import pyarrow.fs as pafs

        from hadoopgis_spark.operators import mbb
        from hadoopgis_spark.sources import fsio

        p = str(tmp_path / "pts")
        rows = [(i, float(i), float(i), float(i) + 1.0, float(i) + 1.0)
                for i in range(123)]
        spark.createDataFrame(
            rows,
            "id long, xmin double, ymin double, xmax double, ymax double"
        ).write.mode("overwrite").parquet(p)
        df = spark.read.parquet(p).select(*mbb.MBB_COLS)
        sub = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
        mbb._FOOTER_ROWS_CACHE.clear()
        with fsio.use_filesystem(sub, prefix=str(tmp_path)):
            upper = mbb._plan_rows_upper(df)
        assert upper == 123, f"footer bound did not fire: {upper!r}"


class TestKnnRankChainOneExchange:
    def test_tile_knn_rank_chain_rides_one_id_exchange(self, spark):
        """The kNN rank chain — per-tile prune window (tile_id, id_1),
        pair dedup (id_1, id_2), k-ranking window (id_1) — rides ONE
        hash exchange on id_1 (round 14): HashPartitioning(id_1)
        satisfies all three clusterings. The pre-r14 shape paid three
        exchanges over the same multicast pair volume."""
        import re

        import numpy as np

        rng = np.random.default_rng(3)
        rows_a = [(i, x, y, x, y) for i, (x, y) in
                  enumerate(rng.uniform(0, 50, (300, 2)).tolist())]
        rows_b = [(i, x, y, x, y) for i, (x, y) in
                  enumerate(rng.uniform(0, 50, (200, 2)).tolist())]
        schema = "id long, xmin double, ymin double, xmax double, ymax double"
        a = spark.createDataFrame(rows_a, schema)
        b = spark.createDataFrame(rows_b, schema)
        from hadoopgis_spark.operators.knn import knn_join

        q = knn_join(a, b, k=2, mode="tile", bucket_size=50, geography=True)
        plan = q._jdf.queryExecution().executedPlan().toString()
        id_exchanges = re.findall(
            r"Exchange hashpartitioning\([^)]*id_1[^)]*\)", plan)
        assert len(id_exchanges) == 1, (
            f"rank chain pays {len(id_exchanges)} id_1 exchanges "
            f"(expected 1):\n" + "\n".join(id_exchanges))


class TestMutationJobBudget:
    def test_merge_range_job_budget(self, spark, tmp_path):
        """merge_range runs: ONE lazily-checkpoint-materializing bounds
        aggregate, ONE single-shuffle per-file refine, and the rewrite —
        measured 10 jobs on Spark 4.1 for a 2-file overlap. The pre-r14
        shape adds an eager checkpoint job plus a pre-distinct shuffle
        (2 more AQE jobs) on top; pin just above the measured level."""
        from hadoopgis_spark.sources import skipping as sk

        p = _layout(spark, tmp_path)
        batch = spark.range(100, 140).select(
            F.col("id").alias("k"), F.lit(7).cast("bigint").alias("v"))
        n_jobs, stats = _jobs_during(
            spark, lambda: sk.merge_range(spark, p, batch, "k"))
        assert stats["batch_rows"] == 40
        assert stats["replaced_rows"] == 40
        assert n_jobs <= 11, f"merge_range ran {n_jobs} jobs"

    def test_versioned_mutation_writes_ledger_once(self, spark, tmp_path):
        """Retirement is ONE ledger write per mutation (round 14): the
        old per-file helper paid O(superseded files) sequential
        read+write round trips per commit."""
        from hadoopgis_spark.sources import skipping as sk

        p = _layout(spark, tmp_path, n_files=1)
        sk.enable_time_travel(spark, p)
        for i in range(3):
            sk.append_range_sorted(
                spark.range(1000 + i * 10, 1010 + i * 10).select(
                    F.col("id").alias("k"),
                    F.lit(0).cast("bigint").alias("v")),
                p, "k", n_files=1)
        calls = [0]
        orig = sk._write_retired_ledger

        def counting(path, files):
            calls[0] += 1
            return orig(path, files)

        sk._write_retired_ledger = counting
        try:
            stats = sk.compact_range_sorted(
                spark, p, "k", small_bytes=1 << 30, n_files=1)
        finally:
            sk._write_retired_ledger = orig
        assert stats["compacted"] == 4
        assert calls[0] == 1, (
            f"compaction wrote the retirement ledger {calls[0]} times "
            "for 4 superseded files (expected one batched write)")
        # retirement content unchanged: all four superseded files listed
        assert len(sk._retired_ledger(p)) == 4
