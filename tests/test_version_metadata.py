"""Historical metadata-only reads (round-11): time-travel snapshots
embed the agg manifest (and retain bloom rows for retired files until
vacuum), so COUNT/SUM/read_eq against a snapshot prune with the same
machinery as live reads — previously a historical point lookup
full-scanned the snapshot."""

import pytest
from pyspark.sql import functions as F

from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.sources import skipping as sk
from hadoopgis_spark.sources.bloom import build_bloom_index, read_eq_version


def _run_counting_jobs(spark, tag, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    try:
        out = fn()
    finally:
        sc.setJobGroup("", "")
    return out, len(sc.statusTracker().getJobIdsForGroup(tag))


class TestVersionedMetadataReads:
    def _table(self, spark, tmp_path):
        df = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=8, agg_cols=["v"])
        sk.enable_time_travel(spark, path)
        build_bloom_index(spark, path, ["k"], n_items=1000)
        v1 = sk.list_versions(spark, path)[-1]["version"]
        # mutate past the snapshot so history and present diverge
        sk.delete_range(spark, path, "k", 100, 899)
        return path, v1

    def test_historical_count_metadata_only(self, spark, tmp_path):
        path, v1 = self._table(spark, tmp_path)
        # current state diverged
        assert sk.count_range(spark, path, "k", 0, 999) == 200
        # historical count matches the snapshot scan
        got = sk.count_version(spark, path, v1, {"k": (50, 949)})
        exp = (sk.read_version(spark, path, v1)
               .filter(F.col("k").between(50, 949)).count())
        assert got == exp == 900
        # unbounded-range historical count is PURE metadata: zero jobs
        n, jobs = _run_counting_jobs(
            spark, "cnt-meta",
            lambda: sk.count_version(spark, path, v1, {"k": (None, None)}))
        assert n == 1000
        assert jobs == 0, f"unbounded count launched {jobs} scan jobs"
        # interior-heavy constrained count scans only the ~2 boundary
        # files (the metadata-only contract, asserted structurally)
        rec, resolve = sk._load_version(path, v1)
        norm, _ = sk._norm_ranges(spark, path, {"k": (50, 949)})
        kept, _, interior = sk._prune_rows(
            spark, sk._snapshot_manifest_rows(rec), set(rec["files"]),
            norm, True, resolve)
        assert len(interior) >= 6 and len(kept) - len(interior) <= 2

    def test_historical_sum_from_embedded_aggs(self, spark, tmp_path):
        path, v1 = self._table(spark, tmp_path)
        s, n = sk.sum_version(spark, path, v1, "v", {"k": (0, 999)})
        assert n == 1000 and s == sum(i % 7 for i in range(1000))
        # range cutting through file boundaries still exact
        s2, n2 = sk.sum_version(spark, path, v1, "v", {"k": (123, 877)})
        assert n2 == 755 and s2 == sum(i % 7 for i in range(123, 878))
        # live sum reflects the delete, proving the two tiers differ
        s3, _ = sk.sum_range(spark, path, "v", {"k": (0, 999)})
        assert s3 == sum(i % 7 for i in range(1000)
                         if not 100 <= i <= 899)

    def test_historical_minmax(self, spark, tmp_path):
        path, v1 = self._table(spark, tmp_path)
        assert sk.minmax_version(spark, path, v1, "k") == (0, 999)
        assert sk.minmax_version(
            spark, path, v1, "k", {"k": (150, 820)}) == (150, 820)
        # live min/max unaffected by history machinery
        assert sk.minmax_range(spark, path, "k") == (0, 999)

    def test_historical_read_eq_prunes_on_retained_bloom(
            self, spark, tmp_path):
        path, v1 = self._table(spark, tmp_path)
        # rebuild the bloom index AFTER the delete: rows for retired
        # files must be RETAINED (not purged) so history stays served
        build_bloom_index(spark, path, ["k"], n_items=1000)
        got = read_eq_version(spark, path, v1, {"k": 500})
        assert [r.k for r in got.collect()] == [500]  # deleted live, in v1
        live = [r.k for r in sk.read_range(spark, path, "k", 500, 500).collect()]
        assert live == []
        # pruning actually happened: fewer files opened than the snapshot
        snap_files = len(sk.read_version(spark, path, v1).inputFiles())
        eq_files = len(got.inputFiles())
        assert eq_files < snap_files, (eq_files, snap_files)

    def test_vacuum_invalidates_loudly(self, spark, tmp_path):
        path, v1 = self._table(spark, tmp_path)
        sk.delete_range(spark, path, "k", 900, 999)
        sk.vacuum_versions(spark, path, keep_last=1)
        with pytest.raises(ValueError):
            sk.count_version(spark, path, v1, {"k": (0, 999)})
        with pytest.raises(ValueError):
            sk.sum_version(spark, path, v1, "v", {"k": (0, 999)})

    def test_pre_r11_snapshots_degrade_to_scan(self, spark, tmp_path):
        """Snapshots recorded without embedded aggs (older layouts) must
        still answer sum_version correctly via the scan tier."""
        import json

        path, v1 = self._table(spark, tmp_path)
        vdir = f"{path}/_hgs_versions"
        name = f"v{v1:06d}.json"
        rec = json.loads(_fs.read_bytes(f"{vdir}/{name}"))
        rec.pop("aggs", None)
        _fs.write_bytes_atomic(f"{vdir}/{name}", json.dumps(rec).encode())
        s, n = sk.sum_version(spark, path, v1, "v", {"k": (0, 999)})
        assert n == 1000 and s == sum(i % 7 for i in range(1000))


class TestAutoStrategyManifestProbe:
    """strategy='auto' on a manifest-backed side must decide from the
    manifest (zero jobs), not a limit().count() probe job (round-11)."""

    def test_zero_job_decision_and_parity(self, spark, tmp_path):
        from hadoopgis_spark.operators.spatial_join import (
            _manifest_rowcount_upper, spatial_join)

        rows = [(i, float(i % 50) * 3, float(i % 40) * 2) for i in range(400)]
        df = spark.createDataFrame(rows, "id int, x double, y double")
        boxes = df.select(
            "id", F.col("x").alias("xmin"), F.col("y").alias("ymin"),
            (F.col("x") + 1).alias("xmax"), (F.col("y") + 1).alias("ymax"))
        path = str(tmp_path / "b")
        sk.save_range_sorted(boxes, path, "xmin", n_files=4,
                             stat_cols=["ymin", "xmax", "ymax"])
        b = spark.read.parquet(path)

        est, jobs = _run_counting_jobs(
            spark, "auto-probe", lambda: _manifest_rowcount_upper(b))
        assert est == 400 and jobs == 0, (est, jobs)
        # a filtered frame over the same table: upper bound, still 0 jobs
        est2 = _manifest_rowcount_upper(b.filter(F.col("id") < 10))
        assert est2 == 400
        # end-to-end: auto resolves (broadcast here: 400 <= 5000) and
        # matches the explicit tile strategy
        a = spark.createDataFrame(
            [(1000 + i, float(i) * 7, float(i) * 5, float(i) * 7 + 2,
              float(i) * 5 + 2) for i in range(20)],
            "id int, xmin double, ymin double, xmax double, ymax double")
        got_auto = sorted((r.id_1, r.id_2) for r in spatial_join(
            a, b, "st_intersects", strategy="auto").collect())
        got_tile = sorted((r.id_1, r.id_2) for r in spatial_join(
            a, b, "st_intersects", strategy="tile").collect())
        assert got_auto == got_tile and got_auto

    def test_row_multiplying_plans_fall_back(self, spark, tmp_path):
        """Round-12 advisor fix: the 'upper bound by construction' claim
        fails for row-multiplying plans over ONE table dir (explode,
        self-join — inputFiles still reports a single directory) and for
        manifest-orphan files; all must return None (probe fallback)
        instead of an undercount that broadcasts a large side."""
        from hadoopgis_spark.operators.spatial_join import (
            _manifest_rowcount_upper)

        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=2)
        b = spark.read.parquet(path)
        assert _manifest_rowcount_upper(b) == 100
        # explode multiplies rows 3x over the same directory
        exploded = b.withColumn(
            "e", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))))
        assert exploded.count() == 300
        assert _manifest_rowcount_upper(exploded) is None
        # self-join squares the per-key rows, one directory in inputFiles
        joined = b.alias("l").join(b.alias("r"), "v")
        assert _manifest_rowcount_upper(joined) is None
        # union of the table with itself: same single dir, 2x rows
        assert _manifest_rowcount_upper(b.unionByName(b)) is None
        # orphan data file (crash between file landing and manifest
        # rewrite): rows exist that the manifest never counted
        import shutil
        parquets = [f for f in _fs.listdir(path) if f.endswith(".parquet")]
        shutil.copyfile(f"{path}/{parquets[0]}",
                        f"{path}/part-orphan-r12.snappy.parquet")
        b2 = spark.read.parquet(path)
        assert b2.count() > 100
        assert _manifest_rowcount_upper(b2) is None
