"""Snapshot reads (time travel) over the clustered storage tier.

A versioned table records one snapshot (active-file list) per mutation
and RETIRES superseded files into ``_hgs_retired/`` instead of deleting
them, so any recorded snapshot stays exactly readable while current
reads/pruning are untouched. The mutations run under the same
commit-record protocol as before — the crash suite here mirrors the
delete suite's exactly-once checks and adds "old snapshots survive
every crash point"."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ks(df):
    return sorted(r.k for r in df.collect())


class TestTimeTravel:
    def _table(self, spark, tmp_path, name="t"):
        from hadoopgis_spark.sources import skipping as sk

        df = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        path = str(tmp_path / name)
        sk.save_range_sorted(df, path, "k", n_files=8)
        return path

    def test_versions_accrue_and_replay_exactly(self, spark, tmp_path):
        from hadoopgis_spark.sources import skipping as sk

        path = self._table(spark, tmp_path)
        assert sk.enable_time_travel(spark, path) == 1
        # idempotent enable does not fork history
        assert sk.enable_time_travel(spark, path) == 1
        v1 = list(range(1000))

        b = spark.range(2000, 2100).select(F.col("id").alias("k"),
                                           (F.col("id") % 97).alias("v"))
        sk.append_range_sorted(b, path, "k", n_files=2)     # -> v2
        v2 = v1 + list(range(2000, 2100))

        sk.delete_range(spark, path, "k", 110, 640)          # -> v3
        v3 = [k for k in v2 if not 110 <= k <= 640]

        batch = spark.range(700, 760).select(
            F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v"))
        sk.merge_range(spark, path, batch, "k")              # -> v4
        v4 = v3  # same keys; values changed

        vers = sk.list_versions(spark, path)
        assert [x["version"] for x in vers] == [1, 2, 3, 4]
        assert [x["op"] for x in vers][0] == "enable"

        assert _ks(sk.read_version(spark, path, 1)) == v1
        assert _ks(sk.read_version(spark, path, 2)) == v2
        assert _ks(sk.read_version(spark, path, 3)) == v3
        assert _ks(sk.read_version(spark, path, 4)) == v4
        # v3 still has the pre-merge values, v4 the merged ones
        pre = sk.read_version(spark, path, 3).filter(
            F.col("k").between(700, 759))
        assert all(r.v == r.k % 97 for r in pre.collect())
        post = sk.read_version(spark, path, 4).filter(
            F.col("k").between(700, 759))
        assert all(r.v == -1 for r in post.collect())
        # current read agrees with the latest version
        assert _ks(sk.read_range(spark, path, "k")) == v4
        with pytest.raises(ValueError, match="version"):
            sk.read_version(spark, path, 99)

    def test_compaction_is_versioned_too(self, spark, tmp_path):
        from hadoopgis_spark.sources import skipping as sk

        df = spark.range(0, 400).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=2)
        sk.enable_time_travel(spark, path)
        for i in range(3):
            b = (spark.range(1000 + i * 50, 1000 + (i + 1) * 50)
                 .withColumnRenamed("id", "k"))
            sk.append_range_sorted(b, path, "k", n_files=2)
        before = _ks(sk.read_range(spark, path, "k"))
        nv = len(sk.list_versions(spark, path))
        stats = sk.compact_range_sorted(spark, path, "k",
                                        small_bytes=1 << 30, n_files=2)
        assert stats["compacted"] > 0
        vers = sk.list_versions(spark, path)
        assert len(vers) == nv + 1 and vers[-1]["op"] == "compact"
        assert _ks(sk.read_version(spark, path, nv)) == before
        assert _ks(sk.read_version(spark, path, nv + 1)) == before
        assert _ks(sk.read_range(spark, path, "k")) == before

    def test_unversioned_tables_physically_delete(self, spark, tmp_path):
        import os

        from hadoopgis_spark.sources import skipping as sk

        path = self._table(spark, tmp_path)
        sk.delete_range(spark, path, "k", 110, 640)
        assert not os.path.isdir(os.path.join(path, "_hgs_retired"))
        assert not os.path.exists(os.path.join(path, "_hgs_retired.json"))
        assert not os.path.isdir(os.path.join(path, "_hgs_versions"))
        with pytest.raises(ValueError, match="not versioned"):
            sk.read_version(spark, path, 1)

    def test_current_pruning_unaffected_by_retired_files(
            self, spark, tmp_path):
        from hadoopgis_spark.sources import skipping as sk

        path = self._table(spark, tmp_path)
        sk.enable_time_travel(spark, path)
        sk.delete_range(spark, path, "k", 110, 640)
        retired = set(sk._retired_ledger(path))
        assert retired  # something was retired (in place), not deleted
        assert not (retired & sk._data_files(path))
        # in-place: the physical files are still present (snapshot
        # isolation — a reader that planned them keeps reading them)
        assert all(sk._fs.exists(f"{path}/{f}") for f in retired)
        kept, total = sk.prune_files(spark, path, {"k": (700, 799)})
        assert len(kept) < total  # zonemap still sharp on current state
        assert not any(sk._fs.exists(f"{path}/_hgs_retired/{f}")
                       for f in retired)  # nothing was moved

    @pytest.mark.parametrize(
        "crash", ["staged", "record", "manifest", "mid-move", "mid-delete"])
    def test_versioned_delete_crash_points(self, spark, tmp_path, crash):
        """Same exactly-once contract as the unversioned delete crash
        suite, plus: settle records the settled snapshot and v1 stays
        exactly readable through every crash point."""
        from hadoopgis_spark.sources import skipping as sk

        df = spark.range(0, 1000).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=8)
        sk.enable_time_travel(spark, path)
        pre = list(range(1000))
        post = [k for k in range(1000) if not 110 <= k <= 640]
        sk._CRASH_POINT = crash
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                sk.delete_range(spark, path, "k", 110, 640)
        finally:
            sk._CRASH_POINT = None
        got = _ks(sk.read_range(spark, path, "k"))
        assert got in (pre, post), f"torn delete state at {crash}"
        sk._settle_compaction(spark, path)
        assert sk._load_compact_record(path) is None
        settled = _ks(sk.read_range(spark, path, "k"))
        assert settled in (pre, post)
        # the enable snapshot must replay exactly regardless of crash
        assert _ks(sk.read_version(spark, path, 1)) == pre
        # the latest recorded version matches SOME consistent state and
        # never a torn one
        vers = sk.list_versions(spark, path)
        latest = vers[-1]["version"]
        assert _ks(sk.read_version(spark, path, latest)) in (pre, post)

    def test_vacuum_drops_history_keeps_current(self, spark, tmp_path):
        from hadoopgis_spark.sources import skipping as sk

        path = self._table(spark, tmp_path)
        sk.enable_time_travel(spark, path)
        sk.delete_range(spark, path, "k", 110, 640)
        sk.delete_range(spark, path, "k", 700, 750)
        cur = _ks(sk.read_range(spark, path, "k"))
        assert len(sk.list_versions(spark, path)) == 3
        stats = sk.vacuum_versions(spark, path, keep_last=1, grace_s=0.0)
        assert stats["versions_dropped"] == 2
        assert stats["files_deleted"] >= 1
        vers = sk.list_versions(spark, path)
        assert len(vers) == 1
        keep = vers[0]["version"]
        assert _ks(sk.read_version(spark, path, keep)) == cur
        assert _ks(sk.read_range(spark, path, "k")) == cur
        with pytest.raises(ValueError, match="version"):
            sk.read_version(spark, path, 1)
        # the ledger holds only files the surviving snapshot needs
        leftover = set(sk._retired_ledger(path))
        import json
        rec = json.loads(sk._fs.read_bytes(
            f"{path}/_hgs_versions/v{keep:06d}.json"))
        assert leftover <= set(rec["files"])


class TestSnapshotPrunedReads:
    def test_where_prunes_on_snapshot_manifest(self, spark, tmp_path):
        """A historical read with ``where=`` opens only the snapshot
        files whose embedded footer stats intersect the range, applies
        the residual exactly, and prunes retired files the same way."""
        from hadoopgis_spark.sources import skipping as sk

        df = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=8)
        sk.enable_time_travel(spark, path)
        sk.delete_range(spark, path, "k", 110, 640)  # retires files

        snap = sk.read_version(spark, path, 1)
        n_all = len(snap.inputFiles())
        pruned = sk.read_version(spark, path, 1, where={"k": (700, 799)})
        assert _ks(pruned) == list(range(700, 800))
        assert 0 < len(pruned.inputFiles()) < n_all
        # a range that lives ONLY in since-retired files still reads
        # (in-place retirement: the file serves from the data dir while
        # being excluded from the current listing)
        mid = sk.read_version(spark, path, 1, where={"k": (200, 299)})
        assert _ks(mid) == list(range(200, 300))
        assert 0 < len(mid.inputFiles()) < n_all
        import os as _os
        retired = set(sk._retired_ledger(path))
        assert retired
        assert any(_os.path.basename(f) in retired
                   for f in mid.inputFiles())
        assert not (retired & sk._data_files(path))
        # boundary residual: partial file overlap filters row-exactly
        edge = sk.read_version(spark, path, 1, where={"k": (105, 115)})
        assert _ks(edge) == list(range(105, 116))

    def test_where_without_manifest_falls_back_residual_only(
            self, spark, tmp_path):
        """Snapshots recorded without an embedded manifest (or whose
        where-column has no stats) stay CORRECT: residual-only."""
        import json

        from hadoopgis_spark.sources import skipping as sk

        df = spark.range(0, 100).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=4)
        sk.enable_time_travel(spark, path)
        # simulate a pre-manifest snapshot record
        vfile = f"{path}/_hgs_versions/v000001.json"
        rec = json.loads(sk._fs.read_bytes(vfile))
        rec.pop("manifest", None)
        sk._fs.write_bytes_atomic(vfile, json.dumps(rec).encode())
        got = sk.read_version(spark, path, 1, where={"k": (10, 19)})
        assert _ks(got) == list(range(10, 20))


class TestVersionView:
    def test_sql_surface_over_history(self, spark, tmp_path):
        from hadoopgis_spark.sources import skipping as sk

        df = spark.range(0, 1000).select(F.col("id").alias("k"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=8)
        sk.enable_time_travel(spark, path)
        sk.delete_range(spark, path, "k", 110, 640)

        stats = sk.register_version_view(spark, path, "tt_v1", 1)
        assert stats["version"] == 1 and stats["files"] == 8
        assert spark.sql("SELECT COUNT(*) c FROM tt_v1").collect()[0].c == 1000
        # pruned form serves the exact band from few files
        stats = sk.register_version_view(
            spark, path, "tt_band", 1, where={"k": (200, 299)})
        assert stats["files"] < 8
        got = spark.sql(
            "SELECT COUNT(*) c, CAST(SUM(k) AS BIGINT) s FROM tt_band"
        ).collect()[0]
        assert (got.c, got.s) == (100, sum(range(200, 300)))
        # mutations no longer invalidate the view (in-place retirement:
        # its files stay put) — only a vacuum past grace reclaims them,
        # and THEN the view fails loudly, never silently wrong
        assert spark.sql(
            "SELECT COUNT(*) c FROM tt_band").collect()[0].c == 100
        sk.vacuum_versions(spark, path, keep_last=1, grace_s=0.0)
        with pytest.raises(Exception):
            spark.sql("SELECT COUNT(*) FROM tt_band").collect()
