"""Single-writer lease (round-11): concurrent mutators on one table —
one wins, one refuses loudly, and a writer whose lease is taken over
mid-flight aborts at its commit-point fence BEFORE anything lands, so
every interleaving point is crash-equivalent and the table stays
exactly-once readable (the property the per-crash-point suites in
test_time_travel.py prove for crashes)."""

import json
import time

import pytest
from pyspark.sql import functions as F

from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.sources import lease
from hadoopgis_spark.sources import skipping as sk


def _ks(df):
    return sorted(r.k for r in df.collect())


def _table(spark, tmp_path, name="t"):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    path = str(tmp_path / name)
    sk.save_range_sorted(df, path, "k", n_files=8)
    return path


def _foreign_record(ttl=300.0):
    return {
        "token": "f" * 32,
        "owner": "otherhost:99999",
        "op": "ingest",
        "acquired_at": time.time(),
        "expires_at": time.time() + ttl,
    }


class _OtherProcess:
    """Make this process's held leases invisible, emulating a SECOND
    writer process (reentrancy keys on the process-local registry)."""

    def __enter__(self):
        self.saved = dict(lease._ACTIVE)
        lease._ACTIVE.clear()
        return self

    def __exit__(self, *exc):
        lease._ACTIVE.clear()
        lease._ACTIVE.update(self.saved)


class TestWriterLease:
    def test_second_writer_refuses_loudly(self, spark, tmp_path):
        path = _table(spark, tmp_path)
        before = _ks(sk.read_range(spark, path, "k"))
        batch = spark.range(2000, 2010).select(F.col("id").alias("k"))
        with lease.writer_lease(path, op="ingest"):
            with _OtherProcess():
                with pytest.raises(lease.LeaseHeldError, match="held by"):
                    sk.append_range_sorted(batch, path, "k")
                with pytest.raises(lease.LeaseHeldError):
                    sk.delete_range(spark, path, "k", 0, 10)
            # loser left no trace: table unchanged and still readable
            assert _ks(sk.read_range(spark, path, "k")) == before
        # lease released on exit: the same mutation now succeeds
        sk.append_range_sorted(batch, path, "k")
        assert _ks(sk.read_range(spark, path, "k")) == before + list(
            range(2000, 2010))

    def test_expired_lease_is_taken_over(self, spark, tmp_path):
        path = _table(spark, tmp_path)
        rec = _foreign_record(ttl=-5.0)  # already expired (crashed writer)
        _fs.write_bytes_atomic(
            lease._lease_path(path), json.dumps(rec).encode())
        sk.delete_range(spark, path, "k", 110, 640)
        got = _ks(sk.read_range(spark, path, "k"))
        assert got == [k for k in range(1000) if not 110 <= k <= 640]
        assert not _fs.exists(lease._lease_path(path))  # released

    def test_takeover_mid_flight_aborts_before_commit(
            self, spark, tmp_path, monkeypatch):
        """The contention analogue of the crash suites: a competing
        writer takes the lease right before our commit point; the fence
        aborts the mutation with nothing committed (readers see the PRE
        state), and a later retry converges to the POST state."""
        path = _table(spark, tmp_path)
        pre = list(range(1000))
        post = [k for k in range(1000) if not 110 <= k <= 640]

        orig_fence = lease.fence

        def hostile_fence(p, renew=lease.DEFAULT_TTL_S):
            if lease._ACTIVE:  # only attack leased commit points
                _fs.write_bytes_atomic(
                    lease._lease_path(p),
                    json.dumps(_foreign_record()).encode())
            orig_fence(p, renew)

        monkeypatch.setattr(lease, "fence", hostile_fence)
        with pytest.raises(lease.LeaseLostError, match="taken over"):
            sk.delete_range(spark, path, "k", 110, 640)
        monkeypatch.setattr(lease, "fence", orig_fence)

        # aborted BEFORE the commit record: exactly the pre state
        assert sk._load_compact_record(path) is None
        assert _ks(sk.read_range(spark, path, "k")) == pre
        # clear the hostile lease (its writer "crashed"); retry converges
        _fs.remove(lease._lease_path(path))
        sk.delete_range(spark, path, "k", 110, 640)
        assert _ks(sk.read_range(spark, path, "k")) == post

    def test_save_overwrite_survives_lease_wipe(self, spark, tmp_path):
        """Spark's mode('overwrite') wipes the table dir INCLUDING the
        lease file; the fence must re-assert (not abort) in that case,
        so plain save_range_sorted keeps working end-to-end."""
        path = _table(spark, tmp_path)
        df = spark.range(0, 100).select(F.col("id").alias("k"))
        sk.save_range_sorted(df, path, "k", n_files=4)  # full rewrite
        assert _ks(sk.read_range(spark, path, "k")) == list(range(100))
        assert not _fs.exists(lease._lease_path(path))

    def test_reentrant_nested_mutators(self, spark, tmp_path):
        """A pipeline holding the table lease can run nested mutators
        (the foreachBatch-ingest shape): they ride the outer lease."""
        from hadoopgis_spark.sources.bloom import build_bloom_index

        path = _table(spark, tmp_path)
        batch = spark.range(5000, 5010).select(F.col("id").alias("k"))
        with lease.writer_lease(path, op="pipeline"):
            sk.append_range_sorted(batch, path, "k")
            sk.compact_range_sorted(spark, path, "k")
            build_bloom_index(spark, path, ["k"], n_items=1000)
        assert 5005 in _ks(sk.read_range(spark, path, "k"))

    def test_simulated_crash_releases_lease(self, spark, tmp_path):
        path = _table(spark, tmp_path)
        sk._CRASH_POINT = "record"
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                sk.delete_range(spark, path, "k", 110, 640)
        finally:
            sk._CRASH_POINT = None
        # in-process failure releases immediately (no TTL wait) ...
        assert not _fs.exists(lease._lease_path(path))
        # ... and the table is settle-able and mutable by the next writer
        sk.delete_range(spark, path, "k", 110, 640)
        assert _ks(sk.read_range(spark, path, "k")) == [
            k for k in range(1000) if not 110 <= k <= 640]

    def test_real_second_process_refuses(self, tmp_path):
        """TRUE cross-process contention (not the _OtherProcess
        emulation): a subprocess attempting the lease while this
        process holds it must raise LeaseHeldError; after release it
        must acquire and release cleanly. Pure-fs — no Spark in the
        child."""
        import subprocess
        import sys

        path = str(tmp_path / "t")
        lease._fs.makedirs(path)
        child = (
            "import sys; sys.path.insert(0, %r)\n"
            "from hadoopgis_spark.sources import lease\n"
            "try:\n"
            "    with lease.writer_lease(%r, op='child'):\n"
            "        print('ACQUIRED')\n"
            "except lease.LeaseHeldError as e:\n"
            "    print('HELD')\n"
        ) % (str(lease.__file__).split("/hadoopgis_spark/")[0], path)
        with lease.writer_lease(path, op="parent"):
            out = subprocess.run([sys.executable, "-c", child],
                                 capture_output=True, text=True, timeout=60)
            assert out.stdout.strip() == "HELD", (out.stdout, out.stderr)
        out = subprocess.run([sys.executable, "-c", child],
                             capture_output=True, text=True, timeout=60)
        assert out.stdout.strip() == "ACQUIRED", (out.stdout, out.stderr)
        assert not lease._fs.exists(lease._lease_path(path))

    def test_index_mutators_leased(self, spark, tmp_path):
        from hadoopgis_spark.sources.vector_index import save_ivf_index

        root = str(tmp_path / "idx")
        rows = [(i, [float(i % 7), float(i % 5), float(i % 3)])
                for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
        base = f"{root}/emb"
        with lease.writer_lease(base, op="other"):
            with _OtherProcess():
                with pytest.raises(lease.LeaseHeldError):
                    save_ivf_index(df, "emb", dim=3, n_centroids=4,
                                   root=root)
        save_ivf_index(df, "emb", dim=3, n_centroids=4, root=root)
