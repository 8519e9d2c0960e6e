"""Single-writer lease (round-11, CAS-pluggable since round-12):
concurrent mutators on one table — one wins, one refuses loudly, and a
writer whose lease is taken over mid-flight aborts at its commit-point
fence BEFORE anything lands, so every interleaving point is
crash-equivalent and the table stays exactly-once readable (the
property the per-crash-point suites in test_time_travel.py prove for
crashes). The whole suite runs under BOTH lease stores: the advisory
filesystem default and the true-CAS reference implementation
(MemoryCasLeaseStore), proving the claim/fence/release protocol needs
nothing beyond the LeaseStore contract."""

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


def _foreign_record(ttl=300.0, released=False):
    return {
        "token": "f" * 32,
        "owner": "otherhost:99999",
        "op": "ingest",
        "acquired_at": time.time(),
        "expires_at": time.time() + ttl,
        "released": released,
    }


def _put_foreign(path, rec):
    """Land a competing writer's record through the ACTIVE store (the
    CAS store never sees raw filesystem writes), swapping against
    whatever is currently there — the shape of a real TTL-expiry
    takeover."""
    cur = lease._STORE.read(path)
    assert lease._STORE.try_put(
        path, rec, cur.get("token") if cur is not None else None)


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


@pytest.fixture(params=["fs", "cas"])
def store_kind(request):
    if request.param == "cas":
        with lease.lease_store(lease.MemoryCasLeaseStore()):
            yield "cas"
    else:
        yield "fs"


class TestWriterLease:
    def test_second_writer_refuses_loudly(self, spark, tmp_path, store_kind):
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

    def test_expired_lease_is_taken_over(self, spark, tmp_path, store_kind):
        path = _table(spark, tmp_path)
        # already-expired foreign claim (crashed writer)
        _put_foreign(path, _foreign_record(ttl=-5.0))
        sk.delete_range(spark, path, "k", 110, 640)
        got = _ks(sk.read_range(spark, path, "k"))
        assert got == [k for k in range(1000) if not 110 <= k <= 640]
        assert lease.is_released(path)

    def test_takeover_mid_flight_aborts_before_commit(
            self, spark, tmp_path, monkeypatch, store_kind):
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
                _put_foreign(p, _foreign_record())
            orig_fence(p, renew)

        monkeypatch.setattr(lease, "fence", hostile_fence)
        with pytest.raises(lease.LeaseLostError, match="taken over"):
            sk.delete_range(spark, path, "k", 110, 640)
        monkeypatch.setattr(lease, "fence", orig_fence)

        # aborted BEFORE the commit record: exactly the pre state
        assert sk._load_compact_record(path) is None
        assert _ks(sk.read_range(spark, path, "k")) == pre
        # the hostile writer "crashes" (its claim expires); retry converges
        _put_foreign(path, _foreign_record(ttl=-5.0))
        sk.delete_range(spark, path, "k", 110, 640)
        assert _ks(sk.read_range(spark, path, "k")) == post

    def test_takeover_then_release_aborts(
            self, spark, tmp_path, monkeypatch, store_kind):
        """Round-12 advisor fix: a competitor that takes over after TTL
        expiry, COMPLETES its mutation, and RELEASES leaves a tombstone
        carrying its token (release is a tombstone write, not a delete)
        — the original writer's fence must abort on it rather than
        re-assert into an interleaved commit (pre-fix, the missing
        lease file looked like an overwrite wipe)."""
        path = _table(spark, tmp_path)
        pre = list(range(1000))
        orig_fence = lease.fence

        def hostile_fence(p, renew=lease.DEFAULT_TTL_S):
            if lease._ACTIVE:
                # full competitor lifecycle: claim, then release
                _put_foreign(p, _foreign_record())
                assert lease._STORE.try_put(
                    p, _foreign_record(ttl=0.0, released=True), "f" * 32)
            orig_fence(p, renew)

        monkeypatch.setattr(lease, "fence", hostile_fence)
        with pytest.raises(lease.LeaseLostError,
                           match="completed and released"):
            sk.delete_range(spark, path, "k", 110, 640)
        monkeypatch.setattr(lease, "fence", orig_fence)
        # nothing committed
        assert sk._load_compact_record(path) is None
        assert _ks(sk.read_range(spark, path, "k")) == pre

    def test_save_overwrite_survives_lease_wipe(
            self, spark, tmp_path, store_kind):
        """Spark's mode('overwrite') wipes the table dir INCLUDING the
        lease file; the fence must re-assert (not abort) in that case,
        so plain save_range_sorted keeps working end-to-end. (The CAS
        store keeps its record outside the dir, so no wipe occurs there
        — the fence just renews.)"""
        path = _table(spark, tmp_path)
        df = spark.range(0, 100).select(F.col("id").alias("k"))
        sk.save_range_sorted(df, path, "k", n_files=4)  # full rewrite
        assert _ks(sk.read_range(spark, path, "k")) == list(range(100))
        assert lease.is_released(path)

    def test_reentrant_nested_mutators(self, spark, tmp_path, store_kind):
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

    def test_simulated_crash_releases_lease(self, spark, tmp_path,
                                            store_kind):
        path = _table(spark, tmp_path)
        sk._CRASH_POINT = "record"
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                sk.delete_range(spark, path, "k", 110, 640)
        finally:
            sk._CRASH_POINT = None
        # in-process failure releases immediately (no TTL wait) ...
        assert lease.is_released(path)
        # ... and the table is settle-able and mutable by the next writer
        sk.delete_range(spark, path, "k", 110, 640)
        assert _ks(sk.read_range(spark, path, "k")) == [
            k for k in range(1000) if not 110 <= k <= 640]

    def test_real_second_process_refuses(self, tmp_path, store_kind):
        """TRUE cross-process contention (not the _OtherProcess
        emulation): a subprocess attempting the lease while this
        process holds it must raise LeaseHeldError; after release it
        must acquire and release cleanly. Pure-fs — no Spark in the
        child (and fs-store only: the memory CAS store is process-local
        by design; a shared CAS backend is what production wires in)."""
        if store_kind == "cas":
            pytest.skip("memory CAS store is process-local by design")
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
        assert lease.is_released(path)

    def test_index_mutators_leased(self, spark, tmp_path, store_kind):
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


class TestCasSemantics:
    """Direct CAS-contract checks on the reference store — what a real
    conditional-PUT backend (S3, etcd) must provide."""

    def test_stale_swap_rejected(self, tmp_path):
        store = lease.MemoryCasLeaseStore()
        p = str(tmp_path / "t")
        rec_a = {"token": "a" * 32, "expires_at": time.time() + 60}
        rec_b = {"token": "b" * 32, "expires_at": time.time() + 60}
        assert store.try_put(p, rec_a, None)          # fresh claim wins
        assert not store.try_put(p, rec_b, None)      # stale view loses
        assert not store.try_put(p, rec_b, "c" * 32)  # wrong expect loses
        assert store.rejected == 2
        assert store.read(p)["token"] == "a" * 32     # untouched
        assert store.try_put(p, rec_b, "a" * 32)      # correct swap wins

    def test_concurrent_claims_one_winner(self, tmp_path):
        """N threads race _try_claim through the CAS store: exactly one
        wins, the rest raise LeaseHeldError — the real-mutex property
        the advisory fs store cannot give."""
        import threading as th

        p = str(tmp_path / "t")
        with lease.lease_store(lease.MemoryCasLeaseStore()):
            results = []

            def claim():
                try:
                    results.append(("ok", lease._try_claim(p, "race", 60.0)))
                except lease.LeaseHeldError:
                    results.append(("held", None))

            barrier = th.Barrier(8)

            def run():
                barrier.wait()
                claim()

            threads = [th.Thread(target=run) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert sum(1 for s, _ in results if s == "ok") == 1
            assert sum(1 for s, _ in results if s == "held") == 7

    def test_fs_cas_stale_swap_rejected(self, tmp_path):
        """The DEFAULT store since r13 (FsCasLeaseStore) satisfies the
        same CAS contract as the memory reference — enforced by atomic
        create-exclusive generation files, not a verify-read."""
        store = lease.FsCasLeaseStore()
        p = str(tmp_path / "t")
        rec_a = {"token": "a" * 32, "expires_at": time.time() + 60}
        rec_b = {"token": "b" * 32, "expires_at": time.time() + 60}
        assert store.try_put(p, rec_a, None)          # fresh claim wins
        assert not store.try_put(p, rec_b, None)      # stale view loses
        assert not store.try_put(p, rec_b, "c" * 32)  # wrong expect loses
        assert store.read(p)["token"] == "a" * 32     # untouched
        assert store.try_put(p, rec_b, "a" * 32)      # correct swap wins

    def test_fs_cas_concurrent_claims_one_winner(self, tmp_path):
        """8 threads race _try_claim through the filesystem CAS store:
        exactly one generation create wins — the real-mutex property
        the advisory protocol could not give on a plain filesystem."""
        import threading as th

        p = str(tmp_path / "t")
        with lease.lease_store(lease.FsCasLeaseStore()):
            results = []

            def claim():
                try:
                    results.append(("ok", lease._try_claim(p, "race", 60.0)))
                except lease.LeaseHeldError:
                    results.append(("held", None))

            barrier = th.Barrier(8)

            def run():
                barrier.wait()
                claim()

            threads = [th.Thread(target=run) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert sum(1 for s, _ in results if s == "ok") == 1
            assert sum(1 for s, _ in results if s == "held") == 7

    def test_fs_cas_release_never_clobbers_takeover(self, tmp_path):
        """The r12 advisor's release race, closed by CAS: a competitor
        claims between the releaser's read and its tombstone put — on
        the advisory store the foreign tombstone clobbers the live
        lease; on the CAS store the conditional put LOSES and the
        competitor's lease survives untouched (no tombstone heuristic
        needed on this path)."""
        store = lease.FsCasLeaseStore()
        p = str(tmp_path / "t")
        with lease.lease_store(store):
            orig_read = store.read
            with lease.writer_lease(p, op="w") as token:
                def racing_read(path):
                    cur = orig_read(path)
                    # competitor swaps in right after the releaser's read
                    if cur is not None and cur.get("token") == token:
                        assert store.try_put(path, _foreign_record(), token)
                    return cur
                store.read = racing_read
            store.read = orig_read
        back = store.read(p)
        assert back["token"] == "f" * 32      # competitor's live lease
        assert not back.get("released")       # no foreign tombstone

    def test_fs_cas_generations_bounded(self, tmp_path):
        """Renewals advance the generation; the winner prunes far-back
        generations so the lease dir stays O(1) over any lifetime."""
        store = lease.FsCasLeaseStore()
        p = str(tmp_path / "t")
        tok = "a" * 32
        assert store.try_put(p, {"token": tok, "expires_at": 0}, None)
        for _ in range(30):
            assert store.try_put(p, {"token": tok, "expires_at": 0}, tok)
        names = _fs.listdir(str(tmp_path / "t" / store.DIR))
        assert len([n for n in names if n.startswith("gen-")]) <= store._KEEP

    def test_fence_abort_under_cas_renewal_race(self, tmp_path):
        """A competitor whose swap lands between our read and our renew
        must make the renewal's CAS fail → LeaseLostError (the window
        the advisory store can only catch at the next fence)."""
        store = lease.MemoryCasLeaseStore()
        p = str(tmp_path / "t")
        with lease.lease_store(store):
            with pytest.raises(lease.LeaseLostError):
                with lease.writer_lease(p, op="w"):
                    orig_read = store.read

                    def racing_read(path):
                        cur = orig_read(path)
                        if cur is not None and not cur.get("released"):
                            # competitor swaps right after our read
                            store._recs[store._key(path)] = _foreign_record()
                        return cur

                    store.read = racing_read
                    try:
                        lease.fence(p)
                    finally:
                        store.read = orig_read
