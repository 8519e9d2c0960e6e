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

Reentrant per table path within a process: nested mutators (a merge
that settles a dangling compaction, an append inside a foreachBatch
ingest) ride the outermost lease.

Honesty note (documented, not hidden): without a conditional PUT this
is ADVISORY locking. Acquire is read→check→write→verify-read, which
catches every interleaving where the competing write lands before the
verify re-read; the commit-point fence catches the remainder before
anything commits. On a store with compare-and-swap (S3 conditional
writes, DynamoDB, etcd) swap :func:`_try_claim` for a true CAS and the
same API becomes a real mutual exclusion. Stale leases from crashed
writers expire after ``ttl`` seconds; writer clocks must agree to
within that slack. The reference has no analogue — its MR jobs were
serialized externally by the scheduler.
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import time
import uuid

from hadoopgis_spark.sources import fsio as _fs

__all__ = [
    "writer_lease",
    "fence",
    "LeaseHeldError",
    "LeaseLostError",
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


def _read_lease(path: str) -> dict | None:
    try:
        return json.loads(_fs.read_bytes(_lease_path(path)))
    except FileNotFoundError:
        return None
    except Exception:
        # torn/garbled lease file: treat as absent — write_bytes_atomic
        # makes this unreachable in practice, but a garbage file must
        # not brick the table forever
        return None


def _try_claim(path: str, op: str, ttl: float) -> str:
    now = time.time()
    cur = _read_lease(path)
    if cur is not None and float(cur.get("expires_at", 0.0)) > now:
        raise LeaseHeldError(
            f"writer lease on {path} held by {cur.get('owner')} "
            f"(op={cur.get('op')}, expires in "
            f"{float(cur['expires_at']) - now:.0f}s) — refusing {op!r}; "
            "retry after it releases or expires"
        )
    token = uuid.uuid4().hex
    rec = {
        "token": token,
        "owner": f"{socket.gethostname()}:{os.getpid()}",
        "op": op,
        "acquired_at": now,
        "expires_at": now + ttl,
    }
    _fs.makedirs(path)
    _fs.write_bytes_atomic(_lease_path(path), json.dumps(rec).encode())
    back = _read_lease(path)
    if back is None or back.get("token") != token:
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
    the table locked for the TTL.
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
        cur = _read_lease(path)
        if cur is not None and cur.get("token") == token:
            with contextlib.suppress(Exception):
                _fs.remove(_lease_path(path))


def fence(path: str, renew: float = DEFAULT_TTL_S) -> None:
    """Commit-point fence: verify this process still holds the lease it
    took for ``path`` and extend it by ``renew`` seconds (long
    compactions outlive one TTL). No-op when no lease context is active
    for the path — legacy callers and reader-side settles keep working
    unchanged. Raises :class:`LeaseLostError` on takeover, so the
    mutation aborts BEFORE its commit record lands.
    """
    key = os.path.abspath(path) if "://" not in path else path
    token = _ACTIVE.get(key)
    if token is None:
        return
    cur = _read_lease(path)
    if cur is None:
        # the lease file is GONE while we logically hold it: a full
        # rewrite (Spark's mode('overwrite') wipes the table dir,
        # lease file included) — not a takeover, which would leave the
        # competitor's token behind. Re-assert ownership and continue.
        now = time.time()
        _fs.makedirs(path)
        _fs.write_bytes_atomic(_lease_path(path), json.dumps({
            "token": token,
            "owner": f"{socket.gethostname()}:{os.getpid()}",
            "op": "reassert",
            "acquired_at": now,
            "expires_at": now + renew,
        }).encode())
        return
    if cur.get("token") != token:
        raise LeaseLostError(
            f"writer lease on {path} was taken over by "
            f"{cur.get('owner')} mid-mutation — aborting before "
            "commit (table state: crash-equivalent, exactly-once safe)"
        )
    cur["expires_at"] = time.time() + renew
    _fs.write_bytes_atomic(_lease_path(path), json.dumps(cur).encode())
