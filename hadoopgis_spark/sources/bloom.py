"""Bloom-filter file skipping for EQUALITY predicates.

The zonemap manifest (``sources.skipping``) prunes range queries on the
clustering column(s); a point lookup on any OTHER high-cardinality
column — ``WHERE order_id = X`` against a time-clustered fact table —
keeps every file, because every file's min/max spans the key domain.
The standard fix (parquet column bloom filters, Delta's bloom index) is
a per-file bloom filter over the column's distinct values: at read time
the query literal is tested against each file's filter and only
maybe-present files are handed to the scan. False positives cost a
wasted file read; false negatives are impossible, and the equality
residual is always re-applied, so results are exact at any
false-positive rate.

Layout: one parquet table under ``{path}/_hgs_bloom`` (underscore paths
are invisible to Spark's file index, same convention as the zonemap
manifest) with one row per (data file, column): the filter's bit array
plus its (m, k) parameters.

Scale shape (the 100 TB contract):

* **build** is one distributed Arrow pass over the data — ``mapInPandas``
  emits one partial bit-array per (scan batch, file, column), then a
  tiny ``groupBy(file, col)`` OR-merge reduces partials to one row per
  file; the table's rows never shuffle, only m/8-byte bitsets do. All
  files share one (m, k) per column, which is what makes partials (and
  future compaction outputs) OR-mergeable.
* **probe** is a distributed bit test over the INDEX table (each row
  tests its own file, only kept/pruned file NAMES reach the driver) —
  at O(100k) files the index is GBs of bitsets, so the driver never
  loads it.
* **maintenance** is incremental: ``build_bloom_index`` footer-lists the
  active files and reads ONLY files with no index row yet (fresh
  appends, compaction outputs); rows for vanished files drop out. A
  file without an index row is always kept — crash-orphans and
  not-yet-indexed appends degrade pruning sharpness, never correctness
  (the zonemap module's orphan rule, verbatim).

Hashing is md5-derived double hashing (Kirsch-Mitzenmacher): position_i
= (h1 + i*h2) mod m. md5 keys the repo's cross-engine discipline — the
build (executor Python) and the probe (any Python) agree by
construction, with no dependency on Spark's hash functions. Supported
key types are int and string (the realistic point-lookup keys); floats
and timestamps are refused — equality on them is an antipattern and
their binary round-trips are engine-dependent.
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.sources import lease as _lease
from hadoopgis_spark.sources import skipping as _skip

from hadoopgis_spark.sources import fsio as _fsio
from hadoopgis_spark.sources.skipping import _active_files

__all__ = ["build_bloom_index", "prune_files_eq", "read_eq"]

_BLOOM_DIR = "_hgs_bloom"
_BLOOM_NEXT = "_hgs_bloom_next"
_BLOOM_FORMAT = 1
_BLOOM_SCHEMA = ("file string, col string, m_bits bigint, k int, "
                 "bits binary, format int")


def _canon(v):
    """Canonical python value for hashing; refuses unsupported types."""
    import numpy as np

    if isinstance(v, (bool, np.bool_)):
        raise TypeError("boolean bloom keys are not supported")
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (str, np.str_)):
        return str(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", "surrogateescape")
    raise TypeError(
        f"bloom index supports int/string keys, not {type(v).__name__} "
        "(float/timestamp equality is engine-dependent — cluster on them "
        "and use read_range instead)")


_M64 = (1 << 64) - 1
_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB


def _splitmix64(z: int) -> int:
    """Fixed 64-bit finalizer (Steele et al.'s SplitMix64) — pure
    integer arithmetic, so the build (numpy, executors) and the probe
    (python ints, driver) agree forever, independent of any library
    version. Used for INT keys; strings go through md5."""
    z = (z + _SM_GAMMA) & _M64
    z = ((z ^ (z >> 30)) * _SM_M1) & _M64
    z = ((z ^ (z >> 27)) * _SM_M2) & _M64
    return z ^ (z >> 31)


def _hash_pair(v) -> tuple[int, int]:
    v = _canon(v)
    if isinstance(v, int):
        u = v & _M64  # two's-complement wrap, same as numpy uint64 view
        return _splitmix64(u), _splitmix64(u ^ _M64)
    d = hashlib.md5(
        f"str:{v}".encode("utf-8", "surrogateescape")).digest()
    return (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big"))


def _positions(v, m_bits: int, k: int) -> list[int]:
    h1, h2 = _hash_pair(v)
    h2 = h2 % m_bits or 1  # zero stride would collapse all k probes
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _set_bits_vectorized(bits, values, m_bits: int, k: int) -> None:
    """OR the k probe positions of every value into ``bits`` (uint8
    array). Integer arrays go through the numpy splitmix64 path (the
    build's hot loop — ~100x the per-value python loop); everything
    else falls back to the scalar path. MUST stay bit-identical to
    :func:`_positions` — pinned by a test."""
    import numpy as np

    arr = np.asarray(values)
    if arr.dtype.kind not in ("i", "u"):
        for v in values:
            for pos in _positions(v, m_bits, k):
                bits[pos >> 3] |= np.uint8(1 << (pos & 7))
        return
    with np.errstate(over="ignore"):
        z = arr.astype(np.uint64)

        def mix(z):
            z = z + np.uint64(_SM_GAMMA)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(_SM_M1)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM_M2)
            return z ^ (z >> np.uint64(31))

        h1 = mix(z)
        h2 = mix(z ^ np.uint64(_M64)) % np.uint64(m_bits)
        h2[h2 == 0] = 1
        i = np.arange(k, dtype=np.uint64)[None, :]
        # h1 + i*h2 stays < 2^64: h2 < m_bits (< 2^40 in practice) and
        # k is single-digit, so no wrap ambiguity vs the scalar path —
        # python ints don't wrap, numpy would; keep the sum exact
        pos = (h1[:, None] % np.uint64(m_bits)
               + i * h2[:, None]) % np.uint64(m_bits)
    idx = (pos >> np.uint64(3)).ravel()
    msk = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8).ravel()
    np.bitwise_or.at(bits, idx, msk)


def _params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_items`` expected distinct values per
    file at ``fpp`` false-positive rate; m is rounded up to bytes."""
    if not (0 < fpp < 1):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8
    k = max(1, round(math.log(2) * m / n_items))
    return m, k


def _basename(uri: str) -> str:
    return os.path.basename(uri)


def _index_df(spark: SparkSession, path: str) -> DataFrame | None:
    bpath = os.path.join(path, _BLOOM_DIR)
    if not _fsio.is_dir(bpath):
        return None
    df = spark.read.parquet(bpath)
    return df


def build_bloom_index(
    spark,
    path: str,
    cols: Sequence[str],
    *,
    n_items: int = 100_000,
    fpp: float = 0.01,
) -> dict:
    """Build (or incrementally extend) the bloom index for ``cols`` over
    the parquet table at ``path``. Only active files with no index row
    for ALL of ``cols`` are read — call it again after appends or
    compaction and it pays O(new files), not O(table); a call with
    nothing new to index (and no stale rows to purge) is a pure no-op.
    Returns ``{"indexed": n_new_files, "total": n_active_files}``.

    ``n_items`` is the expected distinct-key count PER FILE (sizes the
    filter: ~1.2 bytes/key at the default 1% fpp); all files share one
    (m, k) per column so partial filters stay OR-mergeable."""
    if not isinstance(spark, SparkSession):
        spark = spark.sparkSession
    # single-writer lease on the table (shared with the zonemap/agg
    # mutators in sources.skipping): a bloom build racing a compaction
    # refuses loudly instead of indexing files mid-move. Reentrant, so
    # a leased pipeline (ingest foreachBatch) nests fine.
    with _lease.writer_lease(path, op="bloom_build"):
        return _build_bloom_index_locked(
            spark, path, cols, n_items=n_items, fpp=fpp)


def _build_bloom_index_locked(spark, path, cols, *, n_items, fpp):
    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    m_bits, k = _params(n_items, fpp)

    active = _active_files(path)
    # versioned tables RETAIN index rows for retired files: snapshots
    # still reference them and bloom bits per (immutable) file never go
    # stale — read_eq_version probes them. vacuum_versions deletes the
    # retired files themselves, after which the next build purges here.
    # Retirement is in-place (ledger) since round 13; the _hgs_retired/
    # dir is the pre-r13 moved-file tier, still honored.
    retired_dir = os.path.join(path, "_hgs_retired")
    retained = set(active) | set(_skip._retired_ledger(path))
    if _fsio.is_dir(retired_dir):
        retained |= set(_fsio.listdir(retired_dir))
    old = _index_df(spark, path)
    covered: set[str] = set()
    old_files: set[str] = set()
    if old is not None:
        have = {
            (r.file, r.col)
            for r in old.select("file", "col").collect()  # names only
        }
        old_files = {f for f, _ in have}
        covered = {f for f in active if all((f, c) in have for c in cols)}
    missing = sorted(active - covered)
    if not missing and old_files <= retained:
        # nothing new to index and no stale rows for vanished files —
        # skip the rewrite entirely (probes ignore non-active rows, so
        # staleness is a space concern, not a correctness one)
        return {"indexed": 0, "total": len(active)}
    if missing:
        src = (
            _skip._read_table(spark, path,
                              [os.path.join(path, f) for f in missing])
            .select(*cols)
            .withColumn("__file", F.input_file_name())
        )
        # Arrow→pandas null-padding turns a NULLABLE int64 column into
        # float64 inside mapInPandas; after dropna the values are exact
        # integer-valued floats, but _canon would (correctly) refuse
        # float keys — so remember which requested columns are integral
        # in the SPARK schema and cast back post-dropna. Without this, a
        # single null key in one micro-batch aborts a streaming ingest's
        # every subsequent bloom refresh (round-9 advisor finding).
        from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                       ShortType)
        int_cols = {
            f.name for f in src.schema.fields
            if isinstance(f.dataType,
                          (ByteType, ShortType, IntegerType, LongType))
        }

        def _partials(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                out = []
                for fname, g in pdf.groupby("__file"):
                    base = _basename(fname)
                    for c in cols:
                        vals = pd.unique(g[c].dropna())
                        if c in int_cols and getattr(
                                vals.dtype, "kind", "") == "f":
                            # float64 is exact only below 2^53: a larger
                            # key was ALREADY rounded by the null-pad
                            # conversion (so a round-trip check on vals
                            # cannot detect it — the information is
                            # gone). Hashing the rounded integer would
                            # make probes for the true key silently
                            # false-negative (lost rows in read_eq).
                            # POISON the partial with an all-ones bitset
                            # instead: the OR-merge then makes this
                            # file's filter never prune — always
                            # scanned, never wrong. (Skipping the
                            # partial wouldn't do: other batches of the
                            # same file may still emit partials, and a
                            # merged row missing these keys is exactly
                            # the false-negative filter.)
                            if (np.abs(vals) >= float(1 << 53)).any():
                                out.append((
                                    base, c, m_bits, k,
                                    b"\xff" * (m_bits // 8),
                                    _BLOOM_FORMAT))
                                continue
                            vals = vals.astype("int64")  # exact: < 2^53
                        bits = np.zeros(m_bits // 8, dtype=np.uint8)
                        _set_bits_vectorized(bits, vals, m_bits, k)
                        out.append((base, c, m_bits, k, bits.tobytes(),
                                    _BLOOM_FORMAT))
                if out:
                    yield pd.DataFrame(
                        out, columns=["file", "col", "m_bits", "k",
                                      "bits", "format"])

        def _merge(key, pdf):
            import numpy as np
            import pandas as pd

            acc = np.bitwise_or.reduce(
                np.stack([np.frombuffer(b, dtype=np.uint8)
                          for b in pdf["bits"]]))
            return pd.DataFrame(
                [(key[0], key[1], m_bits, k, acc.tobytes(), _BLOOM_FORMAT)],
                columns=["file", "col", "m_bits", "k", "bits", "format"])

        fresh = (
            src.mapInPandas(_partials, _BLOOM_SCHEMA)
            .groupBy("file", "col")
            .applyInPandas(_merge, _BLOOM_SCHEMA)
        )
    else:
        fresh = None

    # swap-in: write {old rows for still-active files} ∪ {fresh rows} to
    # a sibling dir, then replace. A crash between rmtree and rename
    # leaves no index — every file is conservatively kept until the next
    # build (same failure posture as a missing zonemap manifest row).
    keep_old = None
    if old is not None:
        # per-(file, col) preservation: a rebuild for a SUBSET of the
        # indexed columns must not drop the other columns' rows for the
        # files being re-read — keep every old row whose file is active
        # and whose (file, col) is not regenerated by this build (round-9
        # advisor finding: build(['id']) then build(['name']) used to
        # silently discard all 'id' rows)
        keep_old = old.filter(
            F.col("file").isin(sorted(retained - set(missing)))
            | (F.col("file").isin(sorted(missing))
               & ~F.col("col").isin(cols)))
    combined = (
        fresh if keep_old is None
        else keep_old if fresh is None
        else keep_old.unionByName(fresh)
    )
    if combined is None:
        return {"indexed": 0, "total": len(active)}
    nxt = os.path.join(path, _BLOOM_NEXT)
    combined.coalesce(1).write.mode("overwrite").parquet(nxt)
    # two-rename swap (same protocol as the agg manifest): old aside,
    # new in, delete old — the index-less window is one rename, and a
    # crash in between degrades to always-kept files, never wrong rows
    cur = os.path.join(path, _BLOOM_DIR)
    prev = cur + "_old"
    if _fsio.is_dir(prev):  # leftover from a crashed earlier swap
        _fsio.rmtree(prev)
    if _fsio.is_dir(cur):
        _fsio.rename(cur, prev)
    _fsio.rename(nxt, cur)
    if _fsio.is_dir(prev):
        _fsio.rmtree(prev)
    return {"indexed": len(missing), "total": len(active)}


# Driver-side index cache: point lookups are interactive (an id probe
# should cost microseconds, not a Spark job), so indexes up to this
# many bytes are pyarrow-read ONCE per (path, index fingerprint) and
# probed in pure Python. Larger indexes (the true 100k-file case, GBs
# of bitsets) fall back to one distributed map over the index table in
# which each row tests its own file — only (file, miss) pairs reach
# the driver, never the bits.
_DRIVER_CACHE_MAX = 256 * 1024 * 1024
_index_cache: dict[tuple, dict] = {}


def _index_fingerprint(bpath: str) -> tuple:
    sizes = tuple(
        (n, sz, mt) for n, sz, mt, isdir in _fsio.listdir_stat(bpath)
        if not isdir and n.endswith(".parquet")
        and not n.startswith(("_", ".")))
    return (bpath, sizes)


def _cached_index(bpath: str) -> dict | None:
    """{(file, col): (m_bits, k, bits)} driver-side, or None when the
    index is too big to cache (use the distributed probe)."""
    fp = _index_fingerprint(bpath)
    total = sum(s for _, s, _ in fp[1])
    if total > _DRIVER_CACHE_MAX:
        return None
    hit = _index_cache.get(bpath)
    if hit is not None and hit["fp"] == fp:
        return hit["idx"]
    t = _fsio.read_table(bpath)
    d = t.to_pydict()
    idx = {
        (f, c): (m, k, bits)
        for f, c, m, k, bits in zip(
            d["file"], d["col"], d["m_bits"], d["k"], d["bits"])
    }
    _index_cache.clear()  # bound memory: one cached index at a time
    _index_cache[bpath] = {"fp": fp, "idx": idx}
    return idx


def _absent(bits: bytes, v, m_bits: int, k: int) -> bool:
    return any(
        not (bits[p >> 3] >> (p & 7)) & 1
        for p in _positions(v, m_bits, k))


def _values(v) -> list:
    """Normalize one eq constraint: a scalar, or a non-empty collection
    for IN-list semantics (file pruned only when EVERY candidate is
    provably absent)."""
    vals = list(v) if isinstance(v, (list, tuple, set, frozenset)) else [v]
    if not vals:
        raise ValueError("empty IN-list constraint matches nothing — "
                         "filter literally instead of probing the index")
    for x in vals:
        _canon(x)  # fail fast on unsupported key types
    return vals


def prune_files_eq(
    spark: SparkSession,
    path: str,
    eq: dict,
) -> tuple[list[str], int]:
    """(kept file paths, total active file count) for a conjunction of
    equality constraints ``{col: value_or_values}``. A collection value
    is an IN-list: the file survives that column if ANY candidate is
    maybe-present. A file is pruned only when some constrained column
    HAS an index row whose filter proves every candidate absent; files
    without index rows (fresh appends, crash orphans, foreign files)
    are always kept. Small indexes are cached driver-side (repeat
    probes are pure bit math, no Spark job); large ones are tested
    DISTRIBUTED over the index table — only file names reach the
    driver."""
    vals = {c: _values(v) for c, v in eq.items()}
    active = _active_files(path)
    bpath = os.path.join(path, _BLOOM_DIR)
    if not _fsio.is_dir(bpath) or not eq:
        return sorted(os.path.join(path, f) for f in active), len(active)

    def _all_absent(bits, c, m, k):
        return all(_absent(bits, x, m, k) for x in vals[c])

    cached = _cached_index(bpath)
    if cached is not None:
        pruned = {
            f for (f, c), (m, k, bits) in cached.items()
            if c in vals and _all_absent(bits, c, int(m), int(k))
        }
    else:
        qcols = sorted(vals)
        rows = _index_df(spark, path).filter(F.col("col").isin(qcols))

        def _test(batches):
            import pandas as pd

            for pdf in batches:
                miss = [
                    _all_absent(r["bits"], r["col"],
                                int(r["m_bits"]), int(r["k"]))
                    for _, r in pdf.iterrows()
                ]
                yield pd.DataFrame({"file": pdf["file"], "miss": miss})

        verdict = rows.mapInPandas(_test, "file string, miss boolean") \
            .collect()  # bounded: one (name, bool) per (file, col) row
        pruned = {r.file for r in verdict if r.miss}
    kept = sorted(os.path.join(path, f) for f in active - pruned)
    return kept, len(active)


def read_eq(
    spark: SparkSession,
    path: str,
    eq: dict,
) -> DataFrame:
    """Rows with ``col == value`` (or ``col IN (values)`` for a
    collection) for every entry of ``eq``, scanning only files the
    bloom index (and, when the zonemap manifest also covers a queried
    column, its min/max ranges) cannot rule out. The equality residual
    is always re-applied — correct at any fpp."""
    from hadoopgis_spark.sources import skipping as _skip

    vals = {c: _values(v) for c, v in eq.items()}
    kept, _ = prune_files_eq(spark, path, eq)
    keep_names = {os.path.basename(p) for p in kept}
    # intersect with zonemap pruning for manifest-covered columns: a
    # point (or an IN-list's [min, max] envelope) is just a range, and
    # the clustering column's min/max often rules out files the bloom
    # keeps (and vice versa)
    try:
        manifest_cols = {r.col for r in _skip._load_manifest(spark, path)}
    except ValueError:
        manifest_cols = set()
    ranged = {c: (min(v), max(v)) for c, v in vals.items()
              if c in manifest_cols}
    if ranged:
        zkept, _ = _skip.prune_files(spark, path, ranged)
        keep_names &= {os.path.basename(p) for p in zkept}
    if not keep_names:
        return _skip._read_table(spark, path).filter(F.lit(False))
    df = _skip._read_table(
        spark, path, [os.path.join(path, n) for n in sorted(keep_names)])
    for c, v in vals.items():
        df = df.filter(
            F.col(c) == F.lit(v[0]) if len(v) == 1 else F.col(c).isin(v))
    return df


def _bloom_pruned_names(spark, path: str, vals: dict) -> set:
    """File names (any file — active or retired) whose index rows prove
    EVERY candidate of some constrained column absent. Files without
    rows are never in the result (conservatively kept by callers)."""
    bpath = os.path.join(path, _BLOOM_DIR)
    if not _fsio.is_dir(bpath) or not vals:
        return set()

    def _all_absent(bits, c, m, k):
        return all(_absent(bits, x, m, k) for x in vals[c])

    cached = _cached_index(bpath)
    if cached is not None:
        return {
            f for (f, c), (m, k, bits) in cached.items()
            if c in vals and _all_absent(bits, c, int(m), int(k))
        }
    qcols = sorted(vals)
    rows = _index_df(spark, path).filter(F.col("col").isin(qcols))

    def _test(batches):
        import pandas as pd

        for pdf in batches:
            miss = [
                _all_absent(r["bits"], r["col"],
                            int(r["m_bits"]), int(r["k"]))
                for _, r in pdf.iterrows()
            ]
            yield pd.DataFrame({"file": pdf["file"], "miss": miss})

    verdict = rows.mapInPandas(_test, "file string, miss boolean") \
        .collect()  # bounded: one (name, bool) per (file, col) row
    return {r.file for r in verdict if r.miss}


def read_eq_version(
    spark: SparkSession,
    path: str,
    version: int,
    eq: dict,
) -> DataFrame:
    """Historical :func:`read_eq`: point/IN lookup against time-travel
    snapshot ``version``, pruned by the bloom index (whose rows for
    retired files are RETAINED until vacuum — bits per immutable file
    never go stale) and the snapshot's embedded zonemap manifest. The
    equality residual is always re-applied; files without index rows
    are conservatively read. Vacuumed-past snapshots raise loudly
    (round-11: previously a historical point lookup full-scanned the
    snapshot)."""
    from hadoopgis_spark.sources import skipping as _skip

    rec, resolve = _skip._load_version(path, version)
    names = set(rec["files"])
    vals = {c: _values(v) for c, v in eq.items()}
    keep = names - _bloom_pruned_names(spark, path, vals)
    # intersect with the snapshot's own zonemap (same trick as read_eq)
    rows = _skip._snapshot_manifest_rows(rec)
    ranged = {c: (min(v), max(v)) for c, v in vals.items()
              if any(r.col == c for r in rows)}
    if ranged and keep:
        zkept, _ = _skip._prune_rows(
            spark, rows, names, ranged, False, lambda f: f)
        keep &= set(zkept)
    if not keep:
        return _skip.read_version(spark, path, version).filter(F.lit(False))
    df = _skip._read_table(spark, path,
                           [resolve(f) for f in sorted(keep)])
    for c, v in vals.items():
        df = df.filter(
            F.col(c) == F.lit(v[0]) if len(v) == 1 else F.col(c).isin(v))
    return df
