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
import shutil
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _hash_pair(v) -> tuple[int, int]:
    v = _canon(v)
    tag = "int" if isinstance(v, int) else "str"
    d = hashlib.md5(
        f"{tag}:{v}".encode("utf-8", "surrogateescape")).digest()
    return (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big"))


def _positions(v, m_bits: int, k: int) -> list[int]:
    h1, h2 = _hash_pair(v)
    h2 = h2 % m_bits or 1  # zero stride would collapse all k probes
    return [(h1 + i * h2) % m_bits for i in range(k)]


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
    if not os.path.isdir(bpath):
        return None
    df = spark.read.parquet(bpath)
    return df


def build_bloom_index(
    df_or_spark,
    path: str,
    cols: Sequence[str],
    *,
    n_items: int = 100_000,
    fpp: float = 0.01,
) -> dict:
    """Build (or incrementally extend) the bloom index for ``cols`` over
    the parquet table at ``path``. Only active files with no index row
    for ALL of ``cols`` are read — call it again after appends or
    compaction and it pays O(new files), not O(table). Returns
    ``{"indexed": n_new_files, "total": n_active_files}``.

    ``n_items`` is the expected distinct-key count PER FILE (sizes the
    filter: ~1.2 bytes/key at the default 1% fpp); all files share one
    (m, k) per column so partial filters stay OR-mergeable."""
    spark = df_or_spark if isinstance(df_or_spark, SparkSession) else df_or_spark.sparkSession
    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    m_bits, k = _params(n_items, fpp)

    active = _active_files(path)
    old = _index_df(spark, path)
    covered: set[str] = set()
    if old is not None:
        have = {
            (r.file, r.col)
            for r in old.select("file", "col").collect()  # names only
        }
        covered = {f for f in active if all((f, c) in have for c in cols)}
    missing = sorted(active - covered)
    if missing:
        src = (
            spark.read.parquet(*(os.path.join(path, f) for f in missing))
            .select(*cols)
            .withColumn("__file", F.input_file_name())
        )

        def _partials(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                out = []
                for fname, g in pdf.groupby("__file"):
                    base = _basename(fname)
                    for c in cols:
                        bits = np.zeros(m_bits // 8, dtype=np.uint8)
                        for v in pd.unique(g[c].dropna()):
                            for pos in _positions(v, m_bits, k):
                                bits[pos >> 3] |= 1 << (pos & 7)
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
        keep_old = old.filter(
            F.col("file").isin(sorted(active - set(missing))))
    combined = (
        fresh if keep_old is None
        else keep_old if fresh is None
        else keep_old.unionByName(fresh)
    )
    if combined is None:
        return {"indexed": 0, "total": len(active)}
    nxt = os.path.join(path, _BLOOM_NEXT)
    combined.coalesce(1).write.mode("overwrite").parquet(nxt)
    cur = os.path.join(path, _BLOOM_DIR)
    if os.path.isdir(cur):
        shutil.rmtree(cur)
    os.rename(nxt, cur)
    return {"indexed": len(missing), "total": len(active)}


def prune_files_eq(
    spark: SparkSession,
    path: str,
    eq: dict,
) -> tuple[list[str], int]:
    """(kept file paths, total active file count) for a conjunction of
    equality constraints ``{col: value}``. A file is pruned only when
    some constrained column HAS an index row whose filter proves the
    value absent; files without index rows (fresh appends, crash
    orphans, foreign files) are always kept. The bit tests run
    DISTRIBUTED over the index table — only file names reach the
    driver."""
    for v in eq.values():
        _canon(v)  # fail fast on unsupported key types
    active = _active_files(path)
    idx = _index_df(spark, path)
    if idx is None or not eq:
        return sorted(os.path.join(path, f) for f in active), len(active)
    qcols = sorted(eq)
    rows = idx.filter(F.col("col").isin(qcols))

    def _test(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            miss = []
            for _, r in pdf.iterrows():
                bits = np.frombuffer(r["bits"], dtype=np.uint8)
                pos = _positions(eq[r["col"]], int(r["m_bits"]), int(r["k"]))
                absent = any(not (bits[p >> 3] >> (p & 7)) & 1 for p in pos)
                miss.append(absent)
            yield pd.DataFrame({"file": pdf["file"], "miss": miss})

    verdict = (
        rows.mapInPandas(_test, "file string, miss boolean")
        .groupBy("file").agg(F.max("miss").alias("miss"))
        .collect()  # bounded: one (name, bool) per indexed file
    )
    pruned = {r.file for r in verdict if r.miss}
    kept = sorted(os.path.join(path, f) for f in active - pruned)
    return kept, len(active)


def read_eq(
    spark: SparkSession,
    path: str,
    eq: dict,
) -> DataFrame:
    """Rows with ``col == value`` for every entry of ``eq``, scanning
    only files the bloom index (and, when the zonemap manifest also
    covers a queried column, its min/max ranges) cannot rule out. The
    equality residual is always re-applied — correct at any fpp."""
    from hadoopgis_spark.sources import skipping as _skip

    kept, _ = prune_files_eq(spark, path, eq)
    keep_names = {os.path.basename(p) for p in kept}
    # intersect with zonemap pruning for manifest-covered columns: a
    # point is just a degenerate range, and the clustering column's
    # min/max often rules out files the bloom keeps (and vice versa)
    try:
        manifest_cols = {r.col for r in _skip._load_manifest(spark, path)}
    except ValueError:
        manifest_cols = set()
    ranged = {c: (v, v) for c, v in eq.items() if c in manifest_cols}
    if ranged:
        zkept, _ = _skip.prune_files(spark, path, ranged)
        keep_names &= {os.path.basename(p) for p in zkept}
    if not keep_names:
        return spark.read.parquet(path).filter(F.lit(False))
    df = spark.read.parquet(
        *(os.path.join(path, n) for n in sorted(keep_names)))
    for c, v in eq.items():
        df = df.filter(F.col(c) == F.lit(v))
    return df
