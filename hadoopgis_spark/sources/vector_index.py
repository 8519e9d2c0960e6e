"""Persistent IVF vector index: fit/assign ONCE, serve top-k forever.

``ivf_topk`` refits-or-reassigns the corpus per query run; at serving
scale the index is an artifact, not a subexpression. ``save_ivf_index``
fits centroids on a bounded sample (deterministic seed), assigns every
vector to its nearest list, and writes the corpus PARTITIONED BY the
list id (``cid``) next to a small centroids table. ``ivf_topk_indexed``
then answers queries with NO refit and — the point of the layout —
dynamic partition pruning: the probe side is broadcast onto the
cid-partitioned scan, so Spark prunes the unprobed lists at the file
level and a query touching ``n_probe`` of ``n_centroids`` lists reads
~``n_probe/n_centroids`` of the corpus bytes (plan contract pinned in
tests/test_plans.py).

Roots follow the bucketed-storage convention: ``hgs.indexRoot`` points
a cluster at a shared filesystem; the default is applicationId-keyed so
concurrent sessions never clobber each other.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.sources import lease as _lease

from hadoopgis_spark.operators.similarity import (
    fit_centroids,
    ivf_assign,
    ivf_probe_rank,
    ivfpq_encode,
    ivfpq_probe_rank,
    ivfpq_rerank_topk,
)

__all__ = [
    "save_ivf_index",
    "load_ivf_index",
    "ivf_topk_indexed",
    "add_to_ivf_index",
    "ivf_index_health",
    "refit_ivf_index",
    "save_ivfpq_index",
    "load_ivfpq_index",
    "ivfpq_topk_indexed",
    "ivfpq_topk_rerank_indexed",
]


def _index_root(spark: SparkSession) -> str:
    configured = spark.conf.get("hgs.indexRoot", None)
    return configured or f"/tmp/hgs_ivf_{spark.sparkContext.applicationId}"


def _index_mutator(op: str):
    """Single-writer lease on the index base dir (sources.lease): a
    concurrent save/append/refit on the same persisted index refuses
    loudly instead of interleaving staged writes. Resolves the base
    exactly like the wrapped function (root or hgs.indexRoot + name)."""
    import functools
    import inspect

    from pyspark.sql import SparkSession as _SS

    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            b = sig.bind(*args, **kwargs)
            b.apply_defaults()
            arg = b.arguments
            obj = arg.get("spark") if isinstance(arg.get("spark"), _SS)                 else arg.get("df").sparkSession
            base = f"{arg.get('root') or _index_root(obj)}/{arg['name']}"
            with _lease.writer_lease(base, op=op):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@_index_mutator('save')
def save_ivf_index(
    df: DataFrame,
    name: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    dim: int,
    sample: int = 4096,
    centroids=None,
    root: str | None = None,
    impl: str = "column",
) -> list[list[float]]:
    """Build and persist the index; returns the fitted centroids.
    ``impl="arrow"`` uses the numpy batch assignment (~10×, see
    ``ivf_assign``); the default bit-matches the oracle fold order.

    Layout: ``{root}/{name}/vectors`` — (id, vec, v_norm) parquet
    partitioned by cid (one inverted list per partition directory);
    ``{root}/{name}/centroids`` — (cid, c, meta) with the JSON meta
    (dim, n_centroids, format) repeated per row so a load needs one
    small scan. Vectors are stored verbatim (original float array) —
    the exact cosine refine is bit-identical to querying the live
    frame. Format 2 adds the precomputed ``v_norm`` column so serving
    never evaluates a norm fold per candidate pair; format-1 indexes
    (no ``v_norm``) still load — ``ivf_probe_rank`` projects the norm
    once per corpus row when the column is absent.
    """
    spark = df.sparkSession
    base = f"{root or _index_root(spark)}/{name}"
    if centroids is None:
        centroids = fit_centroids(
            df, vec_col, id_col, n_centroids=n_centroids, sample=sample
        )
    asg = ivf_assign(
        df, vec_col, id_col,
        n_centroids=n_centroids, dim=dim, centroids=centroids, impl=impl,
    )
    # cluster output by the partition column: one writer task per list
    # instead of every input task emitting a sliver into every cid dir
    asg.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
        f"{base}/vectors"
    )
    meta = json.dumps({"dim": dim, "n_centroids": n_centroids, "format": 2})
    _write_centroids(f"{base}/centroids", centroids, meta)
    return centroids


def _write_centroids(cdir: str, centroids, meta: str) -> None:
    """Land the tiny centroids table (n_centroids rows) DRIVER-side —
    pyarrow write + an explicit ``_SUCCESS`` marker (the refit-settle
    protocol's completion signal, previously Spark's own marker). The
    old ``coalesce(1)`` Spark write paid one job of fixed latency per
    index build for kilobytes; loads are driver-side too
    (:func:`_read_centroids`), so serving an indexed query no longer
    runs a metadata Spark job either."""
    import pyarrow as pa

    sch = pa.schema([
        ("cid", pa.int32()), ("c", pa.list_(pa.float64())),
        ("meta", pa.string()),
    ])
    t = pa.Table.from_pylist(
        [{"cid": i, "c": [float(x) for x in c], "meta": meta}
         for i, c in enumerate(centroids)], schema=sch)
    if _fs.is_dir(cdir):  # overwrite semantics of the old Spark write
        _fs.rmtree(cdir)
    _fs.makedirs(cdir)
    _fs.write_table_atomic(f"{cdir}/part-00000.parquet", t)
    _fs.write_bytes_atomic(f"{cdir}/_SUCCESS", b"")


def _read_centroids(cdir: str):
    """(centroids, meta dict) from the centroids table — driver-side
    pyarrow read (kilobytes), sorted by cid. Reads Spark-written
    (pre-round-13) and pyarrow-written tables alike."""
    parts = [f"{cdir}/{n}" for n in _fs.listdir(cdir)
             if n.endswith(".parquet") and not n.startswith(("_", "."))]
    d = _fs.read_table(parts).to_pydict()
    rows = sorted(zip(d["cid"], d["c"], d["meta"]), key=lambda r: r[0])
    meta = json.loads(rows[0][2])
    return [list(c) for _, c, _ in rows], meta


def _settle_refit(base: str) -> None:
    """Finish (or undo) a refit swap a crash left dangling. The refit
    protocol is stage-complete → rename base aside → rename stage in →
    delete old; a crash between the renames leaves BOTH full copies on
    disk (never data loss). Roll FORWARD when the staged rebuild is
    complete (Spark's ``_SUCCESS`` on its last-written table), roll
    back to the pre-refit copy otherwise; clear leftovers once a live
    index exists. Single-writer, like every maintenance op here."""
    stage, old = f"{base}__refit", f"{base}__old"
    if not _fs.is_dir(base):
        if _fs.exists(f"{stage}/centroids/_SUCCESS"):
            _fs.rename(stage, base)  # roll forward: rebuild completed
        elif _fs.is_dir(old):
            _fs.rename(old, base)    # roll back: serve the pre-refit copy
    if _fs.is_dir(base):
        for leftover in (stage, old):
            if _fs.is_dir(leftover):
                _fs.rmtree(leftover)


def load_ivf_index(spark: SparkSession, name: str, root: str | None = None):
    """(corpus(id, vec, cid), centroids, meta) — centroids are collected
    (n_centroids rows, bounded by construction) so the probe expressions
    inline them as literals, same as the live path."""
    base = f"{root or _index_root(spark)}/{name}"
    _settle_refit(base)
    centroids, meta = _read_centroids(f"{base}/centroids")
    corpus = spark.read.parquet(f"{base}/vectors")
    return corpus, centroids, meta


def ivf_topk_indexed(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    k: int = 5,
    *,
    n_probe: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    id_col: str = "vec_id",
    root: str | None = None,
) -> DataFrame:
    """IVF top-k against a saved index — no refit, no reassignment, and
    the broadcast probe join dynamically prunes unprobed cid partitions
    out of the scan."""
    corpus, centroids, meta = load_ivf_index(spark, name, root)
    return ivf_probe_rank(
        corpus, queries, k=k, n_probe=n_probe,
        n_centroids=meta["n_centroids"], dim=meta["dim"], centroids=centroids,
        q_id_col=q_id_col, q_vec_col=q_vec_col, id_col=id_col,
    )


@_index_mutator('append')
def add_to_ivf_index(
    df: DataFrame,
    name: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    root: str | None = None,
) -> None:
    """INCREMENTAL index maintenance: assign a batch of NEW vectors to
    the saved index's existing centroids and APPEND them to the
    cid-partitioned layout — the corpus already indexed is never read,
    rewritten, or shuffled (same incremental contract as
    ``sources.dedup_index``). Serving code (``ivf_topk_indexed``) sees
    the union immediately; results are bit-identical to a full rebuild
    with the same centroids because assignment is a pure function of
    (vector, centroids).

    Centroids are NOT refit — at serving scale they are a versioned
    artifact; drift beyond what the fitted centroids represent is a
    rebuild decision, not an append. Uniqueness of ids across batches
    is the caller's contract (same as every dedup/index operator).
    """
    spark = df.sparkSession
    base = f"{root or _index_root(spark)}/{name}"
    _, centroids, meta = load_ivf_index(spark, name, root)
    if meta.get("format") != 2:
        # a format-1 index stores (id, vec) without v_norm; appending
        # v_norm-bearing rows would create a mixed-schema directory where
        # schema inference (no mergeSchema) silently nulls one side's
        # norms and cosine ranks go wrong with no error. Refuse.
        raise ValueError(
            f"index {name!r} is format {meta.get('format', 1)} (pre-v_norm); "
            "rebuild it with save_ivf_index before appending"
        )
    asg = ivf_assign(
        df, vec_col, id_col,
        n_centroids=meta["n_centroids"], dim=meta["dim"], centroids=centroids,
    )
    asg.repartition("cid").write.mode("append").partitionBy("cid").parquet(
        f"{base}/vectors"
    )


def ivf_index_health(
    spark: SparkSession,
    name: str,
    *,
    root: str | None = None,
    skew_threshold: float = 3.0,
    empty_threshold: float = 0.25,
) -> dict:
    """Index-health report from the cid-partitioned layout alone — the
    operational signal for WHEN to refit (the zonemap layer's
    ``layout_health`` idea, applied to the vector index).

    ``add_to_ivf_index`` assigns appended batches against the ORIGINAL
    centroids by design; if the appended distribution drifts, a few hot
    lists absorb most new vectors while others stay empty, and recall
    decays SILENTLY — ``n_probe`` lists cover a shrinking share of the
    corpus and the probed lists' candidates crowd out true neighbors
    that landed in overfull lists. List-size skew (max/mean over the
    CONFIGURED list count) and the empty-list share are exactly the
    observable symptoms, and both come from one bounded aggregate:
    ``groupBy(cid).count()`` over the partition column — n_centroids
    result rows, no vector bytes decoded.

    ``needs_refit`` = skew ≥ ``skew_threshold`` or empty share ≥
    ``empty_threshold``. A freshly k-means-fit index sits near skew ~1-2
    and empty share 0; drifted-append fixtures in the tests cross both.
    """
    corpus, _, meta = load_ivf_index(spark, name, root)
    n_c = int(meta["n_centroids"])
    rows = corpus.groupBy("cid").count().collect()  # bounded: ≤ n_c rows
    sizes = {int(r["cid"]): int(r["count"]) for r in rows}
    total = sum(sizes.values())
    nonempty = sum(1 for s in sizes.values() if s > 0)
    mean = total / max(1, n_c)
    mx = max(sizes.values(), default=0)
    skew = (mx / mean) if mean else 0.0
    empty_share = 1.0 - nonempty / max(1, n_c)
    # an EMPTY corpus trivially has empty_share 1.0, but a k-means refit
    # over zero vectors can only fail or thrash — never flag it (and
    # refit_ivf_index independently refuses), round-9 advisor finding
    needs = total > 0 and (
        skew >= skew_threshold or empty_share >= empty_threshold)
    return {
        "rows": total,
        "lists": n_c,
        "nonempty_lists": nonempty,
        "max_list": mx,
        "mean_list": round(mean, 2),
        "skew": round(skew, 3),
        "empty_share": round(empty_share, 3),
        "needs_refit": needs,
    }


@_index_mutator('refit')
def refit_ivf_index(
    spark: SparkSession,
    name: str,
    *,
    root: str | None = None,
    skew_threshold: float = 3.0,
    empty_threshold: float = 0.25,
    sample: int = 4096,
    impl: str = "column",
    force: bool = False,
) -> dict:
    """Re-fit centroids and re-partition the stored corpus ONLY when
    :func:`ivf_index_health` crosses a threshold (or ``force=True``) —
    the maintenance complement of ``add_to_ivf_index``: appends stay
    O(batch) forever, and this rebuild runs rarely, gated by the
    health report, restoring balanced lists (and with them recall at a
    given ``n_probe``).

    The rebuild is STAGED next to the live index (``{name}__refit``) —
    the live copy is the rebuild's input and stays intact (and
    servable) until the staged copy is complete, then two renames swap
    it in; a crash at any point leaves at least one full copy on disk
    and :func:`_settle_refit` (run by every load) rolls forward or
    back. Round-9 advisor finding: the previous in-place overwrite
    guarded only by a localCheckpoint could permanently lose the
    corpus on an executor failure mid-overwrite. This is a REBUILD by
    definition and is priced accordingly; the health gate is what
    keeps it rare. Refuses an EMPTY index even under ``force`` (a
    k-means fit over zero vectors cannot succeed). Returns the
    pre-rebuild health dict plus ``refit: bool``."""
    h = ivf_index_health(
        spark, name, root=root,
        skew_threshold=skew_threshold, empty_threshold=empty_threshold)
    if h["rows"] == 0 or not (force or h["needs_refit"]):
        return {"refit": False, **h}
    base = f"{root or _index_root(spark)}/{name}"
    corpus, _, meta = load_ivf_index(spark, name, root)
    df = corpus.select(F.col("id").alias("vec_id"),
                       F.col("vec").alias("embedding"))
    save_ivf_index(
        df, f"{name}__refit", vec_col="embedding", id_col="vec_id",
        n_centroids=int(meta["n_centroids"]), dim=int(meta["dim"]),
        sample=sample, root=root, impl=impl)
    _fs.rename(base, f"{base}__old")
    _fs.rename(f"{base}__refit", base)
    _fs.rmtree(f"{base}__old")
    return {"refit": True, **h}


@_index_mutator('save')
def save_ivfpq_index(
    df: DataFrame,
    name: str,
    codebooks,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    dim: int,
    sample: int = 4096,
    centroids=None,
    root: str | None = None,
    impl: str = "column",
    store_vectors: bool = False,
) -> list[list[float]]:
    """Persist the IVF-PQ index: (id, codes) partitioned by cid — the
    corpus compressed to ``n_sub`` bytes per vector, one inverted list
    per partition directory — plus a small meta table carrying the
    centroids AND the PQ codebooks (JSON). This is the 100 TB serving
    artifact: what's stored, scanned and joined is codes, never raw
    vectors; unprobed lists are pruned at the file level (DPP).

    ``store_vectors=True`` additionally persists the raw vectors
    (id, vec, v_norm) cid-partitioned under ``{base}/vectors`` — the
    FAISS refine-tier layout: candidate scans stay codes-only, and the
    exact re-rank (:func:`ivfpq_topk_rerank_indexed`) reads raw vectors
    only for the shortlisted ids' lists.

    Returns the (possibly fitted) coarse centroids.
    """
    spark = df.sparkSession
    base = f"{root or _index_root(spark)}/{name}"
    if centroids is None:
        centroids = fit_centroids(
            df, vec_col, id_col, n_centroids=n_centroids, sample=sample
        )
    enc = ivfpq_encode(
        df, codebooks, vec_col, id_col,
        n_centroids=n_centroids, dim=dim, centroids=centroids, impl=impl,
    )
    enc.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
        f"{base}/codes"
    )
    if store_vectors:
        # same centroids + impl ⇒ identical cid per id (assignment is a
        # pure function), so the rerank join's (cid, id) keys line up
        asg = ivf_assign(
            df, vec_col, id_col,
            n_centroids=n_centroids, dim=dim, centroids=centroids, impl=impl,
        )
        asg.repartition("cid").write.mode("overwrite").partitionBy(
            "cid").parquet(f"{base}/vectors")
    meta = json.dumps(
        {
            "dim": dim,
            "n_centroids": n_centroids,
            "format": 1,
            "codebooks": [[list(map(float, c)) for c in book] for book in codebooks],
        }
    )
    _write_centroids(f"{base}/centroids", centroids, meta)
    return centroids


def load_ivfpq_index(spark: SparkSession, name: str, root: str | None = None):
    """(codes(id, codes, cid), centroids, codebooks, meta)."""
    base = f"{root or _index_root(spark)}/{name}"
    centroids, meta = _read_centroids(f"{base}/centroids")
    codes = spark.read.parquet(f"{base}/codes")
    return codes, centroids, meta["codebooks"], meta


def ivfpq_topk_indexed(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    k: int = 5,
    *,
    n_probe: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    root: str | None = None,
) -> DataFrame:
    """IVF-PQ top-k against a saved index — no refit, no re-encode; the
    broadcast probe join dynamically prunes unprobed cid partitions and
    the scan reads 8-byte codes, not vectors."""
    codes, centroids, codebooks, meta = load_ivfpq_index(spark, name, root)
    return ivfpq_probe_rank(
        codes, queries, codebooks, k=k,
        n_centroids=meta["n_centroids"], n_probe=n_probe, dim=meta["dim"],
        centroids=centroids, q_id_col=q_id_col, q_vec_col=q_vec_col,
    )


def ivfpq_topk_rerank_indexed(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    k: int = 5,
    *,
    n_probe: int = 4,
    shortlist_mult: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    root: str | None = None,
) -> DataFrame:
    """IVF-PQ with the exact re-rank tier, against a saved index built
    with ``store_vectors=True``: the ADC pass scans 8-byte codes under
    DPP and shortlists ``shortlist_mult·k`` ids per query; the stored
    raw vectors are then read ONLY for the shortlist's (cid, id) keys
    (broadcast join → file-level pruning of unshortlisted lists) and
    re-scored with exact cosine — recall recovers to near-exact while
    the corpus-wide scan stays codes-only."""
    codes, centroids, codebooks, meta = load_ivfpq_index(spark, name, root)
    base = f"{root or _index_root(spark)}/{name}"
    if not _fs.is_dir(f"{base}/vectors"):
        raise ValueError(
            f"index {name!r} was saved without store_vectors=True — "
            "the exact re-rank tier needs the raw vectors; rebuild with "
            "save_ivfpq_index(..., store_vectors=True)")
    vectors = spark.read.parquet(f"{base}/vectors")
    return ivfpq_rerank_topk(
        codes, vectors, queries, codebooks, k=k,
        n_centroids=meta["n_centroids"], n_probe=n_probe, dim=meta["dim"],
        centroids=centroids, shortlist_mult=shortlist_mult,
        q_id_col=q_id_col, q_vec_col=q_vec_col,
    )
