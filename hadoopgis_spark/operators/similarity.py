"""Similarity search over embedding columns (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k of query vectors against the
  corpus: broadcast the (small) query set, JVM fold for the dot product,
  window rank. The correctness baseline.
* ``hyperplane_buckets`` / ``lsh_topk`` — random-hyperplane LSH (Charikar
  '02 sign sketch): bucket = sign bits of h·v for n deterministic
  pseudo-random hyperplanes. The scale path: candidates share a bucket
  (multi-probe over bands), so the join is bucket-equi instead of
  all-pairs. Recall < 1 by construction — callers choose n_planes /
  n_tables for their recall target.

Hyperplane components are derived from md5 of (table, plane, dim) —
deterministic, no runtime RNG, reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoopgis_spark.functions.vector import cosine_from, dot, norm

__all__ = [
    "brute_force_topk",
    "hyperplane_buckets",
    "lsh_topk",
    "centroid",
    "lloyd_fit",
    "fit_centroids",
    "ivf_assign",
    "ivf_topk",
    "ivf_probe_rank",
    "ivf_probe_candidates",
    "fit_pq_codebooks",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_encode",
    "ivfpq_probe_rank",
    "ivfpq_rerank_topk",
    "fit_sq_bounds",
    "sq_encode",
    "sq_topk",
]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (queries broadcast).

    Norms are computed once per ROW on each side before the cross join
    (the fold behind ``norm`` is CodegenFallback and would otherwise
    re-run per candidate pair); the per-pair work is the single dot."""
    c2 = corpus.withColumn("__vn", norm(F.col(vec_col)))
    q2 = queries.withColumn("__qn", norm(F.col(q_vec_col)))
    pairs = c2.crossJoin(F.broadcast(q2)).filter(
        F.col(id_col) != F.col(q_id_col)
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        pairs.withColumn(
            "cosine",
            cosine_from(dot(F.col(q_vec_col), F.col(vec_col)), F.col("__qn"), F.col("__vn")),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(q_id_col, id_col, "cosine")
    )


def _plane_coeff(table: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1) —
    md5-derived on the driver (bit-identical to the SQL oracle's
    inlined constants)."""
    import hashlib

    h = int(hashlib.md5(f"hp:{table}:{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_planes: int = 8,
    table: int = 0,
    dim: int,
) -> DataFrame:
    """(id, vec, bucket): sign-sketch bucket string of each vector.

    Dot products run as ``zip_with`` + ``aggregate`` over an array
    literal of plane coefficients — a compact plan (an unrolled
    per-dimension sum makes Janino compile seconds of generated code
    per plane; the array form is milliseconds to plan and the per-row
    fold matches the oracle's left-to-right summation order).

    ``dim`` is required: it sizes the hyperplane literals at plan time,
    so building the bucket column never runs a schema-probe job (the
    old ``limit(1).collect()`` default launched one Spark job per LSH
    table before any real work started).
    """
    v_sql = _vec_sql(vec_col)
    bits = ", ".join(
        "CASE WHEN "
        + _fold_dot_sql(v_sql, _darr([_plane_coeff(table, p, d)
                                      for d in range(dim)]))
        + " >= 0 THEN '1' ELSE '0' END"
        for p in range(n_planes))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.expr(f"concat({bits})").alias("bucket"),
    )


def centroid(c: int, dim: int) -> list[float]:
    """Deterministic pseudo-random IVF centroid (md5-derived components
    in [-1, 1), same scheme as ``_plane_coeff``). The data-free fallback:
    recall on clustered real embeddings is poor because nothing pulls
    these toward the data's density — fit real centroids with
    ``fit_centroids`` / ``lloyd_fit`` and pass them to ``ivf_assign`` /
    ``ivf_topk``; the assignment / probe / rank dataflow is identical."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"ivf:{c}:{d}".encode()).hexdigest()[:8], 16)
        out.append(h / 2147483648.0 - 1.0)
    return out


def lloyd_fit(
    vectors,
    n_centroids: int,
    *,
    iters: int = 8,
    seed: int = 0,
) -> list[list[float]]:
    """Deterministic k-means (k-means++ init, fixed Lloyd iterations)
    over an in-memory sample. Pure numpy, seeded RNG, no Spark — the
    output is a plain list of lists ready to inline as plan literals
    (and, for the gates, as oracle-SQL constants: both engines embed
    the same driver-side numbers, so parity is automatic).

    Empty clusters reseed to the point farthest from its assigned
    centroid, so the fit always returns exactly ``n_centroids`` rows.
    """
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    if x.ndim != 2 or len(x) < n_centroids:
        raise ValueError(f"need >= {n_centroids} sample vectors, got shape {x.shape}")
    rng = np.random.default_rng(seed)
    # k-means++: spread the initial centroids by squared-distance weight
    idx = [int(rng.integers(len(x)))]
    d2 = np.full(len(x), np.inf)
    for _ in range(1, n_centroids):
        d2 = np.minimum(d2, ((x - x[idx[-1]]) ** 2).sum(axis=1))
        tot = d2.sum()
        if tot <= 0:
            idx.append(int(rng.integers(len(x))))
        else:
            r = np.searchsorted(np.cumsum(d2 / tot), rng.random())
            idx.append(int(min(r, len(x) - 1)))
    c = x[idx].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
        a = d.argmin(axis=1)
        for j in range(n_centroids):
            members = x[a == j]
            c[j] = members.mean(axis=0) if len(members) else x[d.min(axis=1).argmax()]
    return [[float(v) for v in row] for row in c]


def fit_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 0,
) -> list[list[float]]:
    """Fit IVF centroids on a bounded deterministic sample of ``df``.

    Sampling is ``ORDER BY xxhash64(id) LIMIT sample`` — Spark plans it
    as TakeOrderedAndProject (per-partition top-N, driver merge), so the
    scan stays embarrassingly parallel and the driver never holds more
    than ``sample`` vectors: the same bounded-sample/broadcast-result
    pattern as the tile partitioners. The fit itself is ``lloyd_fit``.
    """
    rows = (
        df.select(
            F.xxhash64(F.col(id_col)).alias("_h"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .orderBy("_h")
        .limit(sample)
        .collect()
    )
    return lloyd_fit([r._v for r in rows], n_centroids, iters=iters, seed=seed)


# ---------------------------------------------------------------------------
# SQL-text expression builders (round 13). The unrolled centroid/LUT
# trees used to be assembled node-by-node through the py4j bridge —
# thousands of F.lit/F.aggregate round trips per query, measured at
# 10-38 s of pure DataFrame-CONSTRUCTION time for the PQ gates (the
# Spark jobs themselves took ~1-4 s). Generating the IDENTICAL Catalyst
# tree as one SQL string costs one parse in the JVM: same operators,
# same left-associated fold order, and literals round-trip exactly
# (repr() is the shortest form whose nearest double is the value; the
# 'D' suffix keeps the parser in DOUBLE — bare decimals are DECIMAL in
# Spark SQL, same as DuckDB).
# ---------------------------------------------------------------------------

def _dlit(x) -> str:
    """Exact SQL double literal for ``x`` (bit-identical round trip)."""
    r = repr(float(x))
    if r in ("inf", "-inf", "nan"):
        return {"inf": "CAST('Infinity' AS DOUBLE)",
                "-inf": "CAST('-Infinity' AS DOUBLE)",
                "nan": "CAST('NaN' AS DOUBLE)"}[r]
    return r + "D"


def _darr(vals) -> str:
    return "array(" + ", ".join(_dlit(x) for x in vals) + ")"


def _vec_sql(col_name: str) -> str:
    return f"CAST(`{col_name}` AS ARRAY<DOUBLE>)"


def _fold_dot_sql(vec_sql: str, arr_sql: str) -> str:
    """The module's one dot-product fold, as SQL text — the same
    ``aggregate(zip_with(...))`` nodes (and left-to-right summation
    order) the Column form built, so every oracle tree still matches."""
    return (f"aggregate(zip_with({vec_sql}, {arr_sql}, (x, y) -> x * y), "
            "0.0D, (acc, t) -> acc + t)")


def _centroid_scores_sql(vec_sql: str, n_centroids: int, dim: int,
                         centroids=None) -> str:
    """array<struct(s, cid)>: one score per centroid. argmin of L2
    distance == argmax of (v·c − |c|²/2), so each centroid costs one
    linear ``zip_with``+``aggregate`` fold plus a driver-side constant.
    The whole table is ONE ``transform`` over a constant struct array —
    a single lambda body in codegen instead of n_centroids unrolled
    copies (CLAUDE.md's nested-expression trap)."""
    entries = []
    for c in range(n_centroids):
        comps = list(centroids[c]) if centroids is not None else centroid(c, dim)
        entries.append(
            f"named_struct('c', {_darr(comps)}, "
            f"'h', {_dlit(sum(x * x for x in comps) / 2.0)}, 'cid', {c})"
        )
    table = "array(" + ", ".join(entries) + ")"
    return (f"transform({table}, s -> named_struct("
            f"'s', {_fold_dot_sql(vec_sql, 's.c')} - s.h, 'cid', s.cid))")


def _probe_slice_sql(vec_sql: str, n_centroids: int, dim: int, centroids,
                     n_probe: int) -> str:
    """Top-``n_probe`` centroid probes as a per-row sorted slice —
    ``array_sort`` on array<struct<s, cid>> orders (s asc, cid asc);
    ``reverse`` gives exactly the probe order (s desc, cid desc). The
    ONE definition of the probe tie-break contract, shared by IVF and
    IVF-PQ so the two paths (and their mirrored oracle SQL) can never
    desynchronize. No window, no exchange on the query side."""
    scores = _centroid_scores_sql(vec_sql, n_centroids, dim, centroids)
    return f"slice(reverse(array_sort({scores})), 1, {n_probe})"


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int = 16,
    dim: int,
    centroids=None,
    impl: str = "column",
) -> DataFrame:
    """(id, vec, cid, v_norm): each vector assigned to its nearest
    centroid — the IVF build side. One narrow projection, no shuffle;
    the inverted 'lists' are just a cid column a downstream join
    equi-partitions on. ``v_norm`` is the vector's L2 norm, computed
    HERE (once per corpus row, at build/index time) so the serve-side
    rank stage never re-evaluates a norm fold per candidate pair.

    ``centroids`` (list of ``n_centroids`` × ``dim`` floats, e.g. from
    ``fit_centroids``) overrides the md5 pseudo-random fallback.

    ``impl``:

    * ``"column"`` (default) — JVM Column expressions whose fold order
      exactly matches the DuckDB oracle SQL; the gates' exactness path.
      The folds are CodegenFallback (interpreted), so at 100 TB the
      assign costs ~n_centroids·dim interpreted multiplies per row.
    * ``"arrow"`` — Arrow-batched ``mapInPandas``: one numpy
      ``V @ C.T`` per batch, ~10-40× less CPU per row (measured in
      BASELINE.md round 6). Ties break to the HIGHER cid, matching the
      column path exactly; the only possible divergence from "column"
      is the float summation order of the dot (numpy pairwise vs
      left-assoc), which can flip an assignment only when two centroid
      scores agree to within a few ulps — agreement is asserted
      exhaustively in tests on real fixtures. Use for production-scale
      builds; keep "column" where bit-exact oracle parity is required.
    """
    if impl == "arrow":
        return _ivf_assign_arrow(
            df, vec_col, id_col,
            n_centroids=n_centroids, dim=dim, centroids=centroids,
        )
    if impl != "column":
        raise ValueError(f"impl must be 'column' or 'arrow', got {impl!r}")
    best = F.expr("array_max(" + _centroid_scores_sql(
        _vec_sql(vec_col), n_centroids, dim, centroids) + ")")
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        best["cid"].alias("cid"),
        norm(F.col(vec_col)).alias("v_norm"),
    )


def _ivf_assign_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    n_centroids: int,
    dim: int,
    centroids=None,
) -> DataFrame:
    """Arrow-batched assignment (see ``ivf_assign(impl="arrow")``).
    Same column names as the column path; the id column keeps its input
    type, and ``vec`` is emitted as array<double> (the column path
    passes the input array type through — downstream rank stages cast
    to double either way)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(
        [list(c) for c in centroids]
        if centroids is not None
        else [centroid(c, dim) for c in range(n_centroids)],
        dtype=np.float64,
    )
    half = (C * C).sum(axis=1) / 2.0
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id {id_type}, vec array<double>, cid int, v_norm double"

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            scores = V @ C.T - half
            # ties to the HIGHER cid, matching array_max over (s, cid)
            # structs: argmax over the reversed axis, index flipped back
            cid = (C.shape[0] - 1) - np.argmax(scores[:, ::-1], axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "vec": [list(map(float, v)) for v in V],
                    "cid": cid.astype("int32"),
                    "v_norm": np.sqrt((V * V).sum(axis=1)),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int,
    centroids=None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in nearest-centroid
    lists; each query probes its ``n_probe`` nearest lists and ranks
    candidates by exact cosine. The 100 TB shape: the corpus scan is
    embarrassingly parallel, the candidate join is cid-equi (shuffle
    keyed on ≤ n_centroids values — broadcast the probe side when small),
    and no all-pairs product ever forms. Recall < 1 by construction;
    raise n_probe toward n_centroids to trade cost for recall.

    Pass fitted ``centroids`` (``fit_centroids`` over a bounded sample,
    the standard offline IVF train step) for real recall on clustered
    data; the md5 fallback keeps the dataflow runnable without a fit."""
    asg = ivf_assign(
        corpus, vec_col, id_col, n_centroids=n_centroids, dim=dim, centroids=centroids
    )
    return ivf_probe_rank(
        asg, queries, k=k, n_probe=n_probe, n_centroids=n_centroids, dim=dim,
        centroids=centroids, q_id_col=q_id_col, q_vec_col=q_vec_col, id_col=id_col,
    )


def ivf_probe_rank(
    asg: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_probe: int,
    n_centroids: int,
    dim: int,
    centroids=None,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query side of IVF over an already-assigned corpus (``asg`` =
    (id, vec, cid), from :func:`ivf_assign` or loaded from a saved
    index): probe the ``n_probe`` best lists per query, broadcast the
    probes onto the cid-keyed corpus, rank candidates by exact cosine.
    When ``asg`` is read from cid-PARTITIONED storage, the broadcast
    equi-join triggers dynamic partition pruning — only the probed
    lists are read at all.

    Probe selection is an ``array_sort`` + ``slice`` of the per-row
    centroid-score array (s desc, cid desc — the struct sort order
    reversed), not a window: no exchange on the query side. The query
    norm is computed once per query row and the corpus norm rides in
    from ``ivf_assign``'s ``v_norm`` (projected here once per corpus
    row for pre-norm ``asg`` frames, e.g. an index saved by an older
    format) — the per-pair rank work is a single dot."""
    cand = ivf_probe_candidates(
        asg, queries, n_probe=n_probe, n_centroids=n_centroids, dim=dim,
        centroids=centroids, q_id_col=q_id_col, q_vec_col=q_vec_col,
        id_col=id_col,
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("qid").alias(q_id_col), F.col("id").alias(id_col), "cosine")
    )


def ivf_probe_candidates(
    asg: DataFrame,
    queries: DataFrame,
    *,
    n_probe: int,
    n_centroids: int,
    dim: int,
    centroids=None,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """Candidate stage of IVF serving: ``(qid, id, cosine)`` for every
    (query, probed-list member) pair — everything in
    :func:`ivf_probe_rank` EXCEPT the per-query top-k, which batch
    callers apply as a window and streaming callers as a stream-safe
    grouped sort (windows are unsupported on streams; see
    ``streaming.ann``).

    On a batch ``queries`` frame the (tiny) probe side is broadcast
    onto the cid-keyed corpus — the DPP-pruning shape. On a STREAMING
    frame the probe side cannot carry a broadcast hint (unsupported on
    streams), so the join is written stream-first and UNHINTED: Spark
    broadcasts the static corpus when it fits the threshold, else
    shuffles it per micro-batch — acceptable for modest indexes only.
    For a large persisted index, serve streams via ``foreachBatch``
    with the BATCH path (probe broadcast + DPP partition pruning);
    that, not this join, is the at-scale streaming route."""
    probe_arr = F.expr(_probe_slice_sql(
        _vec_sql(q_vec_col), n_centroids, dim, centroids, n_probe))
    probes = queries.select(
        F.col(q_id_col).alias("qid"),
        F.col(q_vec_col).alias("qvec"),
        norm(F.col(q_vec_col)).alias("__qn"),
        probe_arr.alias("__pa"),
    ).select("qid", "qvec", "__qn", F.explode("__pa").alias("z")).select(
        "qid", "qvec", "__qn", F.col("z.cid").alias("cid")
    )
    if "v_norm" not in asg.columns:
        asg = asg.withColumn("v_norm", norm(F.col("vec")))
    if queries.isStreaming:
        cand = probes.join(asg, "cid").filter(F.col("qid") != F.col("id"))
    else:
        cand = asg.join(F.broadcast(probes), "cid").filter(F.col("qid") != F.col("id"))
    return cand.withColumn(
        "cosine",
        cosine_from(dot(F.col("qvec"), F.col("vec")), F.col("__qn"), F.col("v_norm")),
    ).select("qid", "id", "cosine")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    n_planes: int = 8,
    n_tables: int = 2,
    n_flip_probes: int = 0,
    dim: int,
) -> DataFrame:
    """Approximate top-k: union of per-table bucket joins, exact cosine
    rank within candidates. Increasing n_tables raises recall. ``dim``
    is required (see ``hyperplane_buckets``) so no schema-probe job
    ever runs.

    ``n_flip_probes`` > 0 enables MULTI-PROBE (Lv et al., VLDB'07):
    each query additionally probes the buckets obtained by flipping its
    first ``n_flip_probes`` sign bits — recall close to doubling
    n_tables at the cost of (n_flip_probes+1) probe rows per query
    instead of another full corpus hash pass. The probe fan-out stays
    on the (small) query side; the corpus is still hashed once per
    table and joined by bucket equality — never scanned per probe."""
    cand = None
    for t in range(n_tables):
        cb = hyperplane_buckets(
            corpus, vec_col, id_col, n_planes=n_planes, table=t, dim=dim
        ).withColumn("v_norm", norm(F.col("vec")))
        qb = hyperplane_buckets(
            queries, q_vec_col, q_id_col, n_planes=n_planes, table=t, dim=dim
        ).withColumn("q_norm", norm(F.col("vec")))
        if n_flip_probes:
            b = F.col("bucket")
            variants = [b]
            for p in range(min(n_flip_probes, n_planes)):
                flipped_bit = F.when(
                    F.substring(b, p + 1, 1) == "1", F.lit("0")
                ).otherwise(F.lit("1"))
                variants.append(
                    F.concat(
                        F.substring(b, 1, p), flipped_bit,
                        F.substring(b, p + 2, n_planes - p - 1),
                    )
                )
            qb = qb.select(
                "id", "vec", "q_norm", F.explode(F.array(*variants)).alias("bucket")
            )
        c = cb.join(
            qb.select(
                F.col("id").alias("qid"), F.col("vec").alias("qvec"), "q_norm", "bucket"
            ),
            "bucket",
        ).select(F.col("qid"), F.col("id"), F.col("qvec"), F.col("vec"), "q_norm", "v_norm")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.filter(F.col("qid") != F.col("id")).dropDuplicates(["qid", "id"])
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        cand.withColumn(
            "cosine",
            cosine_from(dot(F.col("qvec"), F.col("vec")), F.col("q_norm"), F.col("v_norm")),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("qid").alias(q_id_col), F.col("id").alias(id_col), "cosine")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the Jégou et al. '11 ANN compression scheme
# ---------------------------------------------------------------------------

def fit_pq_codebooks(
    vectors,
    *,
    dim: int,
    n_sub: int = 8,
    n_codes: int = 16,
    iters: int = 8,
    seed: int = 0,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks over an in-memory sample
    (``n_sub`` codebooks × ``n_codes`` centroids × ``dim/n_sub`` floats).
    Same driver-side, literal-inlineable contract as :func:`lloyd_fit` —
    the gates embed the identical numbers into the oracle SQL."""
    if dim % n_sub:
        raise ValueError(f"dim={dim} not divisible by n_sub={n_sub}")
    d_sub = dim // n_sub
    books = []
    for m in range(n_sub):
        sub = [list(v[m * d_sub:(m + 1) * d_sub]) for v in vectors]
        books.append(lloyd_fit(sub, n_codes, iters=iters, seed=seed + m))
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): each vector compressed to ``n_sub`` small codes —
    nearest codebook centroid per subspace (argmin L2 == argmax of
    v·c − |c|²/2, ties to the higher code, matching the oracle's
    ``ORDER BY s DESC, k DESC``).

    Map-only: encoding runs inside the scan stage; at 100 TB the codes
    (8 bytes/vector here vs 256 for the raw floats) are what you
    materialize, shuffle, and scan — the raw embedding column is only
    touched at encode time.
    """
    n_sub = len(codebooks)
    d_sub = len(codebooks[0][0])
    v_sql = _vec_sql(vec_col)
    codes = ", ".join(
        "array_max(" + _centroid_scores_sql(
            f"slice({v_sql}, {m * d_sub + 1}, {d_sub})",
            len(codebooks[m]), d_sub, codebooks[m]) + ").cid"
        for m in range(n_sub))
    return df.select(F.col(id_col).alias("id"),
                     F.expr(f"array({codes})").alias("codes"))


def _adc_lut_sql(q_sql: str, codebooks) -> str:
    """The per-query ADC lookup table ``lut[m][k] = q_sub·c`` as SQL
    text — the same unrolled array-of-arrays of dot folds the Column
    form built (one fold per (subspace, code)), one JVM parse instead
    of ~n_sub·n_codes py4j-assembled folds."""
    n_codes = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    mats = []
    for m in range(len(codebooks)):
        sub = f"slice({q_sql}, {m * d_sub + 1}, {d_sub})"
        mats.append("array(" + ", ".join(
            _fold_dot_sql(sub, _darr(codebooks[m][kk]))
            for kk in range(n_codes)) + ")")
    return "array(" + ", ".join(mats) + ")"


def _adc_score(n_sub: int):
    """Σ_m lut[m][codes[m]]: UNROLLED (n_sub is small and fixed) rather
    than an F.aggregate fold — higher-order functions are
    CodegenFallback, so the fold would run interpreted once per
    candidate pair; the unrolled sum stays inside whole-stage codegen.
    Left-associated like the fold, so the floats are identical."""
    score = None
    for m in range(n_sub):
        term = F.element_at(
            F.element_at(F.col("__lut"), m + 1),
            F.element_at(F.col("codes"), m + 1) + 1,
        )
        score = term if score is None else score + term
    return score


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Approximate inner-product top-k via asymmetric distance
    computation (ADC): the corpus is scanned as PQ codes only; each
    query precomputes a lookup table ``lut[m][k] = q_sub·c`` ONCE
    (``n_sub × n_codes`` small dots per query row), and every
    query-vector pair costs just ``n_sub`` table lookups + adds —
    8 adds here versus the 64 multiplies of an exact dot.

    Composability note: this is the PQ half of IVF-PQ — gate the
    candidate set with :func:`ivf_topk`'s centroid lists first and feed
    the survivors here when the corpus is too big even for a code scan.

    Returns (q_id, id, pq_dot, rank): top-``k`` by approximated inner
    product, ties to the lower id.
    """
    n_sub = len(codebooks)

    enc = pq_encode(corpus, codebooks, vec_col, id_col)
    lut = F.expr(_adc_lut_sql(_vec_sql(q_vec_col), codebooks))
    q = queries.select(
        F.col(q_id_col).alias("q_id"), lut.alias("__lut")
    )

    score = _adc_score(n_sub)
    pairs = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "id", score.alias("pq_dot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("pq_dot").desc(), F.col("id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "pq_dot", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int,
    centroids=None,
) -> DataFrame:
    """Full IVF-PQ (Jégou et al. '11): IVF lists gate WHICH vectors are
    scored, PQ codes decide HOW cheaply. The corpus is assigned to
    centroid lists and encoded to subspace codes in ONE map-only
    projection (the raw vector is dropped before any shuffle — at
    100 TB the candidate join moves 8-byte codes, not 256-byte floats);
    each query probes its ``n_probe`` lists and ADC-scores only those
    candidates via its lookup table.

    Returns (q_id, id, pq_dot, rank) — approximate inner-product top-k
    within the probed lists.
    """
    enc = ivfpq_encode(
        corpus, codebooks, vec_col, id_col,
        n_centroids=n_centroids, dim=dim, centroids=centroids,
    )
    return ivfpq_probe_rank(
        enc, queries, codebooks, k=k, n_centroids=n_centroids, n_probe=n_probe,
        dim=dim, centroids=centroids, q_id_col=q_id_col, q_vec_col=q_vec_col,
    )


def ivfpq_encode(
    corpus: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int,
    dim: int,
    centroids=None,
    impl: str = "column",
) -> DataFrame:
    """(id, cid, codes): the IVF-PQ build side — nearest centroid list
    AND subspace codes in ONE map-only projection. This is what a
    persisted IVF-PQ index stores: 8-byte codes instead of 256-byte
    vectors, partitioned by cid.

    ``impl="arrow"`` batches the whole encode through numpy (one
    ``V @ C.T`` per table per Arrow batch) — the production-build fast
    path with the same tie-to-higher-code contract as the default
    column expressions (see ``ivf_assign``'s impl note for the exact
    trade-off)."""
    if impl == "arrow":
        return _ivfpq_encode_arrow(
            corpus, codebooks, vec_col, id_col,
            n_centroids=n_centroids, dim=dim, centroids=centroids,
        )
    if impl != "column":
        raise ValueError(f"impl must be 'column' or 'arrow', got {impl!r}")
    n_sub = len(codebooks)
    n_codes = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    v_sql = _vec_sql(vec_col)
    best = F.expr("array_max(" + _centroid_scores_sql(
        v_sql, n_centroids, dim, centroids) + ")")
    codes = ", ".join(
        "array_max(" + _centroid_scores_sql(
            f"slice({v_sql}, {m * d_sub + 1}, {d_sub})",
            n_codes, d_sub, codebooks[m]) + ").cid"
        for m in range(n_sub))
    return corpus.select(
        F.col(id_col).alias("id"),
        best["cid"].alias("cid"),
        F.expr(f"array({codes})").alias("codes"),
    )


def _ivfpq_encode_arrow(
    corpus: DataFrame,
    codebooks,
    vec_col: str,
    id_col: str,
    *,
    n_centroids: int,
    dim: int,
    centroids=None,
) -> DataFrame:
    """Arrow-batched IVF-PQ encode (see ``ivfpq_encode(impl="arrow")``)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(
        [list(c) for c in centroids]
        if centroids is not None
        else [centroid(c, dim) for c in range(n_centroids)],
        dtype=np.float64,
    )
    half = (C * C).sum(axis=1) / 2.0
    books = [np.asarray([list(c) for c in book], dtype=np.float64) for book in codebooks]
    halves = [(B * B).sum(axis=1) / 2.0 for B in books]
    n_sub = len(books)
    d_sub = books[0].shape[1]
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"id {id_type}, cid int, codes array<int>"

    def argmax_high(scores):
        # ties to the HIGHER index, matching array_max over (s, cid)
        return (scores.shape[1] - 1) - np.argmax(scores[:, ::-1], axis=1)

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cid = argmax_high(V @ C.T - half)
            codes = np.empty((len(V), n_sub), dtype=np.int32)
            for m in range(n_sub):
                sub = V[:, m * d_sub:(m + 1) * d_sub]
                codes[:, m] = argmax_high(sub @ books[m].T - halves[m])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "cid": cid.astype("int32"),
                    "codes": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)


def ivfpq_probe_rank(
    enc: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int,
    *,
    n_centroids: int,
    n_probe: int,
    dim: int,
    centroids=None,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Query side of IVF-PQ over an already-encoded corpus (``enc`` =
    (id, cid, codes), from :func:`ivfpq_encode` or loaded from a saved
    index): per-query ADC lookup table + sorted-slice probe list in one
    projection, broadcast onto the cid-keyed codes, ``n_sub`` lookups
    + adds per candidate. Over a cid-PARTITIONED saved index the
    broadcast equi-join dynamically prunes unprobed lists at the file
    level — the serve-at-scale shape."""
    n_sub = len(codebooks)
    q_sql = _vec_sql(q_vec_col)
    lut = F.expr(_adc_lut_sql(q_sql, codebooks))
    # one projection computes the ADC lut ONCE per query row alongside
    # the sorted-sliced probe list; the explode then fans out only
    # n_probe rows per query, each carrying the precomputed lut values.
    # No per-probe lut re-evaluation, no window exchange on the query side.
    probe_arr = F.expr(_probe_slice_sql(
        q_sql, n_centroids, dim, centroids, n_probe))
    probes = queries.select(
        F.col(q_id_col).alias("qid"),
        lut.alias("__lut"),
        probe_arr.alias("__pa"),
    ).select("qid", "__lut", F.explode("__pa").alias("z")).select(
        "qid", "__lut", F.col("z.cid").alias("cid")
    )

    cand = (
        enc.join(F.broadcast(probes), "cid")
        .filter(F.col("qid") != F.col("id"))
        .select("cid", "qid", "id", _adc_score(n_sub).alias("pq_dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("pq_dot").desc(), F.col("id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id_col), "id", "pq_dot", "rank")
    )


def ivfpq_rerank_topk(
    enc: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    *,
    n_centroids: int,
    n_probe: int,
    dim: int,
    centroids=None,
    shortlist_mult: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact-cosine re-rank over an ADC shortlist — the standard
    recall-recovery tier for IVF-PQ (the FAISS ``IndexRefine`` idea,
    Jégou et al. '11 §V.B): per-pair ADC error is unbounded, so the
    top-k BY ADC can miss true neighbors; instead, rank
    ``shortlist_mult·k`` candidates by ADC and re-score ONLY those
    against the stored raw vectors. The codes scan still never touches
    vectors; raw vectors are read for shortlisted ids alone — a
    bounded join (n_queries × mult·k rows, broadcast). When
    ``vectors`` carries the ``cid`` list id (a saved index's vectors
    table), the shortlist join includes it, so over a cid-partitioned
    layout unshortlisted lists are pruned at the file level (DPP).

    ``vectors`` = (id, vec[, v_norm][, cid]) — ``ivf_assign`` output or
    a saved index's vectors table; assignment must use the SAME
    centroids as ``enc`` (assignment is a pure function, so any rebuild
    with the same centroids matches).

    Returns (q_id, id, cosine, rank): exact cosine, per-query top-k of
    the shortlist; with a full probe and a shortlist covering every
    candidate this IS exact top-k — the gate's oracle construction."""
    n_sub = len(codebooks)
    q_sql = _vec_sql(q_vec_col)
    lut = F.expr(_adc_lut_sql(q_sql, codebooks))
    probe_arr = F.expr(_probe_slice_sql(
        q_sql, n_centroids, dim, centroids, n_probe))
    probes = queries.select(
        F.col(q_id_col).alias("qid"),
        lut.alias("__lut"),
        probe_arr.alias("__pa"),
    ).select("qid", "__lut", F.explode("__pa").alias("z")).select(
        "qid", "__lut", F.col("z.cid").alias("cid")
    )
    cand = (
        enc.join(F.broadcast(probes), "cid")
        .filter(F.col("qid") != F.col("id"))
        .select("cid", "qid", "id", _adc_score(n_sub).alias("pq_dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("pq_dot").desc(), F.col("id"))
    short = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= shortlist_mult * k)
        .select("cid", "qid", "id")
    )
    # raw query vectors + norms ride the (small) shortlist side
    qside = queries.select(
        F.col(q_id_col).alias("qid"),
        F.col(q_vec_col).alias("qvec"),
        norm(F.col(q_vec_col)).alias("__qn"),
    )
    short = short.join(qside, "qid")
    if "v_norm" not in vectors.columns:
        vectors = vectors.withColumn("v_norm", norm(F.col("vec")))
    keys = ["cid", "id"] if "cid" in vectors.columns else ["id"]
    rer = vectors.join(F.broadcast(short), keys)
    w2 = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        rer.withColumn(
            "cosine",
            cosine_from(dot(F.col("qvec"), F.col("vec")),
                        F.col("__qn"), F.col("v_norm")),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id_col), "id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — per-dimension affine int codes, the third
# compression tier next to PQ (coarser than PQ per byte, but decode-free
# scoring with no codebook fit beyond per-dim bounds)
# ---------------------------------------------------------------------------

def fit_sq_bounds(vectors) -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) bounds over an in-memory sample — the only
    'training' scalar quantization needs. Driver-side numpy, literal-
    inlineable (the gates embed the same numbers into the oracle SQL)."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    # degenerate dims (constant value) still need a nonzero scale
    hi = np.where(hi > lo, hi, lo + 1.0)
    return [float(v) for v in lo], [float(v) for v in hi]


def sq_encode(
    df: DataFrame,
    lo: list[float],
    hi: list[float],
    *,
    n_levels: int = 255,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes): each vector quantized to per-dimension integer codes
    ``round((v - lo) / (hi - lo) * n_levels)`` clamped to [0, n_levels]
    — int8-class storage (1 byte/dim vs 4) with NO codebook. Map-only;
    out-of-bound values (beyond the fitted sample's range) clamp, so
    encode never fails on FINITE inputs. Inputs must be finite: under
    ANSI mode (Spark 4 default) a NaN component would throw at the
    int cast — sanitize upstream if the embedding source can emit
    NaN/Inf. Integer codes make downstream scoring exactly
    reproducible cross-engine."""
    if len(lo) != len(hi):
        raise ValueError(f"lo/hi length mismatch: {len(lo)} vs {len(hi)}")
    v_sql = _vec_sql(vec_col)
    lo_sql = _darr(lo)
    scale_sql = _darr([float(n_levels) / (h - l) for l, h in zip(lo, hi)])
    codes = F.expr(
        f"transform(zip_with(zip_with({v_sql}, {lo_sql}, (x, l) -> x - l), "
        f"{scale_sql}, (d, s) -> d * s), "
        f"r -> greatest(0, least({int(n_levels)}, CAST(round(r) AS INT))))")
    return df.select(F.col(id_col).alias("id"), codes.alias("codes"))


def sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    lo: list[float],
    hi: list[float],
    k: int = 5,
    *,
    n_levels: int = 255,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Approximate inner-product top-k over SQ codes: with
    ``recon[d] = lo[d] + codes[d]/scale[d]``, the score
    ``Σ_d q[d]·recon[d]`` splits into a per-query constant
    ``q·lo`` plus ``Σ_d (q[d]/scale[d])·codes[d]`` — both computed ONCE
    per query row; every query-vector pair then costs one fold over the
    integer codes. The corpus is scanned as codes only (the raw vector
    column is never touched after encode), same contract as
    :func:`pq_topk`; compose with IVF lists to gate candidates when a
    full code scan is too much.

    Returns (q_id, id, sq_dot, rank), ties to the lower id."""
    enc = sq_encode(corpus, lo, hi, n_levels=n_levels, vec_col=vec_col, id_col=id_col)
    qv = F.col(q_vec_col).cast("array<double>")
    inv_scale = [(h - l) / float(n_levels) for l, h in zip(lo, hi)]
    qs = F.zip_with(
        qv, F.array(*[F.lit(x) for x in inv_scale]), lambda x, s: x * s
    )
    qlo = F.aggregate(
        F.zip_with(qv, F.array(*[F.lit(x) for x in lo]), lambda x, l: x * l),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), qs.alias("__qs"), qlo.alias("__qlo")
    )
    score = F.col("__qlo") + F.aggregate(
        F.zip_with(F.col("__qs"), F.col("codes"), lambda a, c: a * c.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    pairs = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", "id", score.alias("sq_dot"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sq_dot").desc(), F.col("id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "id", "sq_dot", "rank")
    )
