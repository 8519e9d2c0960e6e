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

from hadoopgis_spark.functions.vector import cosine

__all__ = [
    "brute_force_topk",
    "hyperplane_buckets",
    "lsh_topk",
    "centroid",
    "ivf_assign",
    "ivf_topk",
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
    """Exact top-k by cosine for each query vector (queries broadcast)."""
    pairs = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(q_id_col)
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        pairs.withColumn("cosine", cosine(F.col(q_vec_col), F.col(vec_col)))
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
    dim: int | None = None,
) -> DataFrame:
    """(id, vec, bucket): sign-sketch bucket string of each vector.

    Dot products run as ``zip_with`` + ``aggregate`` over an array
    literal of plane coefficients — a compact plan (an unrolled
    per-dimension sum makes Janino compile seconds of generated code
    per plane; the array form is milliseconds to plan and the per-row
    fold matches the oracle's left-to-right summation order).
    """
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).limit(1).collect()
        if not first:
            return df.sparkSession.createDataFrame([], "id long, vec array<float>, bucket string")
        dim = first[0].d
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane_coeff(table, p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.concat(*bits).alias("bucket"),
    )


def centroid(c: int, dim: int) -> list[float]:
    """Deterministic pseudo-random IVF centroid (md5-derived components
    in [-1, 1), same scheme as ``_plane_coeff``). A production deployment
    would swap in k-means centroids fitted on a sample; the assignment /
    probe / rank dataflow below is identical either way."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"ivf:{c}:{d}".encode()).hexdigest()[:8], 16)
        out.append(h / 2147483648.0 - 1.0)
    return out


def _centroid_scores(vec, n_centroids: int, dim: int):
    """array<struct(s, cid)>: one score per centroid. argmin of L2
    distance == argmax of (v·c − |c|²/2), so each centroid costs one
    linear ``zip_with``+``aggregate`` fold plus a driver-side constant.
    The whole table is ONE ``transform`` over a constant struct array —
    a single lambda body in codegen instead of n_centroids unrolled
    copies (CLAUDE.md's nested-expression trap)."""
    entries = []
    for c in range(n_centroids):
        comps = centroid(c, dim)
        entries.append(
            F.struct(
                F.array(*[F.lit(x) for x in comps]).alias("c"),
                F.lit(sum(x * x for x in comps) / 2.0).alias("h"),
                F.lit(c).alias("cid"),
            )
        )
    table = F.array(*entries)

    def score(s):
        dot = F.aggregate(
            F.zip_with(vec, s["c"], lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        return F.struct((dot - s["h"]).alias("s"), s["cid"].alias("cid"))

    return F.transform(table, score)


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int = 16,
    dim: int,
) -> DataFrame:
    """(id, vec, cid): each vector assigned to its nearest centroid —
    the IVF build side. One narrow projection, no shuffle; the inverted
    'lists' are just a cid column a downstream join equi-partitions on."""
    v = F.col(vec_col).cast("array<double>")
    best = F.array_max(_centroid_scores(v, n_centroids, dim))
    return df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), best["cid"].alias("cid")
    )


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
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in nearest-centroid
    lists; each query probes its ``n_probe`` nearest lists and ranks
    candidates by exact cosine. The 100 TB shape: the corpus scan is
    embarrassingly parallel, the candidate join is cid-equi (shuffle
    keyed on ≤ n_centroids values — broadcast the probe side when small),
    and no all-pairs product ever forms. Recall < 1 by construction;
    raise n_probe toward n_centroids to trade cost for recall."""
    asg = ivf_assign(corpus, vec_col, id_col, n_centroids=n_centroids, dim=dim)
    qv = F.col(q_vec_col).cast("array<double>")
    probes = queries.select(
        F.col(q_id_col).alias("qid"),
        F.col(q_vec_col).alias("qvec"),
        F.explode(_centroid_scores(qv, n_centroids, dim)).alias("z"),
    ).select("qid", "qvec", F.col("z.s").alias("s"), F.col("z.cid").alias("cid"))
    wp = Window.partitionBy("qid").orderBy(F.col("s").desc(), F.col("cid").desc())
    probes = (
        probes.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("qid", "qvec", "cid")
    )
    cand = asg.join(F.broadcast(probes), "cid").filter(F.col("qid") != F.col("id"))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        cand.withColumn("cosine", cosine(F.col("qvec"), F.col("vec")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("qid").alias(q_id_col), F.col("id").alias(id_col), "cosine")
    )


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
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: union of per-table bucket joins, exact cosine
    rank within candidates. Increasing n_tables raises recall. Pass
    ``dim`` when known — it avoids a schema-probe job per table."""
    cand = None
    for t in range(n_tables):
        cb = hyperplane_buckets(corpus, vec_col, id_col, n_planes=n_planes, table=t, dim=dim)
        qb = hyperplane_buckets(queries, q_vec_col, q_id_col, n_planes=n_planes, table=t, dim=dim)
        c = cb.join(
            qb.select(F.col("id").alias("qid"), F.col("vec").alias("qvec"), "bucket"),
            "bucket",
        ).select(F.col("qid"), F.col("id"), F.col("qvec"), F.col("vec"))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.filter(F.col("qid") != F.col("id")).dropDuplicates(["qid", "id"])
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        cand.withColumn("cosine", cosine(F.col("qvec"), F.col("vec")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("qid").alias(q_id_col), F.col("id").alias(id_col), "cosine")
    )
