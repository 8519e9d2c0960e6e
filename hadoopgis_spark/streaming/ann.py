"""Streaming ANN serving: micro-batches of query vectors against the
persisted IVF index.

The online half of the vector pipeline: the corpus is indexed offline
(``sources.vector_index`` — fitted centroids, cid-partitioned lists,
precomputed norms) and queries ARRIVE as a stream. Each micro-batch is
assigned to its probe lists, joined against the static index, and
ranked — a stream-static join plus one streaming aggregation, no refit
and no corpus rescan, ever.

Why not the batch rank? ``ivf_probe_rank``'s top-k is a window
(``row_number`` over qid), and window functions are unsupported on
streaming frames. The stream-safe equivalent ranks by AGGREGATION:
``collect_list`` the candidate structs per query, ``array_sort`` with
an explicit (cosine desc, id asc) comparator, ``slice`` k — legal after
a streaming groupBy in update mode, and exactly the per-query bounded
work the window would do (candidates per query ≤ the probed lists'
rows; the sort is per-group, never global).

State: one row per distinct query id (its current top-k), updated if a
query's candidates span micro-batches. A production deployment bounds
it by watermarking the query stream on arrival time; the operator
accepts any upstream watermark unchanged.

Both faces build the IDENTICAL logical plan from
``ivf_probe_candidates`` — the batch face is the oracle-checked gate
(``stream_ann_batch``), the stream face is pinned to it by a real
two-micro-batch pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.operators.similarity import ivf_probe_candidates
from hadoopgis_spark.sources.vector_index import load_ivf_index

__all__ = ["grouped_topk", "ann_serve", "streaming_ann_topk"]


def grouped_topk(cand: DataFrame, k: int, q_id_col: str = "q_id",
                 id_col: str = "vec_id") -> DataFrame:
    """Stream-safe per-query top-k over a ``(qid, id, cosine)``
    candidate frame: ``(q_id, rank, vec_id, cosine)`` with rank 1..k by
    (cosine desc, id asc) — the window-free form of the ANN rank stage.
    Selection and ordering use the UNROUNDED cosine; only the emitted
    value is rounded (same contract as the batch gates)."""
    item = F.struct(F.col("cosine").alias("c"), F.col("id").alias("i"))

    def cmp(left, right):
        return (
            F.when(left["c"] > right["c"], F.lit(-1))
            .when(left["c"] < right["c"], F.lit(1))
            .when(left["i"] < right["i"], F.lit(-1))
            .when(left["i"] > right["i"], F.lit(1))
            .otherwise(F.lit(0))
        )

    top = F.slice(F.array_sort(F.collect_list(item), cmp), 1, k)
    g = cand.groupBy("qid").agg(top.alias("__top"))
    return g.select(
        F.col("qid").alias(q_id_col),
        F.posexplode("__top").alias("pos", "t"),
    ).select(
        q_id_col,
        (F.col("pos") + 1).cast("bigint").alias("rank"),
        F.col("t.i").alias(id_col),
        F.round("t.c", 6).alias("cosine"),
    )


def ann_serve(
    spark: SparkSession,
    queries: DataFrame,
    name: str,
    k: int = 5,
    *,
    n_probe: int = 4,
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    id_col: str = "vec_id",
    root: str | None = None,
) -> DataFrame:
    """Serve top-k ANN from the saved IVF index ``name`` for a batch OR
    streaming ``queries`` frame — one logical plan for both faces."""
    corpus, centroids, meta = load_ivf_index(spark, name, root)
    cand = ivf_probe_candidates(
        corpus, queries, n_probe=n_probe,
        n_centroids=meta["n_centroids"], dim=meta["dim"], centroids=centroids,
        q_id_col=q_id_col, q_vec_col=q_vec_col, id_col=id_col,
    )
    return grouped_topk(cand, k, q_id_col=q_id_col, id_col=id_col)


# the stream face is the same function — alias for discoverability
streaming_ann_topk = ann_serve
