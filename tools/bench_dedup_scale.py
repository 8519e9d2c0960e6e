#!/usr/bin/env python
"""Dedup-pipeline scale A/B — the measured form of the "never all-pairs"
claim the registry lint pins structurally.

A synthetic corpus of N docs (default 10M) with a PLANTED 2% near-dup
rate runs the full shingle → MinHash → LSH-band → exact-verify →
cluster pipeline (`operators.dedup`). Recorded in BASELINE.md:

* wall time per stage at N docs on local[32];
* candidate-pair count vs the all-pairs N*(N-1)/2 a naive join would
  score (the scale argument, now a number);
* recall on the planted pair set at the verify threshold (the banding
  parameters' probabilistic guarantee, observed).

Corpus construction is pure Column arithmetic (xxhash64-seeded words,
no Python), deterministic across runs. Doc i with i % 50 == 1 shares
its first 19 words with doc i-1 and differs in the last -> bigram
jaccard 18/20 = 0.9, safely above the 0.7 verify threshold; all other
docs are pseudo-random 20-word strings over a 30k vocabulary. With 16
minhashes in 4 bands of 4, P[candidate | j=0.9] ~ 0.986, so planted
recall should land near that value.

Usage: python tools/bench_dedup_scale.py [N_DOCS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
THRESHOLD = 0.7


def _spark():
    from hadoopgis_spark.session import get_spark
    return get_spark("dedup-scale-ab")


def build_corpus(spark, n: int):
    """(doc_id, text): 20 words each; docs (50g, 50g+1) are planted
    near-dup pairs sharing words 0..18."""
    base_seed = F.when(F.col("id") % 50 == 1, F.col("id") - 1) \
        .otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(18)),
        lambda p: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base_seed, p), F.lit(30_000))),
    )
    last = F.concat(
        F.lit("w"), F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(30_000)))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat(words, F.array(last))).alias("text"),
    )


def main() -> None:
    from hadoopgis_spark.operators.dedup import (
        dup_clusters, jaccard_verify, minhash_lsh_pairs, shingle_sets)

    spark = _spark()
    df = build_corpus(spark, N_DOCS)
    # land the corpus once so stage timings measure the pipeline, not
    # regeneration (real corpora arrive on disk too)
    path = "/tmp/hgs_ab_dedup_corpus"
    t0 = time.time()
    df.repartition(spark.sparkContext.defaultParallelism) \
        .write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    print(f"dedup: corpus {N_DOCS} docs written {time.time() - t0:.1f}s")

    t0 = time.time()
    cand = minhash_lsh_pairs(df, "text", "doc_id",
                             shingle_n=2, n_hashes=16, n_bands=4)
    n_cand = cand.count()
    t_cand = time.time() - t0
    all_pairs = N_DOCS * (N_DOCS - 1) // 2
    print(f"dedup: LSH candidates {n_cand} in {t_cand:.1f}s "
          f"(all-pairs would score {all_pairs:.3e}; "
          f"ratio {n_cand / all_pairs:.2e})")

    t0 = time.time()
    sh = shingle_sets(df, "text", "doc_id", n=2)
    ver = jaccard_verify(cand, sh, THRESHOLD).select("id_1", "id_2")
    ver.persist()
    n_ver = ver.count()
    t_ver = time.time() - t0
    planted = N_DOCS // 50
    n_recalled = ver.filter(
        (F.col("id_2") == F.col("id_1") + 1) & (F.col("id_1") % 50 == 0)
    ).count()
    print(f"dedup: verified(j>={THRESHOLD}) {n_ver} in {t_ver:.1f}s; "
          f"planted recall {n_recalled}/{planted} "
          f"= {n_recalled / planted:.4f}")

    t0 = time.time()
    cl = dup_clusters(ver)
    n_docs_in_cl = cl.count()
    n_cl = cl.select("cluster").distinct().count()
    print(f"dedup: clusters {n_cl} over {n_docs_in_cl} docs "
          f"in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
