#!/usr/bin/env python
"""Scale benchmark for the as-of join (BASELINE.md round-5 additions).

Synthetic fact/history frames derived from ``range()`` (no driver-side
data): LEFT = 20M fact rows over 100k keys, RIGHT = 200k history rows.
Three measurements:

* shuffle strategy (union-merge) at 20M x 200k
* broadcast strategy on the same workload (right side fits)
* shuffle strategy under heavy key skew — ~30% of the left rows land on
  ONE key — to demonstrate the O(1)-state running-window claim (the
  hot partition streams; a range-join formulation would explode)

Prints one line per workload; comparable across rounds (fixed seeds).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoopgis_spark.operators.asof import (
    asof_join,
    asof_join_broadcast,
    asof_join_bucketed,
)
from hadoopgis_spark.session import get_spark

spark = get_spark("asof-bench")

N_LEFT, N_RIGHT, N_KEYS = 20_000_000, 200_000, 100_000


def facts(skew=0):
    """``skew``/10 of the rows land on key 0 (0 = uniform)."""
    df = spark.range(N_LEFT)
    k = (
        F.when(F.col("id") % 10 < skew, F.lit(0)).otherwise(F.col("id") % N_KEYS)
        if skew
        else F.col("id") % N_KEYS
    )
    return df.select(
        k.alias("k"),
        (F.hash("id") % 1_000_000_000).alias("t"),
        F.col("id").alias("lv"),
    )


def history():
    df = spark.range(N_RIGHT)
    return df.select(
        (F.col("id") % N_KEYS).alias("k"),
        # unique (k, t): distinct stride per key position
        (F.expr(f"(id div {N_KEYS}) * 7919") + F.col("id") % N_KEYS).alias("t"),
        (F.col("id") + 5).alias("rv"),
    )


def _cobucketed_query():
    """Serve-time as-of over pre-bucketed storage. The one-time write
    happens in main() BEFORE the timer starts — this builds only the
    serve-side query, so the timed span measures serving alone."""
    from hadoopgis_spark.sources import asof_join_cobucketed

    return asof_join_cobucketed(spark, "asofbench_facts", "asofbench_hist", on="t", by="k")


def main():
    asof_join(facts().limit(10_000), history().limit(1_000), on="t", by="k").count()

    # one-time co-bucketed write, OUTSIDE any serve timing
    from hadoopgis_spark.sources import save_asof_facts, save_asof_history

    t0 = time.time()
    save_asof_facts(facts(), "asofbench_facts", by="k", n_buckets=64, overwrite=False)
    save_asof_history(
        history(), "asofbench_hist", on="t", by="k", n_buckets=64, overwrite=False
    )
    print(f"ASOF cobucketed one-time write: {time.time() - t0:.1f}s", flush=True)

    for label, fn in [
        ("shuffle 20M x 200k", lambda: asof_join(facts(), history(), on="t", by="k")),
        ("broadcast 20M x 200k", lambda: asof_join_broadcast(facts(), history(), on="t", by="k")),
        ("shuffle skewed (30% on one key)", lambda: asof_join(facts(3), history(), on="t", by="k")),
        # broadcast never shuffles the left side, so the hot key costs
        # nothing extra — the skew-immune path when the right side fits
        ("broadcast skewed (30% on one key)", lambda: asof_join_broadcast(facts(3), history(), on="t", by="k")),
        # bucketed splits the hot key across time-range buckets — the
        # skew-proof path when the right side does NOT fit in a broadcast;
        # the win over plain shuffle grows with the hot key's share
        ("shuffle skewed (60% on one key)", lambda: asof_join(facts(6), history(), on="t", by="k")),
        ("bucketed-128 skewed (60% on one key)", lambda: asof_join_bucketed(facts(6), history(), on="t", by="k", n_buckets=128)),
        # co-bucketed storage: shuffle paid ONCE at write; serve joins
        # bucket-locally with zero exchanges (sources/asof_store)
        ("cobucketed serve 20M x 200k (excl. one-time write)", _cobucketed_query),
    ]:
        t0 = time.time()
        # aggregate the MATCHED payload: a bare count() would let the
        # optimizer prune the window / join work entirely
        row = fn().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rv").alias("s"),
            F.count("t_right").alias("m"),
        ).collect()[0]
        print(
            f"ASOF {label}: {row.n} rows ({row.m} matched, sum {row.s}) "
            f"in {time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
