"""Co-bucketed as-of storage: amortize the as-of join's shuffle to
write time — the temporal sibling of ``sources.bucketed`` (spatial).

``asof_join`` shuffles both sides per query; at serving scale the
history table is an artifact. ``save_asof_history`` persists the RIGHT
side as ONE row per key — the key's full history as a time-sorted
struct array — bucketed on the key; ``save_asof_facts`` buckets the
fact table on the same key with the same bucket count. A query-time
``asof_join_cobucketed`` is then a bucket-local join (ZERO exchanges,
plan contract in tests/test_plans.py) plus the same per-row sorted-
array pick as the broadcast strategy — but the history no longer has
to fit in a broadcast: it is distributed across buckets, co-located
with the facts.

Per-key history must fit in one array row (same per-key bound as the
broadcast strategy; cap or window histories upstream if a key can grow
without bound). Bucket specs are recorded in TBLPROPERTIES and
verified at join time — mismatched layouts refuse instead of silently
shuffling.

Skew caveat (measured, BASELINE.md round 6): a hot key concentrates in
one bucket FILE and bucketed scans cannot split a bucket, so heavy key
skew stragglers the scan task itself — use the broadcast strategy
(right side fits) or ``asof_join_bucketed``'s time-range prefix scan
for skewed workloads; this layout's niche is big-right + repeated
serving + roughly uniform keys, where the elided shuffle and the
write-once amortization win.

Cites: reference has no temporal storage; this extends the engine's
bucketed-warehouse pattern (``sources/bucketed.py``) to the spt
extension's domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoopgis_spark.sources.bucketed import _bucket_root, _table_props

__all__ = ["save_asof_history", "save_asof_facts", "asof_join_cobucketed"]


def _keys(by) -> list[str]:
    return [by] if isinstance(by, str) else list(by)


def save_asof_history(
    right: DataFrame,
    table: str,
    on: str,
    by,
    n_buckets: int = 32,
    overwrite: bool = True,
) -> None:
    """Persist the as-of RIGHT side as per-key sorted history arrays,
    bucketed by key: (by..., __hist = sorted array<struct<__rt,
    payload...>>). Null times are dropped (they can never match —
    see ``asof_join``'s null note); the sort makes the query-time pick
    a binary-search-friendly scan identical to the broadcast strategy's."""
    spark = right.sparkSession
    if not overwrite and spark.catalog.tableExists(table):
        return
    keys = _keys(by)
    for c in keys + [on]:
        if c not in right.columns:
            raise ValueError(f"column {c!r} missing from the history frame")
    right = right.filter(F.col(on).isNotNull())
    payload = [c for c in right.columns if c not in keys and c != on]
    hist = right.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(on).alias("__rt"), *[F.col(c) for c in payload])
            )
        ).alias("__hist")
    )
    root = _bucket_root(spark)
    (
        hist.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .mode("overwrite")
        .format("parquet")
        .option("path", f"{root}/{table}")
        .saveAsTable(table)
    )
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'hgs.asofOn'='{on}', 'hgs.asofKeys'='{','.join(keys)}', "
        f"'hgs.asofBuckets'='{n_buckets}', 'hgs.asofRole'='history')"
    )


def save_asof_facts(
    left: DataFrame,
    table: str,
    by,
    n_buckets: int = 32,
    overwrite: bool = True,
) -> None:
    """Bucket the fact table on the as-of key (same ``n_buckets`` as the
    history table) so the enrichment join is bucket-local."""
    spark = left.sparkSession
    if not overwrite and spark.catalog.tableExists(table):
        return
    keys = _keys(by)
    root = _bucket_root(spark)
    (
        left.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .mode("overwrite")
        .format("parquet")
        .option("path", f"{root}/{table}")
        .saveAsTable(table)
    )
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'hgs.asofKeys'='{','.join(keys)}', "
        f"'hgs.asofBuckets'='{n_buckets}', 'hgs.asofRole'='facts')"
    )


def asof_join_cobucketed(
    spark: SparkSession,
    facts_table: str,
    hist_table: str,
    on: str,
    by,
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join of two co-bucketed tables — ZERO exchanges at
    query time (the shuffle was paid once at write). Semantics and the
    per-row pick are identical to ``asof_join_broadcast``: latest
    ``__rt <= t`` within ``tolerance``, null columns where no match.

    Refuses mismatched layouts (different keys or bucket counts would
    silently reintroduce a shuffle or, worse, a wrong-bucket join)."""
    keys = _keys(by)
    fp = _table_props(spark, facts_table)
    hp = _table_props(spark, hist_table)
    if hp.get("hgs.asofRole") != "history" or fp.get("hgs.asofRole") != "facts":
        raise ValueError(
            f"{hist_table!r}/{facts_table!r} were not saved by "
            "save_asof_history/save_asof_facts"
        )
    if fp.get("hgs.asofKeys") != ",".join(keys) or hp.get("hgs.asofKeys") != ",".join(keys):
        raise ValueError(
            f"key mismatch: facts={fp.get('hgs.asofKeys')!r} "
            f"hist={hp.get('hgs.asofKeys')!r} requested={','.join(keys)!r}"
        )
    if fp.get("hgs.asofBuckets") != hp.get("hgs.asofBuckets"):
        raise ValueError(
            f"bucket-count mismatch: facts={fp.get('hgs.asofBuckets')} "
            f"hist={hp.get('hgs.asofBuckets')} — the join would shuffle; "
            "rewrite one side"
        )
    left = spark.table(facts_table)
    hist = spark.table(hist_table)
    left_cols = list(left.columns)
    h_fields = [
        f.name
        for f in hist.schema["__hist"].dataType.elementType.fields
        if f.name != "__rt"
    ]
    r_cols = {c: (c + suffix if c in left_cols else c) for c in h_fields}
    matched_t = on + suffix

    j = left.join(hist, keys, "left")
    lo = F.col(on) - F.lit(tolerance) if tolerance is not None else None

    def pick(arr):
        eligible = F.filter(
            arr,
            (lambda s: (s["__rt"] <= F.col(on)) & (s["__rt"] >= lo))
            if tolerance is not None
            else (lambda s: s["__rt"] <= F.col(on)),
        )
        return F.try_element_at(eligible, F.lit(-1))

    # let-bind via transform-over-singleton (see asof_join_broadcast)
    m = F.transform(F.array(F.coalesce(F.col("__hist"), F.array())), pick)[0]
    out = [F.col(c) for c in left_cols]
    out.append(m["__rt"].alias(matched_t))
    out.extend(m[c].alias(a) for c, a in r_cols.items())
    return j.select(*out)
