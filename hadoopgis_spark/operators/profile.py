"""Table profiling: per-column statistics in one aggregation pass.

The ANALYZE-style primitive every large-scale pipeline runs before (and
after) a transformation: row count, null count, distinct count, and
numeric min/max per column — used for skew diagnosis, join-strategy
sizing (`hgs.broadcastRowThreshold`), and data-quality regression
checks between pipeline versions.

Shape: ONE ``df.agg(...)`` computes every metric (Catalyst plans the
multiple DISTINCT aggregates as a single Expand + two-phase hash
aggregate — each input row is replicated once per distinct-column, then
everything partial-aggregates map-side), and a ``stack`` unpivots the
single result row to one row per column. No per-column re-scan.

Scale note: exact NDV shuffles each column's distinct value space
(after map-side dedup inside the Expand aggregate). At 100 TB pass
``exact=False`` to use HLL++ ``approx_count_distinct`` — mergeable
sketch partials, no distinct-value shuffle; the gate pins the exact
variant (deterministic), the approx variant is the documented scale
path (same contract as rel_percentiles / rel_percentiles_approx).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = ["profile_table"]


def profile_table(df: DataFrame, cols: Iterable[str] | None = None,
                  *, exact: bool = True) -> DataFrame:
    """``(col, n_rows, n_nonnull, ndv, vmin, vmax)`` per column.

    ``vmin``/``vmax`` are populated (as double) for numeric columns
    only — cross-engine string/timestamp formatting is not part of the
    contract. NDV counts distinct NON-NULL values.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        ndv = (F.countDistinct(F.col(c)) if exact
               else F.approx_count_distinct(F.col(c)))
        aggs.append(ndv.alias(f"__ndv_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    row = df.agg(*aggs)

    parts = []
    for c in cols:
        lo = f"`__min_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        hi = f"`__max_{c}`" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{c}', `__nn_{c}`, `__ndv_{c}`, {lo}, {hi}")
    stack = (f"stack({len(cols)}, {', '.join(parts)}) "
             "AS (col, n_nonnull, ndv, vmin, vmax)")
    return row.selectExpr("__n AS n_rows", stack).select(
        "col", "n_rows", "n_nonnull", "ndv", "vmin", "vmax")
