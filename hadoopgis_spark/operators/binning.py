"""Quantile binning / feature bucketization.

The feature-prep primitive for training pipelines (and the histogram
primitive for profiling): fit cut points on a numeric column, then map
each value to a bin index.

* ``fit_quantile_bins`` — the FIT is driver-bounded by construction:
  ``approxQuantile`` (Greenwald-Khanna sketch, mergeable partials, one
  pass, no sort) by default; ``exact=True`` switches to Spark's exact
  ``percentile`` aggregate (full value shuffle — small-data/test use,
  same contract split as profile_table's exact/HLL NDV).
* ``bin_index`` — a pure Column expression: one ``aggregate`` fold over
  the (tiny, literal) cut array counting cuts ≤ x. The cuts are fitted
  constants broadcast in the plan, so applying bins is map-side and
  pushdown-friendly; no UDF, no join.

Bin semantics: ``bin = #{c in cuts : x >= c}`` — cuts of length k-1
produce bins 0..k-1, lower-inclusive (x == cut lands in the upper
bin), NULL in → NULL out.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_quantile_bins", "bin_index", "with_bins"]


def fit_quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    *,
    exact: bool = False,
    relative_error: float = 1e-3,
) -> list[float]:
    """Interior cut points (length ``n_bins - 1``) splitting ``col``
    into ``n_bins`` quantile bins."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    probs = [i / n_bins for i in range(1, n_bins)]
    if exact:
        arr = ", ".join(repr(p) for p in probs)
        row = df.agg(F.expr(f"percentile({col}, array({arr}))").alias("p")).collect()[0]
        return [float(v) for v in row.p]
    return [float(v) for v in df.approxQuantile(col, probs, relative_error)]


def bin_index(col, cuts: Sequence[float]) -> Column:
    """Bin index of ``col`` against ascending ``cuts`` as a pure Column
    fold — ``#{c : col >= c}``."""
    c = F.col(col) if isinstance(col, str) else col
    if sorted(cuts) != list(cuts):
        raise ValueError("cuts must be ascending")
    arr = F.array(*[F.lit(float(x)) for x in cuts])
    fold = F.aggregate(
        arr, F.lit(0), lambda acc, cut: acc + F.when(c >= cut, 1).otherwise(0)
    )
    # (NULL >= cut) is NULL -> otherwise(0): without the guard a NULL
    # value would land in bin 0 instead of propagating
    return F.when(c.isNotNull(), fold)


def with_bins(df: DataFrame, col: str, cuts: Sequence[float],
              out_col: str = "bin") -> DataFrame:
    return df.withColumn(out_col, bin_index(col, cuts))
