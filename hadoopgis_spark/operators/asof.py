"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

For every left row ``(key, t)``, attach the single right row with the
same key and the greatest right time ``rt <= t`` (``direction=
"backward"``, the default) or the least ``rt >= t`` (``"forward"``),
optionally bounded by a ``tolerance`` window. This is the kdb+
``aj`` / pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics,
re-expressed for Spark's shuffle model.

Design (100 TB stance)
----------------------
The naive formulations both fall over at scale: a range-join
(``l.key = r.key AND r.t <= l.t``) explodes to all-pairs-per-key before
a per-left-row argmax, and a correlated subquery isn't expressible.
Instead we use the classic *union-merge* shape:

1. Tag right rows ``side=0`` carrying their payload, left rows
   ``side=1`` with a null payload, and union them (column-aligned).
2. One hash shuffle on ``key``, one per-partition sort on
   ``(key, t, side)`` — exactly the cost of a sort-merge equi-join.
3. ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` fills each left row
   with the most recent right payload at-or-before its time (right rows
   sort first on ties, giving ``<=``).
4. Keep ``side=1`` rows; a tolerance filter nulls out matches older
   than ``t - tolerance``.

Skew note: the shuffle key is the join key alone, so a pathologically
hot key concentrates in one task — but unlike the range-join shape the
per-row state is O(1) (running ``last``), so the hot partition streams
rather than materializing a cross product; AQE can split it since
Spark's window with unbounded-preceding frame is computed via a
running accumulator over the sort, not a re-scan.

``forward`` is implemented by negating the time column and delegating
to ``backward`` — one code path, both directions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time join: latest ``right`` row at-or-before each ``left`` row.

    Parameters
    ----------
    on: time column name, present in BOTH frames (numeric or timestamp;
        must be orderable and negatable for ``direction="forward"``).
    by: equi-join key column(s), present in both frames.
    direction: ``"backward"`` (greatest ``rt <= t``) or ``"forward"``
        (least ``rt >= t``).
    tolerance: if set, matches farther than ``tolerance`` from the left
        time are nulled out (same-unit as ``on``).
    suffix: appended to right-side payload column names that collide
        with left-side names.

    Returns the left frame with the matched right payload columns (and
    ``on + suffix`` = the matched right time), null where no match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [by] if isinstance(by, str) else list(by)
    for c in keys + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist in both frames")

    payload = [c for c in right.columns if c not in keys and c != on]
    # right time travels as payload too, so the caller can see WHICH row matched
    r_cols = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_t = on + suffix

    def _ord(col: Column) -> Column:
        return -col if direction == "forward" else col

    l_tagged = left.select(
        *[F.col(c) for c in keys],
        _ord(F.col(on)).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    _ord(F.col(on)).alias("__rt"),
                    *[F.col(c).alias(a) for c, a in r_cols.items()],
                ).alias("s")
            ).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        _ord(F.col(on)).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType
        ).alias("__l"),
        F.struct(
            _ord(F.col(on)).alias("__rt"),
            *[F.col(c).alias(a) for c, a in r_cols.items()],
        ).alias("__r"),
    )

    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        filled = filled.withColumn(
            "__m",
            F.when(
                F.col("__m.__rt") >= F.col("__t") - F.lit(tolerance), F.col("__m")
            ),
        )
    out = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out.append(_ord(F.col("__m.__rt")).alias(matched_t))
    out.extend(F.col(f"__m.{a}").alias(a) for a in r_cols.values())
    return filled.select(*out)
