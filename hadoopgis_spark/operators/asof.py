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

__all__ = ["asof_join", "asof_join_broadcast"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_right",
    strategy: str = "shuffle",
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
    strategy: ``"shuffle"`` (union-merge, scales to any right side),
        ``"broadcast"`` (delegates to :func:`asof_join_broadcast`; the
        left frame is never shuffled — requires ``backward``), or
        ``"auto"`` (broadcast when the right side fits under
        ``hgs.broadcastRowThreshold`` rows, same probe as the spatial
        join's auto mode).

    Returns the left frame with the matched right payload columns (and
    ``on + suffix`` = the matched right time), null where no match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if strategy not in ("shuffle", "broadcast", "auto"):
        raise ValueError("strategy must be 'shuffle', 'broadcast', or 'auto'")
    if strategy == "auto" and direction == "backward":
        threshold = int(
            left.sparkSession.conf.get("hgs.broadcastRowThreshold", "5000")
        )
        small = right.limit(threshold + 1).count() <= threshold
        strategy = "broadcast" if small else "shuffle"
    if strategy == "broadcast":
        if direction != "backward":
            raise ValueError("strategy='broadcast' supports direction='backward' only")
        return asof_join_broadcast(left, right, on, by, tolerance, suffix)
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


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    tolerance: int | float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join for a BROADCASTABLE right side — zero shuffle
    of the left frame.

    The scale rationale: the dominant as-of workload joins a huge fact
    stream against a small history table (currency rates, config
    versions, sensor calibrations). :func:`asof_join` shuffles BOTH
    sides on the key; here the right side is collapsed to one sorted
    struct array per key (``sort_array(collect_list(...))`` — the only
    shuffle, over the small side), broadcast, hash-joined, and the match
    is ``filter(arr, rt <= t)[-1]`` — a per-row JVM array scan. The left
    frame is never shuffled, so the operator composes with Structured
    Streaming as a stateless stream-static enrichment (same plan, no
    watermark needed).

    Per-key history should be modest (the array scan is linear); for
    big-right workloads use :func:`asof_join`.
    """
    keys = [by] if isinstance(by, str) else list(by)
    for c in keys + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist in both frames")
    payload = [c for c in right.columns if c not in keys and c != on]
    r_cols = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_t = on + suffix

    hist = right.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(on).alias("__rt"),
                    *[F.col(c).alias(a) for c, a in r_cols.items()],
                )
            )
        ).alias("__hist")
    )
    j = left.join(F.broadcast(hist), keys, "left")
    lo = F.col(on) - F.lit(tolerance) if tolerance is not None else None

    def pick(arr):
        eligible = F.filter(
            arr,
            (lambda s: (s["__rt"] <= F.col(on)) & (s["__rt"] >= lo))
            if tolerance is not None
            else (lambda s: s["__rt"] <= F.col(on)),
        )
        # try_: ANSI mode (Spark 4 default) makes element_at THROW on an
        # empty eligible set instead of returning null
        return F.try_element_at(eligible, F.lit(-1))

    # let-bind via transform-over-singleton: element_at(<filter expr>, -1)
    # would otherwise inline the filter into every struct-field access
    m = F.transform(F.array(F.coalesce(F.col("__hist"), F.array())), pick)[0]
    out = [F.col(c) for c in left.columns]
    out.append(m["__rt"].alias(matched_t))
    out.extend(m[a].alias(a) for a in r_cols.values())
    return j.select(*out)
