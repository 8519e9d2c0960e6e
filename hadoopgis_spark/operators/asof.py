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

__all__ = ["asof_join", "asof_join_broadcast", "asof_join_bucketed"]


def _directed(impl, left, right, on, by, direction, tolerance, suffix):
    """Run a backward-only strategy in either direction: forward is the
    time-mirrored backward problem — negate ``on`` on both sides,
    delegate, un-negate the output times."""
    if direction == "backward":
        return impl(left, right, on, by, tolerance, suffix)
    out = impl(
        left.withColumn(on, -F.col(on)),
        right.withColumn(on, -F.col(on)),
        on,
        by,
        tolerance,
        suffix,
    )
    matched_t = on + suffix
    return out.withColumn(on, -F.col(on)).withColumn(matched_t, -F.col(matched_t))


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
        left frame is never shuffled), ``"bucketed"`` (delegates to
        :func:`asof_join_bucketed`; the skew-proof prefix-scan shape),
        or ``"auto"`` (broadcast when the right side fits under
        ``hgs.broadcastRowThreshold`` rows, same probe as the spatial
        join's auto mode). All strategies serve both directions —
        forward runs as the time-mirrored backward problem.

    Returns the left frame with the matched right payload columns (and
    ``on + suffix`` = the matched right time), null where no match.

    Null handling / determinism: right rows with a NULL time are
    dropped at entry in every strategy (a null ``rt`` can never satisfy
    ``rt <= t``); left rows with a NULL time are kept and match nothing
    — identical across strategies. When the right side holds DUPLICATE
    ``(by, on)`` rows, which row's payload wins the tie is
    strategy-dependent (the shuffle scan takes the last in partition
    order, broadcast/bucketed take the max payload struct) —
    pre-aggregate the right side to unique ``(by, on)`` pairs when
    cross-strategy bit-parity matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if strategy not in ("shuffle", "broadcast", "bucketed", "auto"):
        raise ValueError("strategy must be 'shuffle', 'broadcast', 'bucketed', or 'auto'")
    if strategy == "bucketed":
        return _directed(
            asof_join_bucketed, left, right, on, by, direction, tolerance, suffix
        )
    if strategy == "auto":
        threshold = int(
            left.sparkSession.conf.get("hgs.broadcastRowThreshold", "5000")
        )
        small = right.limit(threshold + 1).count() <= threshold
        strategy = "broadcast" if small else "shuffle"
    if strategy == "broadcast":
        return _directed(
            asof_join_broadcast, left, right, on, by, direction, tolerance, suffix
        )
    keys = [by] if isinstance(by, str) else list(by)
    for c in keys + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist in both frames")

    # a null right time can never satisfy rt <= t; dropping such rows up
    # front also keeps the three strategies bit-identical on them (the
    # window's nulls-first sort would otherwise let one seed last())
    right = right.filter(F.col(on).isNotNull())
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
    right = right.filter(F.col(on).isNotNull())  # see asof_join null note
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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    tolerance: int | float | None = None,
    suffix: str = "_right",
    n_buckets: int = 32,
) -> DataFrame:
    """Skew-proof backward as-of join: the union-merge shape with the
    per-key running ``last`` decomposed as a parallel prefix scan.

    :func:`asof_join` windows over the join key alone, so a key holding
    30% of a 100 TB fact table serializes into one task. Here time is
    cut into ``n_buckets`` ranges (bounds from one scalar min/max agg)
    and the scan splits two-level, the textbook prefix-sum shape:

    1. *Carry rows*: per ``(key, bucket)``, the latest right row —
       ``max(struct(t, payload))`` with map-side partials, so even the
       hot key contributes ≤ ``n_buckets`` rows. A tiny window over the
       (densified) per-bucket table yields ``carry(k, b)`` = latest
       right in any EARLIER bucket.
    2. *Injection*: each non-null carry becomes a synthetic right row
       that sorts FIRST in its bucket (null time + side −1), unioned
       into the big frame — seeding the scan costs no join and no
       second sort of the big side.
    3. *Within bucket*: hash-partition on ``(key, bucket)`` — the hot
       key now spreads over ``n_buckets`` tasks — and the running
       ``last`` starts from the injected carry.

    The big side still shuffles and sorts exactly once (same plan shape
    as :func:`asof_join`, finer partition key). Results are
    bit-identical to :func:`asof_join` (pinned in tests) given unique
    right-side ``(by, on)`` pairs — with duplicates the tie-winning
    payload is strategy-dependent (see :func:`asof_join`'s null /
    determinism note); null times are handled identically everywhere.

    Requires a NUMERIC time column (epoch numbers — the engine's
    canonical event time is epoch-nanos BIGINT); use :func:`asof_join`
    for raw timestamp columns.
    """
    keys = [by] if isinstance(by, str) else list(by)
    for c in keys + [on]:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist in both frames")
    right = right.filter(F.col(on).isNotNull())  # see asof_join null note
    payload = [c for c in right.columns if c not in keys and c != on]
    r_cols = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_t = on + suffix

    r_struct = F.struct(
        F.col(on).alias("__rt"),
        *[F.col(c).alias(a) for c, a in r_cols.items()],
    )
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType

    # bucket boundaries must span BOTH sides' time ranges: bounds from
    # one side alone would CLAMP the other side's out-of-range rows into
    # the edge buckets — correct (clamping is monotone) but it silently
    # re-concentrates the hot key the whole strategy exists to split
    # ONE union aggregate for both sides' bounds (round 13: two
    # sequential per-side collects paid two fixed-latency jobs — and at
    # scale two passes — for four scalars; min/max skip nulls, so the
    # union's bounds equal the old min-of-mins/max-of-maxes exactly)
    brow = (
        left.select(F.col(on).alias("__t"))
        .unionByName(right.select(F.col(on).alias("__t")))
        .agg(F.min("__t").alias("lo"), F.max("__t").alias("hi"))
        .collect()[0]
    )
    lo, hi = brow.lo, brow.hi
    if lo is None or lo == hi:
        return asof_join(left, right, on, by, "backward", tolerance, suffix)
    if not isinstance(lo, (int, float)):
        raise ValueError(
            f"asof_join_bucketed requires a numeric time column; {on!r} has "
            f"values like {lo!r} — convert timestamps to epoch numbers or "
            "use asof_join (shuffle strategy)"
        )
    span = hi - lo

    def bucket(t):
        # double arithmetic: int inputs overflow the *n_buckets under
        # ANSI; correctness only needs bucket(t) monotone in t, which
        # IEEE rounding preserves
        raw = (
            (t.cast("double") - float(lo)) * float(n_buckets) / float(span)
        ).cast("long")
        return F.greatest(F.lit(0).cast("long"), F.least(raw, F.lit(n_buckets - 1).cast("long")))

    # NULL left times must match nothing (the shuffle strategy's
    # behavior): least/greatest SKIP nulls, so bucket(null) would clamp
    # into the LAST bucket where the row sits after that bucket's carry
    # seed and wrongly picks it up. Bucket -1 holds no rights and no
    # carry — the running last() finds nothing there.
    def l_bucket(t):
        return F.when(t.isNull(), F.lit(-1).cast("long")).otherwise(bucket(t))

    l_tagged = left.select(
        *[F.col(c) for c in keys],
        l_bucket(F.col(on)).alias("__b"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        bucket(F.col(on)).alias("__b"),
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )

    # carry: latest right per (k, bucket), then latest over EARLIER
    # buckets. The grid is DENSIFIED to every (key, bucket) pair — a left
    # row whose bucket holds no rights must still see the carry from
    # earlier buckets. Still right-side-sized: n_right_keys × n_buckets.
    per_bucket = r_tagged.groupBy(*keys, "__b").agg(F.max("__r").alias("__last"))
    grid = (
        r_tagged.select(*keys)
        .distinct()
        .withColumn(
            "__b",
            F.explode(
                F.sequence(F.lit(0), F.lit(n_buckets - 1)).cast("array<long>")
            ),
        )
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t_type = left.schema[on].dataType
    carry_rows = (
        grid.join(per_bucket, keys + ["__b"], "left")
        .select(*keys, "__b", F.max("__last").over(wb).alias("__carry"))
        .filter(F.col("__carry").isNotNull())
        .select(
            *keys,
            "__b",
            # null time + side -1 sorts FIRST within the bucket (nulls
            # first under ascending), so the running last() is seeded
            # before any real row of the bucket
            F.lit(None).cast(t_type).alias("__t"),
            F.lit(-1).alias("__side"),
            F.lit(None).cast(l_type).alias("__l"),
            F.col("__carry").alias("__r"),
        )
    )

    u = l_tagged.unionByName(r_tagged).unionByName(carry_rows)
    w = (
        Window.partitionBy(*keys, "__b")
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
    out.append(F.col("__m.__rt").alias(matched_t))
    out.extend(F.col(f"__m.{a}").alias(a) for a in r_cols.values())
    return filled.select(*out)
