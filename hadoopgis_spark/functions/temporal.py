"""Temporal interval predicates (the reference's spt extension).

``Time_interval {start, end}`` with intersects/contains/mindist
(``/root/reference/src/extensions/spt/temporal.h:4-24``,
``temporal_functions.hpp:9-23,75-110``). Intervals are long-epoch pairs;
every predicate is a pure Column expression.

An interval is exactly a degenerate (1-D) MBB, so interval joins run on
the spatial engine unchanged: ``interval_join`` maps (start, end) onto
(xmin..xmax, ymin=ymax=0) and calls ``spatial_join`` — tiles become time
ranges, boundary replication and reference-point dedup work verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "interval_intersects",
    "interval_contains",
    "interval_mindist",
    "with_interval_mbb",
    "interval_join",
    "parse_temporal",
    "temporal_n_intervals",
    "temporal_start",
    "temporal_end",
    "temporal_intersects",
    "temporal_contains",
    "temporal_mindist",
    "temporal_mindist_set",
    "temporal_lit",
    "multi_interval_join",
]


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v) if isinstance(v, str) else F.lit(v)


def interval_intersects(s1, e1, s2, e2) -> Column:
    """Closed-interval overlap (``temporal_functions.hpp:9-14``)."""
    return (_c(s1) <= _c(e2)) & (_c(s2) <= _c(e1))


def interval_contains(s1, e1, s2, e2) -> Column:
    """Interval 1 contains interval 2 (``temporal_functions.hpp:16-23``)."""
    return (_c(s1) <= _c(s2)) & (_c(e1) >= _c(e2))


def interval_mindist(s1, e1, s2, e2) -> Column:
    """Gap between intervals; 0 when overlapping
    (``temporal_functions.hpp:75-110``)."""
    return F.greatest(
        F.lit(0).cast("long"),
        F.greatest(_c(s2) - _c(e1), _c(s1) - _c(e2)),
    )


# ---------------------------------------------------------------------------
# Multi-interval TemporalObject (reference src/extensions/spt/temporal.h:13-24:
# a temporal object is a SET of Time_intervals). All set predicates are pure
# Column expressions over array<struct<start:long, end:long>>.
# ---------------------------------------------------------------------------


def temporal_lit(intervals) -> Column:
    """A TemporalObject literal: list of (start, end) pairs →
    array<struct<start, end>> Column (plan-side constant)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(s)).cast("long").alias("start"),
                F.lit(int(e)).cast("long").alias("end"),
            )
            for s, e in intervals
        ]
    )


def parse_temporal(col) -> Column:
    """Parse the reference's TEMPORAL_UNIX TemporalObject string —
    ``"S E,S E,S"``: comma-separated intervals, space-separated bounds, a
    bare value V meaning the degenerate interval [V, V]
    (``temporal.h:13-24`` ctors, ``temporal_functions.hpp`` TEMPORAL_UNIX
    branch) — into ``array<struct<start:long, end:long>>``.

    Malformed tokens (non-numeric bounds) parse to null starts and are
    filtered out, mirroring the engine-wide malformed-geometry-skip
    discipline (P2). ``try_cast`` keeps ANSI mode from throwing. The
    inner per-token split is let-bound via the transform-over-singleton
    trick (HOFs are CodegenFallback — no CSE; see CLAUDE.md)."""
    toks = F.split(F.trim(_c(col)), ",")

    def one_tok(t):
        def build(p):
            s = F.try_element_at(p, F.lit(1)).try_cast("long")
            e = F.coalesce(
                F.try_element_at(p, F.lit(2)).try_cast("long"), s
            )
            return F.struct(s.alias("start"), e.alias("end"))

        return F.transform(F.array(F.split(F.trim(t), " +")), build)[0]

    parsed = F.transform(toks, one_tok)
    return F.filter(parsed, lambda iv: iv["start"].isNotNull())


def temporal_n_intervals(obj) -> Column:
    """``TemporalObject::getNumIntervals`` (temporal_functions.hpp:63-65)."""
    return F.size(_c(obj))


def temporal_start(obj) -> Column:
    """``getStart`` = first interval's start (temporal_functions.hpp:67-69)."""
    return F.try_element_at(_c(obj), F.lit(1))["start"]


def temporal_end(obj) -> Column:
    """``getEnd`` = LAST interval's end (temporal_functions.hpp:71-73) —
    positional, like the reference (intervals are not re-sorted)."""
    return F.try_element_at(_c(obj), F.lit(-1))["end"]


def temporal_intersects(a, b) -> Column:
    """Set-level intersects: ANY interval of ``a`` overlaps ANY interval
    of ``b`` (closed bounds). This is the INTENDED semantics of
    ``TemporalObject::intersects`` (temporal_functions.hpp:75-86; the
    reference's inner loop increments ``i`` instead of ``j`` — an obvious
    typo this engine does not reproduce)."""
    av, bv = _c(a), _c(b)
    return F.exists(
        av,
        lambda ia: F.exists(
            bv,
            lambda ib: (ia["start"] <= ib["end"]) & (ia["end"] >= ib["start"]),
        ),
    )


def temporal_contains(a, b) -> Column:
    """``TemporalObject::contains`` parity (temporal_functions.hpp:88-96):
    implemented ONLY for single-interval objects, false otherwise —
    exactly the reference's behavior."""
    av, bv = _c(a), _c(b)
    a1 = F.try_element_at(av, F.lit(1))
    b1 = F.try_element_at(bv, F.lit(1))
    return (
        (F.size(av) == 1)
        & (F.size(bv) == 1)
        & (a1["start"] <= b1["start"])
        & (b1["end"] <= a1["end"])
    )


def temporal_mindist(a, b) -> Column:
    """``TemporalObject::mindist`` parity (temporal_functions.hpp:98-110):
    single-interval objects only — 0 on overlap, else the gap; 0 (the
    reference's ``return false``) for multi-interval inputs. Note the
    reference's non-overlap branch takes ``max`` of two expressions that
    are the same value up to sign-abs (``abs(a.start-b.end)`` twice — a
    typo for the standard gap); this engine computes the standard gap,
    which agrees with the reference whenever intervals are well-formed
    (start <= end). Use :func:`temporal_mindist_set` for the set-level
    generalization."""
    av, bv = _c(a), _c(b)
    a1 = F.try_element_at(av, F.lit(1))
    b1 = F.try_element_at(bv, F.lit(1))
    gap = F.greatest(
        F.lit(0).cast("long"),
        F.greatest(b1["start"] - a1["end"], a1["start"] - b1["end"]),
    )
    return F.when((F.size(av) == 1) & (F.size(bv) == 1), gap).otherwise(
        F.lit(0).cast("long")
    )


def temporal_mindist_set(a, b) -> Column:
    """Set-level mindist (the engine's generalization the reference
    leaves unimplemented): min over all interval pairs of the closed
    gap, 0 when any pair overlaps. One ``aggregate`` fold over the
    pairwise minimum — null (no pairs) for empty objects."""
    av, bv = _c(a), _c(b)

    def gap_to_b(ia):
        return F.array_min(
            F.transform(
                bv,
                lambda ib: F.greatest(
                    F.lit(0).cast("long"),
                    F.greatest(ib["start"] - ia["end"], ia["start"] - ib["end"]),
                ),
            )
        )

    return F.array_min(F.transform(av, gap_to_b))


def multi_interval_join(
    a: DataFrame,
    b: DataFrame,
    intervals_col: str = "intervals",
    **spatial_kwargs,
) -> DataFrame:
    """Set-overlap join of two TemporalObject tables: all row pairs where
    ANY interval of one overlaps ANY interval of the other
    (``temporal_intersects`` as a JOIN, not a predicate).

    Scale shape: each side EXPLODES its interval set onto the 1-D tile
    engine (:func:`interval_join` — slc strips over time), so tiling,
    boundary replication, and reference-point dedup all apply per
    interval; the final ``distinct`` over the payload columns collapses
    multiple overlapping interval pairs of the same row pair. Explode
    fan-out is the interval count per object (bounded, small); no
    all-pairs product over objects ever forms.
    """
    if b is None:
        # the exploded frame repeats each object's id once per interval,
        # and the tile engine's self-join pair dedup assumes unique row
        # ids — a silent self multi-interval join would emit ambiguous
        # (x, x) interval self-pairs. Make the caller choose semantics.
        raise ValueError(
            "multi_interval_join has no self-join mode: pass the frame "
            "twice and filter object-id pairs explicitly (exploded "
            "interval rows duplicate object ids, which breaks the tile "
            "engine's unique-id self-join dedup)"
        )
    from hadoopgis_spark.materialize import durable_checkpoint

    az = a.select(*[c for c in a.columns if c != intervals_col],
                  F.explode(intervals_col).alias("__iv"))
    az = az.select(*[c for c in az.columns if c != "__iv"],
                   F.col("__iv.start").alias("__ms"), F.col("__iv.end").alias("__me"))
    bz = b.select(*[c for c in b.columns if c != intervals_col],
                  F.explode(intervals_col).alias("__iv"))
    bz = bz.select(*[c for c in bz.columns if c != "__iv"],
                   F.col("__iv.start").alias("__ms"), F.col("__iv.end").alias("__me"))
    # materialize each exploded side ONCE: the 1-D tile engine scans
    # its inputs three times (extent aggregate, partitioner sample,
    # the join itself), and a TemporalObject table is typically the
    # output of a collect-per-key aggregation — without the checkpoint
    # every scan re-runs that upstream shuffle (round 13; measured 3×
    # the groupBy+collect_list work per query at sf0.1, and at scale
    # it is three full passes over the event history instead of one)
    # LAZY: the tile engine's first touch is the full extent/sample
    # scan, which materializes every partition in that same job — the
    # eager form paid two extra fixed-latency jobs (round 13)
    az = durable_checkpoint(az, eager=False)
    bz = durable_checkpoint(bz, eager=False)
    out = interval_join(az, bz, start_col="__ms", end_col="__me", **spatial_kwargs)
    sfx1, sfx2 = spatial_kwargs.get("suffixes", ("_1", "_2"))
    drop = [f"__ms{sfx1}", f"__me{sfx1}", f"__ms{sfx2}", f"__me{sfx2}", "__ms", "__me"]
    return out.drop(*[c for c in drop if c in out.columns]).distinct()


def with_interval_mbb(df: DataFrame, start_col: str, end_col: str) -> DataFrame:
    """Map an interval table onto the engine's MBB columns (1-D boxes).

    The long→double cast rounds beyond 2^53 (nanosecond epochs ~1.7e18
    round by ~256 ns), which could *lose* boundary-touching candidate
    pairs. The boxes are therefore padded outward by more than the
    maximum relative cast error (2^-53 < 1e-15), making the tile join a
    strict superset; :func:`interval_join` restores exactness by
    re-applying :func:`interval_intersects` on the original long columns.
    """
    s = _c(start_col).cast("double")
    e = _c(end_col).cast("double")
    return (
        df.withColumn("xmin", s - (F.abs(s) * F.lit(1e-15) + F.lit(1.0)))
        .withColumn("xmax", e + (F.abs(e) * F.lit(1e-15) + F.lit(1.0)))
        .withColumn("ymin", F.lit(0.0))
        .withColumn("ymax", F.lit(0.0))
    )


def interval_join(
    a: DataFrame,
    b: DataFrame | None,
    start_col: str = "start",
    end_col: str = "end",
    **spatial_kwargs,
) -> DataFrame:
    """Overlap join of two interval tables through the spatial engine
    (slc strips over time make natural 1-D tiles)."""
    from hadoopgis_spark.operators.spatial_join import spatial_join

    a1 = with_interval_mbb(a, start_col, end_col)
    b1 = with_interval_mbb(b, start_col, end_col) if b is not None else None
    spatial_kwargs.setdefault("partitioner", "slc")
    sfx1, sfx2 = spatial_kwargs.get("suffixes", ("_1", "_2"))
    out = spatial_join(a1, b1, "st_intersects", **spatial_kwargs)
    # exact refine on the original long columns: the padded double boxes
    # over-approximate, this filter is the precise closed-interval test
    out = out.filter(
        interval_intersects(
            F.col(f"{start_col}{sfx1}"), F.col(f"{end_col}{sfx1}"),
            F.col(f"{start_col}{sfx2}"), F.col(f"{end_col}{sfx2}"),
        )
    )
    drop = [c for c in out.columns if c.startswith(("xmin", "xmax", "ymin", "ymax"))]
    return out.drop(*drop)
