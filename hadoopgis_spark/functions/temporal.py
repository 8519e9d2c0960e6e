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
