"""Ordered-funnel analysis — sequential step matching per entity.

``funnel_times`` computes, per entity (user/session), the earliest time
each funnel step completes GIVEN the previous step completed strictly
before it — the classic product-analytics "view → click → purchase"
question (ClickHouse ships it as ``windowFunnel``; Spark has no
built-in).

Design (100 TB stance): one hash shuffle on the entity key. Step ``i``
is ``min(when(type = step_i AND t > t_{i-1}, t))`` over a
``Window.partitionBy(entity)`` — each step is a new Window node but all
share the same partitioning, so Catalyst plans ONE exchange and reuses
it; the final per-entity collapse (``groupBy(entity).agg(max)``) also
reuses it. State per entity is O(steps), never a sorted event buffer,
so a hot entity streams instead of materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_times"]


def funnel_times(
    df: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "t",
) -> DataFrame:
    """Per-entity earliest completion time of each ordered funnel step.

    Returns one row per entity: ``(entity, t1..tN, funnel_level)`` where
    ``t_i`` is the earliest ``time_col`` of an event of type
    ``steps[i-1]`` occurring strictly after ``t_{i-1}`` (null if the
    step is never reached) and ``funnel_level`` counts completed steps.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(entity_col)
    cur = df.select(entity_col, type_col, time_col)
    t_cols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if t_cols:
            cond = cond & (F.col(time_col) > F.col(t_cols[-1]))
        name = f"t{i + 1}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col(time_col))).over(w))
        t_cols.append(name)
    level = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in t_cols), F.lit(0)
    )
    return (
        cur.groupBy(entity_col)
        .agg(*[F.max(c).alias(c) for c in t_cols])
        .withColumn("funnel_level", level)
    )
