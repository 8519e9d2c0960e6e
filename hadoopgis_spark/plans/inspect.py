"""Inspect physical plans as text (stable across Spark 3.4+)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast",
    "count_exchanges",
    "count_codegen_nodes",
]


def formatted_plan(df: DataFrame) -> str:
    """`df.explain("formatted")` as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema struct bodies of every scan (column-pruning check)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)]


def has_broadcast(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "Broadcast" in plan


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes BroadcastExchange)
    — the metric to minimize at scale."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def count_codegen_nodes(df: DataFrame) -> int:
    """Operators inside whole-stage codegen ('[codegen id : N]' tags)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\[codegen id : \d+\]", plan))
