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
    "lint_plan",
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


def lint_plan(df: DataFrame, big_tables: list[str] | None = None) -> list[str]:
    """Scan a physical plan for the patterns that break at 100 TB and
    return human-readable warnings (empty list = clean).

    Checks, each mapped to the failure it predicts on a real cluster:

    * ``CartesianProduct`` — all-pairs blowup; no join keys reached the
      planner.
    * ``BroadcastNestedLoopJoin`` without a broadcasted side hint — NLJ
      probe cost is |stream| × |build|; fine for tile tables, fatal for
      two fact tables.
    * ``Exchange SinglePartition`` — a global sort/agg funneling every
      row through one task. Scalar aggregates of tiny frames are the
      legitimate exception: pass ``big_tables`` (substrings of the
      scans that are data-sized, e.g. parquet file/table names) and the
      warning only fires when such a scan feeds the plan.
    * ``BatchEvalPython`` — row-at-a-time Python UDF in the plan; the
      engine's contract is Arrow-batched or JVM-only.
    * a scan with no ``PushedFilters`` while the query filters — filter
      evaluated after full decode.

    This is the library form of the pinned assertions in
    ``tests/test_plans.py`` — use it interactively or in CI for new
    queries before they earn a pinned contract.
    """
    plan = formatted_plan(df)
    warnings: list[str] = []
    if "CartesianProduct" in plan:
        warnings.append("CartesianProduct: all-pairs join, no equi-keys planned")
    # per-NODE check: the condition must be missing on the NLJ node
    # itself. A whole-plan substring test false-positived whenever a
    # conditioned tile-assignment BNLJ coexisted with an ordinary
    # equi-join whose (legitimate) residual line reads
    # 'Join condition: None' (found by sp_disjoint_global_scaled).
    for node in re.split(r"\n(?=\(\d+\) )", plan):
        head = node.split("\n", 1)[0]
        if "NestedLoopJoin" not in head:
            continue
        conditionless = (
            "Join condition: None" in node
            # formatted BNLJ nodes may carry the condition inline in
            # 'Arguments: BuildSide, JoinType[, condition]'
            or re.search(r"Arguments: Build(Left|Right), \w+\s*$", node, re.M)
        )
        if conditionless:
            warnings.append(
                "conditionless nested-loop join: |stream| x |build| row blowup"
            )
            break
    if re.search(r"SinglePartition", plan) and (
        big_tables is None or any(t in plan for t in big_tables)
    ):
        warnings.append(
            "Exchange SinglePartition: a global single-task stage "
            "(legitimate only for scalar aggregates of tiny frames)"
        )
    if "BatchEvalPython" in plan:
        warnings.append("BatchEvalPython: row-at-a-time Python UDF in the hot path")
    # a real Filter operator NODE, not the 'Filter' substring inside
    # 'PushedFilters:' itself (which made this check vacuously true)
    has_filter_node = re.search(r"\(\d+\) Filter\b", plan) is not None
    if has_filter_node and re.search(r"PushedFilters: \[\]", plan):
        warnings.append("scan with empty PushedFilters under a Filter node")
    return warnings
