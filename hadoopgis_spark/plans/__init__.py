"""Physical-plan inspection helpers.

The engine's scale story rests on Catalyst choosing the right physical
strategy: filters pushed into parquet scans, small tables broadcast,
one shuffle per co-partitioned join, wide whole-stage-codegen spans.
These helpers make that checkable in tests and during tuning — the
plan, not the runtime, is the first-class artifact.
"""

from hadoopgis_spark.plans.inspect import (
    count_codegen_nodes,
    count_exchanges,
    formatted_plan,
    has_broadcast,
    lint_plan,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast",
    "count_exchanges",
    "count_codegen_nodes",
    "lint_plan",
]
