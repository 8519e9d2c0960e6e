"""Streaming funnel tracking — the stream face of
``operators.funnel.funnel_times``.

Per-entity state is just the step times reached so far (O(steps) longs,
never an event buffer), advanced incrementally as events arrive:
``applyInPandasWithState`` keyed on the entity, update-mode output (the
current funnel row re-emits whenever it advances).

Semantics caveat, stated rather than hidden: the incremental update
assumes per-entity event-time ORDER across micro-batches (within a
batch the update sorts). An out-of-order earlier `view` that should
retroactively lower ``t1`` — legal in the batch operator — cannot
rewind stream state; this is the same ordered-delivery contract as
ClickHouse's ``windowFunnel``. The pytest parity run feeds ordered
data and pins stream ≡ batch there.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["funnel_stream"]


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Per-entity funnel progress over an unbounded stream: emits
    ``(entity, t1..tN, funnel_level)`` whenever an entity advances a
    step. The latest row per entity equals the batch
    ``funnel_times`` result under ordered delivery."""
    n = len(steps)
    if not n:
        raise ValueError("steps must be non-empty")
    out_schema = (
        f"{entity_col} long, "
        + ", ".join(f"t{i + 1} long" for i in range(n))
        + ", funnel_level int"
    )
    state_schema = ", ".join(f"t{i + 1} long" for i in range(n))
    step_of = {s: i for i, s in enumerate(steps)}

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (entity,) = key
        if state.hasTimedOut:
            state.remove()
            return
        ts = list(state.get) if state.exists else [None] * n
        rows = pd.concat(list(batches), ignore_index=True).sort_values(time_col)
        advanced = False
        for t, typ in zip(rows[time_col], rows[type_col]):
            if typ not in step_of:
                continue
            i = step_of[typ]
            if ts[i] is not None:
                continue
            prev_ok = i == 0 or (ts[i - 1] is not None and int(t) > ts[i - 1])
            if prev_ok:
                ts[i] = int(t)
                advanced = True
        state.update(tuple(ts))
        state.setTimeoutDuration(3_600_000)
        if advanced:
            level = sum(1 for x in ts if x is not None)
            yield pd.DataFrame(
                [(entity, *ts, level)],
                columns=[entity_col] + [f"t{i + 1}" for i in range(n)] + ["funnel_level"],
            )

    return events.groupBy(entity_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
