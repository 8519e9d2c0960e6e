"""Gap-based sessionization — batch and stateful-streaming forms.

* ``sessionize`` (batch): lag → new-session flag → running session
  number → per-session aggregate. Pure window/agg plan, oracle-checkable.
* ``sessionize_stream``: the same semantics on an unbounded stream via
  ``applyInPandasWithState`` — per-user state holds the open session
  (start, last-seen, counts); a session closes when the gap exceeds the
  timeout or the state times out. State size is O(users), not O(events).

Timestamps are nanosecond longs end-to-end (exact integer arithmetic).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize", "sessionize_stream", "session_window_rollup", "SESSION_SCHEMA"]

SESSION_SCHEMA = (
    "user_id long, session_no long, session_start long, session_end long, "
    "n_events long, sum_value double"
)


def sessionize(events: DataFrame, gap_ns: int = 1_800_000_000_000, ts_col: str = "ts") -> DataFrame:
    """Split each user's event stream into sessions separated by gaps
    > ``gap_ns`` (default 30 min). Returns one row per session."""
    w = Window.partitionBy("user_id").orderBy(ts_col)
    flagged = events.withColumn(
        "_new",
        F.when(
            F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(gap_ns), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_sess", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy("user_id", F.col("_sess").alias("session_no"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # exact cents (see streaming.events.windowed_event_counts)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias("sum_value"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_ns: int = 1_800_000_000_000,
    ts_col: str = "ts",
    state_timeout_ms: int = 60_000,
) -> DataFrame:
    """Stateful streaming sessionization.

    Emits a row for every session **closed** in a micro-batch (a new
    event arriving after the gap closes the previous session); the
    still-open session stays in state and is flushed on state timeout.

    .. warning:: **State-schema change (round 7).** The state struct's
       value accumulator changed from ``sum_value double`` to
       ``sum_cents long`` (exact fixed-point cents). Spark's state
       store pins the state schema at checkpoint creation, so a
       streaming query resuming from a checkpoint written by the
       pre-round-7 operator will fail schema validation (or, on
       engines that skip it, misread state). Restart such queries with
       a FRESH checkpoint directory; there is no in-place migration.
    """

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # value sums accumulate as exact integer CENTS in state (the
        # same fixed-point discipline as the batch sessionize / window
        # rollups): replays and out-of-order accumulation then yield
        # bit-identical sums — a float accumulator would drift by
        # summation order and round() at emit could flip the last cent.
        if state.hasTimedOut:
            if state.exists:
                s_no, s_start, s_end, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    [(user_id, s_no, s_start, s_end, n, sv / 100.0)],
                    columns=["user_id", "session_no", "session_start", "session_end", "n_events", "sum_value"],
                )
            return
        rows = pd.concat(list(batches), ignore_index=True).sort_values(ts_col)
        if state.exists:
            s_no, s_start, s_end, n, sv = state.get
        else:
            s_no, s_start, s_end, n, sv = 0, None, None, 0, 0
        closed = []
        for ts, value in zip(rows[ts_col], rows["value"]):
            ts = int(ts)
            cents = int(round(float(value) * 100))
            if s_start is None:
                s_start, s_end, n, sv = ts, ts, 1, cents
            elif ts - s_end > gap_ns:
                closed.append((user_id, s_no, s_start, s_end, n, sv / 100.0))
                s_no += 1
                s_start, s_end, n, sv = ts, ts, 1, cents
            else:
                s_end = max(s_end, ts)
                n += 1
                sv += cents
        state.update((s_no, s_start, s_end, n, sv))
        state.setTimeoutDuration(state_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_no", "session_start", "session_end", "n_events", "sum_value"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType="session_no long, session_start long, session_end long, n_events long, sum_cents long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def session_window_rollup(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Gap sessionization through Spark's NATIVE ``session_window`` —
    the built-in merging-window state store path, complementing the
    custom ``applyInPandasWithState`` operator above (same semantics,
    engine-managed state: on a stream the watermark evicts closed
    sessions; on a batch frame it is a plain aggregation).

    A session extends while consecutive events are < ``gap`` apart
    (Spark merges an event into a session when its time is strictly
    before previous_end = previous_time + gap). Returns one row per
    (user, session): start epoch-seconds, event count, value sum.
    """
    from hadoopgis_spark.streaming.events import _event_time

    e = _event_time(events, ts_col)
    if e.isStreaming:
        e = e.withWatermark("event_time", gap)
    return (
        e.groupBy("user_id", F.session_window("event_time", gap).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact cents (see streaming.events.windowed_event_counts)
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("win.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
