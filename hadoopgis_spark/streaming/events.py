"""Streaming event analytics (works on batch and streaming frames).

* ``windowed_event_counts`` — tumbling-window counts/sums with a
  watermark for late data
* ``hourly_event_rollup``   — the batch-equivalent rollup (oracle-
  checkable; same expressions)
* ``streaming_containment`` — spatial window filter applied to a stream
  (stateless: identical plan on batch and stream)

Event time arrives either as raw nanosecond longs (parquet
TIMESTAMP(NANOS) read with ``nanosAsLong``) or as a real timestamp
column (parquet TIMESTAMP(MICROS) → TIMESTAMP_NTZ); ``normalize_event_ts``
canonicalizes to epoch-nanos BIGINT once at ingestion and ``_event_time``
converts to TimestampType for windowing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_event_ts",
    "windowed_event_counts",
    "hourly_event_rollup",
    "streaming_containment",
    "streaming_zone_tag",
    "streaming_dedup",
    "stream_stream_interval_join",
    "streaming_temporal_tag",
]


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Canonicalize the event-time column to epoch-nanos BIGINT.

    The driver's testdata has shipped events.ts both as parquet
    TIMESTAMP(NANOS) — which Spark 4 reads as a raw long under
    ``spark.sql.legacy.parquet.nanosAsLong`` — and as TIMESTAMP(MICROS),
    which arrives as TIMESTAMP_NTZ. Every downstream consumer does exact
    integer arithmetic on nanos, so convert the timestamp form here.
    ``unix_micros`` needs TIMESTAMP_LTZ; the NTZ→LTZ cast uses the
    session timezone, which the workload pins to UTC (matching DuckDB's
    tz-free ``epoch_us`` on naive timestamps).
    """
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp"):
        nanos = F.unix_micros(F.col(ts_col).cast("timestamp_ltz")) * 1000
        df = df.withColumn(ts_col, nanos.cast("long"))
    return df


def _event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """ns-long → TimestampType (µs precision is plenty for windows).

    Integer `div`, not `/1000`: float division of ~1e18 ns longs loses
    the low bits (double has 53-bit mantissa) and can shift events
    across window boundaries.
    """
    df = normalize_event_ts(df, ts_col)
    return df.withColumn("event_time", F.timestamp_micros(F.expr(f"{ts_col} div 1000")))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (default) or sliding/hopping window counts + value sums
    per event_type. ``slide`` < ``window`` makes windows overlap (each
    event lands in window/slide hops — Spark's ``window()`` expands the
    hops JVM-side, no Python).

    On a streaming frame the watermark bounds state and admits late rows
    up to ``watermark``; on a batch frame the same plan is a plain
    grouped aggregation (watermark is a no-op) — that is the parity test.
    """
    e = _event_time(events, ts_col)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
    win = F.window("event_time", window, slide) if slide else F.window("event_time", window)
    return e.groupBy(win.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        # exact fixed-point cents, not ROUND(SUM(double), 2): the sum is
        # then order-independent across partitions/retries — a streaming
        # re-aggregation yields bit-identical results, and the value can
        # never straddle a rounding boundary by summation order
        (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias("sum_value"),
    ).select(
        F.unix_timestamp("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def hourly_event_rollup(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Batch rollup equivalent of :func:`windowed_event_counts` at 1 hour."""
    return windowed_event_counts(events, window="1 hour", ts_col=ts_col)


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """First-occurrence dedup by key — the streaming face of exact
    dedup (a training-data ingest pipeline drops repeated documents /
    events as they arrive, instead of re-scanning the corpus).

    On a stream: ``dropDuplicatesWithinWatermark`` after a watermark, so
    per-key state is bounded — a duplicate arriving within ``watermark``
    of the kept row is dropped, older state is evicted (unbounded
    ``dropDuplicates`` state would OOM an unbounded stream). On batch:
    plain ``dropDuplicates`` over the same keys — identical keep-one
    semantics, which is the oracle-checkable form (`stream_dedup_batch`).
    """
    e = _event_time(df, ts_col)
    if e.isStreaming:
        e = e.withWatermark("event_time", watermark)
        return e.dropDuplicatesWithinWatermark(list(key_cols))
    return e.dropDuplicates(list(key_cols))


def streaming_zone_tag(
    events: DataFrame,
    zones: DataFrame,
    x_col: str = "value",
    y_col: str = "user_id",
) -> DataFrame:
    """Stream-static spatial enrichment: tag each event with the zone
    whose box contains the event's derived point.

    ``zones`` is a STATIC bounded frame (id + z_xmin/z_ymin/z_xmax/
    z_ymax, half-open on the max edges so grid zones tag each point at
    most once) and is broadcast — the join is stateless, needs no
    watermark, and builds the identical plan on a batch or readStream
    ``events`` frame (Structured Streaming's stream-static inner join).
    The batch form is the oracle-checkable face (`stream_zone_tag_batch`).
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    cond = (
        (x >= F.col("z_xmin")) & (x < F.col("z_xmax"))
        & (y >= F.col("z_ymin")) & (y < F.col("z_ymax"))
    )
    return events.join(F.broadcast(zones), cond, "inner")


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_delay_s: int = 1800,
    watermark: str = "2 hours",
    suffix: str = "_r",
) -> DataFrame:
    """STREAM-STREAM inner join with an event-time range condition: pair
    each left event with same-key right events inside
    ``[left_time - max_delay_s, left_time]`` (e.g. click ↔ the views
    that preceded it within 30 minutes).

    This is Structured Streaming's bounded-state stream-stream join
    shape: on streaming inputs BOTH sides carry a watermark and the
    time-range condition on the watermarked event-time columns is what
    lets Spark EVICT buffered rows — state per key is bounded by
    watermark + max_delay, not by stream length. On batch frames the
    identical code is a plain range equi-join (one shuffle on the key),
    which is the oracle-checkable face (`stream_join_batch`).

    The range arithmetic runs on the canonical epoch-nanos longs (exact
    integers); the watermark columns are the derived µs timestamps.
    Output: left columns + right payload columns suffixed; the right
    event time arrives as ``ts + suffix``.
    """
    l = _event_time(left, ts_col).withColumnRenamed("event_time", "__lt")
    r = _event_time(right, ts_col).withColumnRenamed("event_time", "__rt")
    if left.isStreaming:
        l = l.withWatermark("__lt", watermark)
    if right.isStreaming:
        r = r.withWatermark("__rt", watermark)
    r_cols = {
        c: (c + suffix if c in l.columns else c)
        for c in r.columns
        if c not in (key_col, "__rt")
    }
    r = r.select(
        F.col(key_col), "__rt", *[F.col(c).alias(a) for c, a in r_cols.items()]
    )
    delay_ns = int(max_delay_s) * 1_000_000_000
    cond = (
        (l[key_col] == r[key_col])
        & (F.col(f"{ts_col}{suffix}") <= l[ts_col])
        & (F.col(f"{ts_col}{suffix}") >= l[ts_col] - F.lit(delay_ns))
        # the watermarked-column condition Spark needs for state eviction
        & (F.col("__rt") <= F.col("__lt"))
        & (F.col("__rt") >= F.col("__lt") - F.expr(f"INTERVAL {int(max_delay_s)} SECONDS"))
    )
    out = l.join(r, cond, "inner")
    keep = [l[c] for c in left.columns] + [F.col(a) for a in r_cols.values()]
    return out.select(*keep)


def streaming_temporal_tag(
    events: DataFrame,
    objects: DataFrame,
    t: Column,
    intervals_col: str = "intervals",
) -> DataFrame:
    """Stream-static TEMPORAL enrichment: tag each event with the rows
    of a small static TemporalObject table (id + ``intervals`` =
    array<struct<start, end>>) whose interval SET contains the event's
    derived time ``t`` — the spt extension's membership predicate as a
    streaming join.

    ``objects`` is broadcast and the containment test is an ``exists``
    over its interval array inside the join condition, so the plan is a
    stateless broadcast nested-loop join with a real predicate —
    identical on a batch or readStream ``events`` frame, no watermark
    needed (same contract as ``streaming_zone_tag``). Inner join:
    events matching no object are dropped (left-join + coalesce at the
    call site for keep-all semantics)."""
    cond = F.exists(
        objects[intervals_col],
        lambda iv: (iv["start"] <= t) & (t <= iv["end"]),
    )
    return events.join(F.broadcast(objects), cond, "inner")


def streaming_containment(
    events: DataFrame,
    window_box: tuple[float, float, float, float],
    x_col="value",
    y_col="user_id",
) -> DataFrame:
    """Stateless spatial filter on a stream: keep events whose derived
    point falls in the window box. The filter is a pure column predicate,
    so it runs identically on batch and stream (and pushes down on batch
    parquet scans)."""
    x0, y0, x1, y1 = window_box
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    return events.filter((x >= x0) & (x <= x1) & (y >= y0) & (y <= y1))
