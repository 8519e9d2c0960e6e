"""Structured Streaming operators.

The reference is strictly batch MapReduce (SURVEY §2.9) — this module is
the forward-looking extension: the same engine functions applied to
unbounded sources. Batch/stream parity is by construction: every helper
takes a DataFrame (batch or streaming) and builds the identical
declarative plan, so the batch oracle validates the streaming logic.
"""

from hadoopgis_spark.streaming.ann import ann_serve, grouped_topk, streaming_ann_topk
from hadoopgis_spark.streaming.ingest import ingest_batch_sorted, streaming_ingest_sorted
from hadoopgis_spark.streaming.topk import topk_update
from hadoopgis_spark.streaming.events import (
    hourly_event_rollup,
    streaming_containment,
    streaming_dedup,
    streaming_zone_tag,
    windowed_event_counts,
)
from hadoopgis_spark.streaming.neardedup import (
    minhash_band_rows,
    near_dedup_keep,
    streaming_contamination,
    streaming_near_dedup,
)

__all__ = [
    "windowed_event_counts",
    "hourly_event_rollup",
    "streaming_containment",
    "streaming_zone_tag",
    "streaming_dedup",
    "minhash_band_rows",
    "near_dedup_keep",
    "streaming_near_dedup",
    "streaming_contamination",
    "ann_serve",
    "grouped_topk",
    "streaming_ann_topk",
    "topk_update",
    "ingest_batch_sorted",
    "streaming_ingest_sorted",
]
