"""Sources & sinks.

* :mod:`tsv` — the reference's native tab-separated format (S1/S2)
* :mod:`loader` — partitioned data loading (§3.2) + metadata (info.cfg)
* :mod:`bucketed` — tile-bucketed tables for zero-shuffle repeated joins
"""

from hadoopgis_spark.sources.asof_store import (
    asof_join_cobucketed,
    save_asof_facts,
    save_asof_history,
)
from hadoopgis_spark.sources.bucketed import save_bucketed, spatial_join_bucketed
from hadoopgis_spark.sources.jsonl import read_jsonl, write_jsonl
from hadoopgis_spark.sources.loader import load_partitioned, save_partitioned
from hadoopgis_spark.sources.tsv import read_tsv, write_tsv
from hadoopgis_spark.sources.dedup_index import dedup_against_index, save_dedup_index
from hadoopgis_spark.sources.vector_index import (
    add_to_ivf_index,
    ivf_index_health,
    ivf_topk_indexed,
    ivfpq_topk_indexed,
    ivfpq_topk_rerank_indexed,
    load_ivf_index,
    load_ivfpq_index,
    refit_ivf_index,
    save_ivf_index,
    save_ivfpq_index,
)

__all__ = [
    "read_tsv",
    "write_tsv",
    "read_jsonl",
    "write_jsonl",
    "save_partitioned",
    "load_partitioned",
    "save_bucketed",
    "spatial_join_bucketed",
    "save_ivf_index",
    "load_ivf_index",
    "ivf_topk_indexed",
    "add_to_ivf_index",
    "ivf_index_health",
    "refit_ivf_index",
    "save_ivfpq_index",
    "load_ivfpq_index",
    "ivfpq_topk_indexed",
    "ivfpq_topk_rerank_indexed",
    "save_dedup_index",
    "dedup_against_index",
    "save_asof_history",
    "save_asof_facts",
    "asof_join_cobucketed",
]
