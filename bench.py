#!/usr/bin/env python
"""Headline benchmark: runs the workload queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized through the noop sink (all columns computed,
nothing collected to the driver) after a warmup pass of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "rel_q1_pricing",
    "rel_q3_top_orders",
    "rel_q5_nation_revenue",
    "rel_events_hourly",
    "rel_window_rank",
    "sp_mbb_extent",
    "sp_fg_histogram",
    "sp_join_boxes",
    "sp_join_self",
    "sp_dwithin_points",
    "sp_knn",
    "sp_containment",
    "sp_box_measures",
    "txt_stats",
    "txt_fingerprint",
    "txt_lang_guess",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "sim_ann_topk",
    "sim_embed_dup",
    "txt_quality_filter",
    "agg_partition_stats",
    "stream_rollup_batch",
    "rel_semi_join",
    "rel_anti_join",
    "rel_rollup",
    "sp_interval_join",
    "sp_join_fields",
    "sp_containment_wkt",
    "sp_join_boxes_hc",
    "sp_join_boxes_2level",
    "sp_join_broadcast",
    "sp_join_3d",
    "stream_sessionize",
    "dedup_clusters",
    "txt_tfidf_topterms",
    "rel_pivot",
    "rel_percentiles",
    # round 3: boundary predicates, partitioner zoo, kNN modes, ANN scale
    # path, loader roundtrip, transform gates
    "sp_touches_wkt",
    "sp_within_wkt",
    "sp_overlaps_wkt",
    "sp_equals_wkt",
    "sp_crosses_wkt",
    "sp_join_boxes_str",
    "sp_join_boxes_slc",
    "sp_join_boxes_bos",
    "sp_knn_tile",
    "sp_knn_capped",
    "sim_ann_lsh",
    "sp_loaded_containment",
    "op_uniqpart",
    "op_discretize",
    # round 3b: multimodal plumbing, malformed skip, containfile, SQL
    # surface, IVF ANN, BPE token budget
    "mm_decode_meta",
    "mm_frame_sample",
    "sp_malformed_filter",
    "sp_containment_file",
    "sp_sql_surface",
    "sim_ann_ivf",
    "txt_token_bpe",
    "stream_dedup_batch",
    # round 4: co-bucketed storage join (zero-shuffle repeated joins) +
    # streaming spatial filter parity
    "sp_join_bucketed",
    "stream_containment_batch",
    "stream_zone_tag_batch",
    "txt_line_dedup",
    "txt_repetition",
    "mm_resize",
    "mm_features",
    "txt_winnow",
    "src_jsonl_roundtrip",
    "sp_geojson_parse",
    "rel_percentiles_approx",
    # round 5: padded bucketed distance join (zero-shuffle dwithin) +
    # composite geometry kinds through the exact kernel
    "sp_join_bucketed_dwithin",
    "sp_mixed_types",
    "dedup_jaccard_prefix",
    # round 5b: deterministic curation ops (split/sample/pack/decontam)
    "cur_split_assign",
    "cur_stratified_sample",
    "cur_pack_sequences",
    "cur_contamination",
    "stream_near_dedup_batch",
    "txt_dup_passages",
    "sim_ann_ivf_indexed",
    "dedup_incremental",
    "cur_quality_cut",
    "stream_contamination_batch",
    "cur_pipeline",
    "sim_ann_lsh_multiprobe",
    # round 5c: temporal analytics, k-means surface, PII, DSIR weighting
    "rel_asof_join",
    "rel_funnel",
    "sim_kmeans",
    "txt_pii_scrub",
    "cur_dsir_weights",
    "stream_sliding_batch",
    "cur_chunk_docs",
    "cur_mixture_alloc",
    "stream_asof_batch",
    "stream_session_native_batch",
    "rel_asof_bucketed",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "txt_dup_spans",
    "rel_exists_late_ship",
    "rel_min_by_group",
    "rel_supplier_cnt",
    # round 6: multi-interval temporal objects, SemDeDup, deterministic
    # training shuffle, Q17/Q21 relational shapes, cur_pack micro-gates
    "sp_temporal_parse",
    "sp_multi_interval_join",
    "sim_semdedup",
    "cur_shuffle_shards",
    "rel_small_qty_revenue",
    "rel_top_waiting_suppliers",
    "cur_pack_streams",
    "cur_pack_tokens",
    "stream_join_batch",
    "sim_ann_ivfpq_indexed",
    "sim_ann_sq",
    "rel_lag_lead",
    "rel_distinct_approx",
    "dedup_edit_pairs",
    "txt_hash_embedding",
    "dedup_keep_best",
    "cur_take_n",
    "stream_temporal_tag_batch",
    "sim_ann_ivf_appended",
    "rel_asof_cobucketed",
    # round 6b: vocabulary heavy hitters + coverage QA, zonemap skipping
    "txt_top_ngrams",
    "txt_vocab_coverage",
    "rel_range_pruned",
    "sp_containment_pruned",
    "rel_q7_volume",
    "rel_q10_returns",
    "rel_q14_promo",
    "rel_q18_big_orders",
    "rel_q19_disjunct",
    "rel_cube",
    "stream_ann_batch",
    "rel_range_appended",
    "rel_profile",
    "rel_salted_join",
    "rel_quantile_bins",
    "src_orc_roundtrip",
    "src_partitioned_dates",
    "rel_corr",
    "txt_sql_surface",
    "rel_rolling",
    "txt_char_entropy",
    "txt_unigram_logprob",
    "rel_cooccur",
    "rel_q6_forecast",
    "rel_q8_share",
    "rel_q22_idle_cust",
    # round 7: adjacency/disjoint predicates end-to-end, S8 stage-skip
    # proof, BPE corpus pass
    "sp_adjacent_wkt",
    "sp_disjoint_tile",
    "sp_disjoint_global",
    "src_memo_stage",
    "txt_bpe_wordfreq",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from hadoopgis_spark.session import get_spark
    from hadoopgis_spark.workload import REGISTRY

    spark = get_spark("hgs-bench")
    # warm the JVM + parquet footers
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # record failures, keep the bench alive
            print(f"bench {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    failed = sorted(n for n, v in timings.items() if v < 0)
    slowest = dict(sorted(
        ((n, v) for n, v in timings.items() if v > 0),
        key=lambda kv: -kv[1])[:10])
    # The stdout line must stay SMALL: the driver's capture window
    # truncated the full 151-entry map in rounds 5-6 ("parsed": null in
    # BENCH_r05/r06.json). Headline + 10 slowest only; the complete
    # per-query map goes to BENCH_DETAIL.json next to this script.
    out = {
        "metric": "workload_total_wall",
        "value": round(sum(v for v in timings.values() if v > 0), 3),
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        "n_failed": len(failed),
        "queries": slowest,
    }
    detail = dict(out, queries=timings, failed=failed)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
