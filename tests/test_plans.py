"""Physical-plan assertions — the 100 TB design contracts.

These tests pin the *plan shape*, not timings: filters reach the parquet
scan, tile tables broadcast, the pair join shuffles exactly once per
side, dedup adds no extra shuffle, codegen covers the hot expressions.
A regression here is a scale regression even if small-data tests stay
green.
"""

import pytest
from pyspark.sql import functions as F

from hadoopgis_spark.operators import containment, spatial_join
from hadoopgis_spark.plans import (
    count_codegen_nodes,
    count_exchanges,
    formatted_plan,
    has_broadcast,
    lint_plan,
    pushed_filters,
    scan_read_schema,
)


@pytest.fixture(scope="module")
def boxes_parquet(spark, tmp_path_factory):
    """Box-native dataset materialized to parquet (stats-bearing scan)."""
    p = str(tmp_path_factory.mktemp("plans") / "boxes")
    import random

    rng = random.Random(0)
    rows = [
        (
            i,
            x := rng.uniform(0, 1000),
            y := rng.uniform(0, 1000),
            x + rng.uniform(1, 10),
            y + rng.uniform(1, 10),
        )
        for i in range(5000)
    ]
    spark.createDataFrame(
        rows, "id long, xmin double, ymin double, xmax double, ymax double"
    ).write.mode("overwrite").parquet(p)
    return p


class TestContainmentPushdown:
    def test_window_filter_reaches_parquet_scan(self, spark, boxes_parquet):
        df = spark.read.parquet(boxes_parquet)
        q = containment(df, "200,200,600,600")
        pushed = pushed_filters(q)
        # the MBB range conjuncts must be pushed (row-group min/max skip)
        assert any("xmin" in p and "LessThanOrEqual" in p for p in pushed), pushed
        assert any("xmax" in p and "GreaterThanOrEqual" in p for p in pushed), pushed

    def test_column_pruning(self, spark, boxes_parquet):
        df = spark.read.parquet(boxes_parquet)
        q = containment(df, "200,200,600,600").select("id")
        schemas = scan_read_schema(q)
        # id + the 4 mbb filter columns; nothing else
        assert all("ymax" in s and "id" in s for s in schemas)


class TestContainmentFused:
    def test_wkt_window_refine_is_one_arrow_stage(self, spark):
        """Non-rectangular window over WKT data: the fused kernel must
        appear as exactly ONE ArrowEvalPython node (bbox + prune + exact
        refine in a single batch) — the unfused pipeline's two Python
        stages doubled the geometry-text IPC."""
        import re

        rows = [(i, f"POINT ({i % 50} {i % 40})") for i in range(200)]
        df = spark.createDataFrame(rows, "id long, geom string")
        q = containment(df, "POLYGON ((0 0, 40 5, 20 45, 0 0))")
        plan = formatted_plan(q)
        assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1, plan[:1500]


class TestJoinShape:
    def test_spatial_join_single_shuffle_pair(self, spark, boxes_parquet):
        df = spark.read.parquet(boxes_parquet)
        j = spatial_join(df, None, "st_intersects", bucket_size=500)
        # tile multicast must be broadcast, not shuffle
        assert has_broadcast(j)
        # exactly one shuffle per side for the tile co-partitioning; the
        # reference-point dedup must NOT add a distinct/exchange on top
        assert count_exchanges(j) == 2, formatted_plan(j)[:2000]
        plan = formatted_plan(j)
        assert "BroadcastNestedLoopJoin" in plan  # tile assignment
        import re

        shuffle_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan))
        assert shuffle_joins == 1, plan[:1500]

    def test_mbr_partitioner_uses_distinct(self, spark, boxes_parquet):
        df = spark.read.parquet(boxes_parquet)
        j = spatial_join(df, None, "st_intersects", bucket_size=500, partitioner="str")
        # str tiles may overlap → dedup is a distinct → one extra exchange
        assert count_exchanges(j) == 3, formatted_plan(j)[:2000]

    def test_box_join_stays_in_codegen(self, spark, boxes_parquet):
        df = spark.read.parquet(boxes_parquet)
        # codegen ids only show in non-AQE plans before execution
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            j = spatial_join(df, None, "st_intersects", bucket_size=500)
            # box mode has no Python: every hot operator is codegen'd, and
            # no Arrow/Python eval nodes appear
            plan = formatted_plan(j)
            assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
            assert count_codegen_nodes(j) >= 5, plan[:1500]
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    def test_wkt_refine_is_single_python_stage(self, spark):
        rows = [(i, f"POLYGON (({i} 0, {i+5} 0, {i} 5, {i} 0))") for i in range(200)]
        df = spark.createDataFrame(rows, "id long, geom string")
        j = spatial_join(df, None, "st_intersects", bucket_size=100)
        plan = formatted_plan(j)
        import re

        # minimal Python footprint: one MBB parse per join side + one
        # refine — nothing else leaves the JVM
        arrow_nodes = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
        assert arrow_nodes == 3, plan[:1500]


class TestBucketedJoin:
    def test_cobucketed_join_has_zero_exchange(self, spark, boxes_parquet):
        """Two tables written by save_bucketed over one tile table join
        on tile_id with NO Exchange on either side — the write-once
        shuffle is amortized across every subsequent join (the 100 TB
        bucketed-warehouse contract)."""
        from hadoopgis_spark.sources import save_bucketed, spatial_join_bucketed

        df = spark.read.parquet(boxes_parquet)
        a = df.filter(F.col("id") % 2 == 0)
        b = df.filter(F.col("id") % 2 == 1)
        tiles = save_bucketed(a, "plans_bkt_a", bucket_size=500, n_buckets=8)
        save_bucketed(b, "plans_bkt_b", tiles_table=tiles, n_buckets=8)
        # disable auto-broadcast: at test scale Spark would broadcast the
        # small side and the zero-exchange assertion would prove nothing —
        # force the co-located sort-merge path the layout exists for
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spatial_join_bucketed(spark, "plans_bkt_a", "plans_bkt_b")
            plan = formatted_plan(j)
            assert "SortMergeJoin" in plan, plan[:2000]
            assert count_exchanges(j) == 0, plan[:2000]
            # and the result matches the runtime tile join exactly
            got = {(r.id_1, r.id_2) for r in j.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        expect = {
            (r.id_1, r.id_2)
            for r in spatial_join(a, b, "st_intersects", bucket_size=500).collect()
        }
        assert got == expect and len(got) > 0

    def test_dwithin_refused(self, spark, boxes_parquet):
        """The stored layout assigned tiles unpadded: a distance join
        over it would silently miss cross-tile pairs, so it must refuse
        instead of returning incomplete results."""
        import pytest as _pytest

        from hadoopgis_spark.sources import spatial_join_bucketed

        with _pytest.raises(ValueError, match="dwithin"):
            spatial_join_bucketed(
                spark, "plans_bkt_a", "plans_bkt_b", "st_dwithin", distance=5.0
            )

    def test_padded_layout_serves_dwithin_zero_exchange(self, spark, boxes_parquet):
        """A layout written with pad=3 per side serves st_dwithin up to
        distance 6 with zero Exchange, matching the runtime tile join
        exactly; beyond the declared margin it refuses."""
        import pytest as _pytest

        from hadoopgis_spark.sources import save_bucketed, spatial_join_bucketed

        df = spark.read.parquet(boxes_parquet)
        a = df.filter(F.col("id") % 2 == 0)
        b = df.filter(F.col("id") % 2 == 1)
        tiles = save_bucketed(a, "plans_bktp_a", bucket_size=500, n_buckets=8, pad=3.0)
        save_bucketed(b, "plans_bktp_b", tiles_table=tiles, n_buckets=8, pad=3.0)
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spatial_join_bucketed(
                spark, "plans_bktp_a", "plans_bktp_b", "st_dwithin", distance=5.0
            )
            assert count_exchanges(j) == 0, formatted_plan(j)[:2000]
            got = {(r.id_1, r.id_2) for r in j.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        expect = {
            (r.id_1, r.id_2)
            for r in spatial_join(
                a, b, "st_dwithin", distance=5.0, bucket_size=500
            ).collect()
        }
        assert got == expect and len(got) > 0
        # intersecting predicates still exact over the padded layout
        # (assignment is a superset; refpoint dedup stays exactly-once)
        got_i = {
            (r.id_1, r.id_2)
            for r in spatial_join_bucketed(spark, "plans_bktp_a", "plans_bktp_b").collect()
        }
        expect_i = {
            (r.id_1, r.id_2)
            for r in spatial_join(a, b, "st_intersects", bucket_size=500).collect()
        }
        assert got_i == expect_i
        with _pytest.raises(ValueError, match="exceeds the stored layout margin"):
            spatial_join_bucketed(
                spark, "plans_bktp_a", "plans_bktp_b", "st_dwithin", distance=7.0
            )

    def test_mismatched_tilings_refused(self, spark, boxes_parquet):
        """Saving the second side without tiles_table= fits its own
        tiling: the tile_id equi-join would silently drop pairs, so the
        fingerprint guard must raise."""
        import pytest as _pytest

        from hadoopgis_spark.sources import save_bucketed, spatial_join_bucketed

        df = spark.read.parquet(boxes_parquet)
        a = df.filter(F.col("id") % 2 == 0)
        b = df.filter(F.col("id") % 3 == 1)
        save_bucketed(a, "plans_bktm_a", bucket_size=500, n_buckets=8)
        save_bucketed(b, "plans_bktm_b", bucket_size=200, n_buckets=8)  # own tiling
        with _pytest.raises(ValueError, match="same tiling"):
            spatial_join_bucketed(spark, "plans_bktm_a", "plans_bktm_b")


class TestPipelinePlans:
    """Scale contracts for the LLM-pipeline operators added in round 3."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        import random

        rng = random.Random(5)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    def test_ivf_corpus_never_all_pairs(self, spark, emb):
        from hadoopgis_spark.operators.similarity import ivf_topk

        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        j = ivf_topk(emb, q, k=3, n_centroids=4, n_probe=2, dim=8)
        plan = formatted_plan(j)
        # probe side broadcasts onto the corpus: the corpus is scanned
        # once, assigned in place, and never shuffled for the join
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        # shuffles: ONLY the final top-k window over candidates — probe
        # selection is a per-row array_sort+slice, not a window
        assert count_exchanges(j) == 1, plan[:2000]
        # norm-precompute contract: the post-join rank projection does
        # exactly ONE interpreted fold per pair (the dot); both norms
        # arrive as plain precomputed columns. HOFs are CodegenFallback,
        # so a second fold here would re-run per candidate pair.
        cos_lines = [l for l in plan.splitlines() if "AS cosine" in l]
        assert cos_lines, plan[:2000]
        for l in cos_lines:
            assert l.count("aggregate(") == 1, l
            assert "v_norm" in l and "__qn" in l, l

    def test_ivf_indexed_prunes_partitions_dynamically(self, spark, emb, tmp_path):
        """The persisted-index query must show dynamic partition pruning
        on the cid partition column: at serving scale the whole point of
        the cid-partitioned layout is that unprobed inverted lists are
        pruned at the FILE level, so a query reads ~n_probe/n_centroids
        of the corpus bytes."""
        from hadoopgis_spark.sources import ivf_topk_indexed, save_ivf_index

        root = str(tmp_path / "ivf")
        save_ivf_index(emb, "plans_ivfidx", n_centroids=4, dim=8, root=root)
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        j = ivf_topk_indexed(spark, "plans_ivfidx", q, k=3, n_probe=2, root=root)
        plan = formatted_plan(j)
        assert "dynamicpruning#" in plan, plan[:2000]
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    def test_ivfpq_indexed_prunes_and_scans_codes_only(self, spark, emb, tmp_path):
        """Persisted IVF-PQ: the serve query must (a) dynamically prune
        unprobed cid partitions and (b) scan ONLY the code column — the
        raw embedding bytes never appear in the serve plan's ReadSchema."""
        from hadoopgis_spark.operators.similarity import fit_pq_codebooks
        from hadoopgis_spark.plans.inspect import scan_read_schema
        from hadoopgis_spark.sources import ivfpq_topk_indexed, save_ivfpq_index

        sample = [r.embedding for r in emb.limit(64).collect()]
        books = fit_pq_codebooks(sample, dim=8, n_sub=2, n_codes=4)
        root = str(tmp_path / "ivfpq")
        save_ivfpq_index(emb, "plans_ivfpqidx", books, n_centroids=4, dim=8, root=root)
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        j = ivfpq_topk_indexed(spark, "plans_ivfpqidx", q, k=3, n_probe=2, root=root)
        plan = formatted_plan(j)
        assert "dynamicpruning#" in plan, plan[:2000]
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        code_scans = [s for s in scan_read_schema(j) if "codes" in s]
        assert code_scans and all("embedding" not in s for s in code_scans), code_scans

    def test_mm_decode_is_one_python_stage(self, spark):
        from hadoopgis_spark.operators.multimodal import decode_image

        df = spark.createDataFrame(
            [(i, bytes([i]) * 100) for i in range(10)], "media_id long, data binary"
        )
        d = decode_image(df)
        plan = formatted_plan(d)
        import re

        assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, plan[:1500]
        assert count_exchanges(d) == 0  # embarrassingly parallel

    def test_bpe_tokens_stay_jvm_side(self, spark):
        from hadoopgis_spark.functions.text import bpe_token_count

        df = spark.createDataFrame([(1, "hello world")], "id long, text string")
        q = df.select("id", bpe_token_count("text").alias("n"))
        plan = formatted_plan(q)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestLineDedupPlan:
    def test_exactly_two_exchanges_and_partial_agg(self, spark):
        """Global line dedup = one shuffle to group copies of a line +
        one shuffle to reassemble documents — anything more is a scale
        regression (no global sort, no broadcast of the corpus). The
        keep-first must be a partial-aggregated min, NOT a window: hot
        lines (boilerplate at corpus scale) must combine map-side rather
        than funnel into one straggler task."""
        from hadoopgis_spark.operators.dedup import line_dedup

        df = spark.createDataFrame(
            [(i, [f"l{i % 7}", f"l{i}"]) for i in range(50)],
            "doc_id long, lines array<string>",
        )
        out = line_dedup(df)
        plan = formatted_plan(out)
        assert count_exchanges(out) == 2, plan[:1500]
        assert "partial_min" in plan, plan[:1500]
        assert "Window" not in plan, plan[:1500]

    def test_curation_filters_are_map_side(self, spark):
        """split_assign and stratified_sample must stay inside the scan
        stage: at 100 TB the curation filter IS the read — any exchange
        here would shuffle the corpus to do per-row arithmetic."""
        from hadoopgis_spark.operators.curate import split_assign, stratified_sample

        df = spark.createDataFrame(
            [(i, f"t{i}", f"src{i % 3}") for i in range(100)],
            "doc_id long, text string, source string",
        )
        assert count_exchanges(split_assign(df)) == 0
        assert count_exchanges(stratified_sample(df, {"src0": 0.5})) == 0

    def test_pack_sequences_single_salt_shuffle(self, spark):
        """Packing = one hash partition by the stream salt; the window
        runs per-stream. No global sort, no single-task cumsum."""
        from hadoopgis_spark.operators.curate import pack_sequences

        df = spark.createDataFrame(
            [(i, "word " * 10) for i in range(100)], "doc_id long, text string"
        )
        out = pack_sequences(df, budget=64, n_streams=8)
        plan = formatted_plan(out)
        assert count_exchanges(out) == 1, plan[:1500]
        assert "partitioning=[SinglePartition]" not in plan.replace(" ", ""), plan[:1500]

    def test_contamination_broadcasts_eval_not_corpus(self, spark):
        """The corpus side must reach the semi join without an exchange:
        eval n-grams (benchmarks are small) broadcast onto the scan."""
        from hadoopgis_spark.operators.curate import contamination_flags

        train = spark.createDataFrame(
            [(i, "some words " * 10) for i in range(100)], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(0, "eval text " * 8)], "doc_id long, text string")
        out = contamination_flags(train, ev, n=8)
        plan = formatted_plan(out)
        assert "BroadcastHashJoin" in plan, plan[:2000]
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    def test_jaccard_prefix_never_all_pairs(self, spark):
        """The COMPLETE jaccard join must get its completeness from the
        prefix-token equi-join, never from a physical cross product —
        at corpus scale a CartesianProduct/BNLJ is the difference
        between a join and an outage."""
        from hadoopgis_spark.operators.dedup import jaccard_prefix_pairs

        df = spark.createDataFrame(
            [(i, f"w{i % 4} w{i % 7} w{i % 3} w{i % 5}") for i in range(60)],
            "doc_id long, text string",
        )
        out = jaccard_prefix_pairs(df, threshold=0.5)
        plan = formatted_plan(out)
        assert "CartesianProduct" not in plan, plan[:2000]
        assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]

    def test_exact_dedup_no_window(self, spark):
        """exact_dedup carries the same contract: winners via partial-
        aggregated min + semi join on the uniform id key, never a window
        over the content-hash (hot-document straggler)."""
        from hadoopgis_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(i, f"text {i % 5}") for i in range(50)], "doc_id long, text string"
        )
        out = exact_dedup(df)
        plan = formatted_plan(out)
        assert "partial_min" in plan, plan[:1500]
        assert "Window" not in plan, plan[:1500]
        assert "LeftSemi" in plan, plan[:1500]


class TestAggPushdown:
    def test_extent_agg_is_partial(self, spark, boxes_parquet):
        df = spark.read.parquet(boxes_parquet)
        agg = df.agg(F.min("xmin"), F.min("ymin"), F.max("xmax"), F.max("ymax"), F.count(F.lit(1)))
        plan = formatted_plan(agg)
        # partial_min/... before the single-partition exchange = map-side combine
        assert "partial_min" in plan and "partial_count" in plan


class TestPlanLint:
    def test_clean_plan_passes(self, spark):
        from hadoopgis_spark.plans.inspect import lint_plan

        a = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
        b = spark.range(10).select(F.col("id").alias("k"), F.lit(2).alias("w"))
        j = a.join(F.broadcast(b), "k").groupBy("k").count()
        assert lint_plan(j) == []

    def test_flags_cartesian(self, spark):
        from hadoopgis_spark.plans.inspect import lint_plan

        a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "id2")
        warns = lint_plan(a.crossJoin(b))
        assert any("Cartesian" in w or "nested-loop" in w for w in warns), warns

    def test_flags_single_partition_funnel(self, spark):
        from hadoopgis_spark.plans.inspect import lint_plan

        df = spark.range(1000).orderBy("id")  # global sort -> range exchange ok
        big_agg = spark.range(1000).agg(F.sum("id"))  # scalar agg -> SinglePartition
        warns = lint_plan(big_agg)
        assert any("SinglePartition" in w for w in warns), warns

    def test_engine_gates_are_lint_clean_where_contracted(self, spark):
        """The flagship join's plan passes the linter (it is the plan
        the pinned contracts in this file describe)."""
        from hadoopgis_spark.operators import spatial_join
        from hadoopgis_spark.plans.inspect import lint_plan

        a = spark.range(200).select(
            F.col("id"),
            (F.col("id") % 13 * 1.0).alias("xmin"), (F.col("id") % 7 * 1.0).alias("ymin"),
            (F.col("id") % 13 * 1.0 + 2).alias("xmax"), (F.col("id") % 7 * 1.0 + 2).alias("ymax"),
        )
        b = spark.range(150).select(
            F.col("id"),
            (F.col("id") % 11 * 1.0).alias("xmin"), (F.col("id") % 5 * 1.0).alias("ymin"),
            (F.col("id") % 11 * 1.0 + 2).alias("xmax"), (F.col("id") % 5 * 1.0 + 2).alias("ymax"),
        )
        j = spatial_join(a, b, "st_intersects")
        warns = [w for w in lint_plan(j) if "nested-loop" not in w]
        # tile multicast IS a broadcast NLJ against the tiny tile table —
        # that one is the engine's documented design, filtered above
        assert warns == [], warns


class TestPartitionedSinkPruning:
    def test_date_partition_filter_reaches_listing(self, spark, tmp_path):
        """Directory-level pruning contract for the hive-partitioned
        sink shape (src_partitioned_dates): a filter on the partition
        column must appear as a PartitionFilters entry (pruned at file
        LISTING time), not a post-scan Filter."""
        from pyspark.sql import functions as F
        out = str(tmp_path / "bydate")
        df = spark.range(0, 1000).select(
            F.col("id").alias("event_id"), (F.col("id") % 7).alias("day"))
        df.write.partitionBy("day").parquet(out)
        plan = (spark.read.parquet(out).filter(F.col("day") == 3)
                ._jdf.queryExecution().executedPlan().toString())
        assert "PartitionFilters" in plan
        import re
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "day" in m.group(1)
        # and the scan must NOT re-filter day as a data predicate
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert pf is None or "day" not in pf.group(1)


class TestSkippingScanPlan:
    def test_residual_filter_is_pushed(self, spark, tmp_path):
        """read_range's residual range predicate must reach the parquet
        scan as PushedFilters (row-group skipping inside the kept
        files), and the plan must be a pure scan+filter — no exchange."""
        from pyspark.sql import functions as F
        from hadoopgis_spark.sources.skipping import read_range, save_range_sorted
        path = str(tmp_path / "t")
        save_range_sorted(
            spark.range(0, 10000).select(F.col("id").alias("k")),
            path, "k", n_files=8)
        df = read_range(spark, path, "k", 2000, 2999)
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re
        m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
        assert m and "GreaterThanOrEqual(k,2000)" in m.group(1), plan[:800]
        assert "LessThanOrEqual(k,2999)" in m.group(1)
        assert "Exchange" not in plan


class TestRound7Plans:
    """Round-7 additions: BPE corpus pass stays a bounded top-k (never a
    global sort), and tile-mode st_disjoint keeps the intersects join
    shape (the per-tile caveat costs no extra exchange)."""

    def test_bpe_wordfreq_is_topk_not_global_sort(self, spark):
        from hadoopgis_spark.operators.bpe import word_frequency_table
        rows = [(i, "the quick brown fox " * (i % 5 + 1)) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        q = word_frequency_table(df, max_words=50)
        plan = formatted_plan(q)
        # cap = per-partition heaps, not Sort+Limit over the token space
        assert "TakeOrderedAndProject" in plan, plan[:1500]
        # one shuffle (the groupBy), with map-side partial aggregation
        assert count_exchanges(q) == 1, plan[:2000]
        assert "partial_count" in plan or "HashAggregate" in plan

    def test_disjoint_tile_join_same_shape_as_intersects(self, spark):
        rows_a = [(i, f"POLYGON (({i} 0, {i + 5} 0, {i} 5, {i} 0))")
                  for i in range(200)]
        a = spark.createDataFrame(rows_a, "id long, geom string")
        rows_b = [(i, f"POINT ({i % 60} {i % 40})") for i in range(200)]
        b = spark.createDataFrame(rows_b, "id long, geom string")
        j = spatial_join(a, b, "st_disjoint", bucket_size=100)
        plan = formatted_plan(j)
        assert count_exchanges(j) == 2, plan[:2000]
        assert "CartesianProduct" not in plan


class TestTpchShapePlans:
    """Round-7 TPC-H shapes: the fact table is scanned once per query
    (self-referencing aggregate branches read a bounded cache, never a
    second scan), dimensions broadcast, outer-join semantics survive
    the optimizer."""

    SF = "/root/testdata/sf0.001"

    def _plan(self, q):
        return q._jdf.queryExecution().executedPlan().toString()

    def test_q9_single_fact_scan_broadcast_dims(self, spark):
        from hadoopgis_spark.workload import rel_q9_profit
        q = rel_q9_profit(spark, self.SF)
        plan = self._plan(q)
        assert plan.count("lineitem.parquet") == 1, plan[:3000]
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q20_nested_aggs_share_one_materialization(self, spark):
        from hadoopgis_spark.workload import rel_q20_dominant_supplier
        q = rel_q20_dominant_supplier(spark, self.SF)
        plan = self._plan(q)
        # the (part, supplier) aggregate is cached: both the max branch
        # and the probe branch read InMemoryTableScan — one fact scan
        assert plan.count("InMemoryTableScan") >= 2, plan[:3000]
        assert "CartesianProduct" not in plan

    def test_q15_argmax_probe_reads_cache(self, spark):
        from hadoopgis_spark.workload import rel_q15_top_supplier
        q = rel_q15_top_supplier(spark, self.SF)
        plan = self._plan(q)
        assert plan.count("InMemoryTableScan") >= 2, plan[:3000]
        assert "CartesianProduct" not in plan

    def test_q13_outer_join_survives_optimizer(self, spark):
        from hadoopgis_spark.workload import rel_q13_custdist
        q = rel_q13_custdist(spark, self.SF)
        plan = self._plan(q)
        # COUNT(o_orderkey) must not let Catalyst rewrite LEFT to INNER
        assert "LeftOuter" in plan, plan[:3000]

    def test_q2_correlated_min_single_fact_scan(self, spark):
        from hadoopgis_spark.workload import rel_q2_min_cost_supplier
        q = rel_q2_min_cost_supplier(spark, self.SF)
        plan = self._plan(q)
        # (part, supplier) agg is cached: the correlated-min branch and
        # the probe branch both read InMemoryTableScan — one fact scan
        # at materialization (the plan STRING prints the cached lineage
        # under each occurrence, so counting "lineitem.parquet" here
        # would double-count — the Q15/Q20 convention)
        assert plan.count("InMemoryTableScan") >= 2, plan[:3000]
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q4_exists_plans_left_semi(self, spark):
        from hadoopgis_spark.workload import rel_q4_priority_check
        q = rel_q4_priority_check(spark, self.SF)
        plan = self._plan(q)
        assert "LeftSemi" in plan, plan[:3000]
        # the lateness predicate rides the equi join as a residual, not
        # a nested-loop condition
        assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
        assert "CartesianProduct" not in plan

    def test_q16_blacklist_is_broadcast_anti(self, spark):
        from hadoopgis_spark.workload import rel_q16_supplier_cnt
        q = rel_q16_supplier_cnt(spark, self.SF)
        plan = self._plan(q)
        assert "LeftAnti" in plan, plan[:3000]
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q17_threshold_single_fact_scan(self, spark):
        from hadoopgis_spark.workload import rel_q17_small_qty_avg
        q = rel_q17_small_qty_avg(spark, self.SF)
        plan = self._plan(q)
        # cached brand slice read by both the threshold and probe branch
        # (string-counting the file would double-count the cached lineage)
        assert plan.count("InMemoryTableScan") >= 2, plan[:3000]
        assert "CartesianProduct" not in plan

    def test_q21_no_fact_self_joins(self, spark):
        # the textbook EXISTS + NOT EXISTS form scans lineitem 3x; the
        # per-order-aggregate rewrite must scan it exactly once
        from hadoopgis_spark.workload import rel_q21_waiting_supplier
        q = rel_q21_waiting_supplier(spark, self.SF)
        plan = self._plan(q)
        assert plan.count("lineitem.parquet") == 1, plan[:3000]
        assert "CartesianProduct" not in plan


class TestRound8Plans:
    """Round-8 additions: the SCALE formulation of global disjoint
    (count-complement) must plan zero all-pairs stages — the whole
    point of replacing the capped broadcast gate — and the lint that
    polices this must stay per-node accurate (its whole-plan substring
    form false-positived on exactly this query)."""

    SF = "/root/testdata/sf0.001"

    def test_disjoint_global_scaled_no_all_pairs(self, spark):
        from hadoopgis_spark.workload import REGISTRY
        df = REGISTRY["sp_disjoint_global_scaled"].fn(spark, self.SF)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        # lint-clean WITHOUT a whitelist entry: the only NLJ is the
        # conditioned broadcast tile assignment, and the complement is
        # a keyed left join onto the intersects counts
        assert lint_plan(df, big_tables=[]) == [], plan[:3000]
        assert "LeftOuter" in plan, plan[:3000]

    def test_lint_flags_truly_conditionless_nlj(self, spark):
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "id2")
        flagged = lint_plan(a.crossJoin(b), big_tables=[])
        assert any("nested-loop" in w or "Cartesian" in w for w in flagged)

    def test_lint_ignores_residual_none_on_equi_join(self, spark):
        # equi left join (Join condition: None on the SMJ node) next to
        # a CONDITIONED broadcast NLJ must not be flagged
        a = spark.range(100).withColumn("k", F.col("id") % 10)
        b = spark.range(10).withColumnRenamed("id", "k2")
        nlj = a.join(F.broadcast(b), a.k < b.k2)  # conditioned NLJ
        agg = nlj.groupBy("k").count()
        out = a.join(agg, "k", "left")
        assert lint_plan(out, big_tables=[]) == []

    def test_zorder_read_is_scan_only_with_pushdown(self, spark, tmp_path_factory):
        from hadoopgis_spark.sources.skipping import read_multi, save_zorder_sorted
        path = str(tmp_path_factory.mktemp("zo") / "tbl")
        df = spark.range(0, 50_000).select(
            F.col("id").alias("rid"),
            (F.col("id") * 7919 % 10_000).alias("a"),
            (F.col("id") * 104729 % 10_000).alias("b"))
        save_zorder_sorted(df, path, ["a", "b"], n_files=16)
        q = read_multi(spark, path, {"a": (100, 300), "b": (4000, 6000)})
        out = q.select("rid")
        plan = formatted_plan(out)
        # pruned scan + residual only: no Exchange, residuals pushed to
        # the parquet reader on BOTH dimensions, rid+a+b pruned schema
        assert count_exchanges(out) == 0, plan[:2000]
        pushed = " ".join(pushed_filters(out))
        assert "GreaterThanOrEqual(a 100)" in pushed, pushed
        assert "LessThanOrEqual(b 6000)" in pushed, pushed


class TestRowBoundedAllowlist:
    def test_allowlist_matches_running_spark(self, spark, tmp_path):
        """_ROW_BOUNDED_OPS (spatial_join's zero-job manifest row bound)
        must name the analyzed-plan nodes THIS Spark version prints for
        every admitted row-preserving/shrinking shape — drift costs
        only an extra probe job, but this pins it visibly (r13 advisor
        item)."""
        import re

        from pyspark.sql import Window
        from hadoopgis_spark.operators.spatial_join import (
            _ROW_BOUNDED_OPS, _manifest_rowcount_upper)
        from hadoopgis_spark.sources import skipping as sk

        path = str(tmp_path / "t")
        sk.save_range_sorted(
            spark.range(0, 100).select(F.col("id").alias("k")),
            path, "k", n_files=2)
        b = spark.read.parquet(path)
        shapes = {
            "filter": b.filter(F.col("k") > 2),
            "project": b.select((F.col("k") + 1).alias("k2")),
            "sort": b.sort("k"),
            "limit": b.limit(3),
            "distinct": b.distinct(),
            "dropdup": b.dropDuplicates(["k"]),
            "repartition": b.repartition(2),
            "range_repart": b.repartitionByRange(2, "k"),
            "sample": b.sample(0.5, seed=1),
            "aggregate": b.groupBy("k").agg(F.count(F.lit(1)).alias("c")),
            "window": b.select(
                "k", F.row_number().over(Window.orderBy("k")).alias("rn")),
            "offset": b.offset(2),
        }
        pat = re.compile(r"^[\s:+\-]*'?([A-Za-z]+)")
        for name, df in shapes.items():
            plan = df._jdf.queryExecution().analyzed().toString()
            for line in plan.splitlines():
                m = pat.match(line)
                if m:
                    assert m.group(1) in _ROW_BOUNDED_OPS, (name, line)
            # ... and the zero-job bound actually resolves on each shape
            assert _manifest_rowcount_upper(df) == 100, name
        # row-multiplying shapes still refuse (probe fallback)
        assert _manifest_rowcount_upper(
            b.withColumn("e", F.explode(F.array(F.lit(1), F.lit(2))))) is None
