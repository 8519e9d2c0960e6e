"""As-of join: brute-force parity, directions, tolerance, plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from hadoopgis_spark.operators.asof import asof_join


def _brute(left, right, direction="backward", tolerance=None):
    """Reference semantics, row at a time."""
    out = []
    for lk, lt, lv in left:
        best = None
        for rk, rt, rv in right:
            if rk != lk:
                continue
            if direction == "backward":
                if rt > lt or (tolerance is not None and rt < lt - tolerance):
                    continue
                if best is None or rt > best[0]:
                    best = (rt, rv)
            else:
                if rt < lt or (tolerance is not None and rt > lt + tolerance):
                    continue
                if best is None or rt < best[0]:
                    best = (rt, rv)
        out.append((lk, lt, lv, best[0] if best else None, best[1] if best else None))
    return sorted(out)


def _frames(spark, seed, n_left=120, n_right=90, n_keys=7):
    rng = random.Random(seed)
    left = [(rng.randrange(n_keys), rng.randrange(1000), i) for i in range(n_left)]
    right = [(rng.randrange(n_keys), rng.randrange(1000), 1000 + i) for i in range(n_right)]
    # unique (key, t) on the right: as-of is only deterministic then
    seen = set()
    right = [r for r in right if not (r[:2] in seen or seen.add(r[:2]))]
    ldf = spark.createDataFrame(left, "k int, t int, lv int")
    rdf = spark.createDataFrame(right, "k int, t int, rv int")
    return left, right, ldf, rdf


class TestAsofJoin:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_matches_bruteforce(self, spark, seed, direction):
        left, right, ldf, rdf = _frames(spark, seed)
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join(ldf, rdf, on="t", by="k", direction=direction).collect()
        )
        assert got == _brute(left, right, direction)

    @pytest.mark.parametrize("tolerance", [0, 25, 100])
    def test_tolerance(self, spark, tolerance):
        left, right, ldf, rdf = _frames(spark, 3)
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join(ldf, rdf, on="t", by="k", tolerance=tolerance).collect()
        )
        assert got == _brute(left, right, "backward", tolerance)

    def test_tie_matches_equal_time(self, spark):
        ldf = spark.createDataFrame([(1, 10, 0)], "k int, t int, lv int")
        rdf = spark.createDataFrame([(1, 10, 5), (1, 9, 4)], "k int, t int, rv int")
        row = asof_join(ldf, rdf, on="t", by="k").collect()[0]
        assert (row.t_right, row.rv) == (10, 5)  # <=, not <

    def test_no_match_is_null(self, spark):
        ldf = spark.createDataFrame([(1, 5, 0)], "k int, t int, lv int")
        rdf = spark.createDataFrame([(1, 6, 9)], "k int, t int, rv int")
        row = asof_join(ldf, rdf, on="t", by="k").collect()[0]
        assert row.t_right is None and row.rv is None

    def test_collision_suffix_and_multi_key(self, spark):
        ldf = spark.createDataFrame([(1, 2, 10, 7.0)], "k1 int, k2 int, t int, v double")
        rdf = spark.createDataFrame(
            [(1, 2, 8, 1.5), (1, 3, 9, 9.9)], "k1 int, k2 int, t int, v double"
        )
        out = asof_join(ldf, rdf, on="t", by=["k1", "k2"])
        assert "v_right" in out.columns
        row = out.collect()[0]
        assert (row.v, row.t_right, row.v_right) == (7.0, 8, 1.5)

    def test_single_shuffle_plan(self, spark):
        """The union-merge shape costs exactly one exchange (plus the
        window sort) — the 100 TB contract for this operator."""
        ldf = spark.range(100).select(
            (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.lit(1).alias("lv")
        )
        rdf = spark.range(50).select(
            (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("t"),
            F.lit(2).alias("rv"),
        )
        plan = asof_join(ldf, rdf, on="t", by="k")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan


class TestFunnel:
    def _events(self, spark):
        rows = [
            # u1 completes all three in order
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            # u2 clicks BEFORE viewing — the click must not count, and
            # without a qualifying click the purchase can't either: level 1
            (2, "click", 5), (2, "view", 10), (2, "purchase", 20),
            # u3 views only
            (3, "view", 7),
            # u4 never enters the funnel
            (4, "purchase", 1), (4, "error", 2),
            # u5: same-timestamp click is NOT strictly after the view
            (5, "view", 10), (5, "click", 10), (5, "purchase", 12),
        ]
        return spark.createDataFrame(rows, "user_id int, event_type string, t int")

    def test_levels(self, spark):
        from hadoopgis_spark.operators.funnel import funnel_times

        out = {
            r.user_id: (r.t1, r.t2, r.t3, r.funnel_level)
            for r in funnel_times(
                self._events(spark), ["view", "click", "purchase"]
            ).collect()
        }
        assert out[1] == (10, 20, 30, 3)
        assert out[2] == (10, None, None, 1)
        assert out[3] == (7, None, None, 1)
        assert out[4] == (None, None, None, 0)
        assert out[5] == (10, None, None, 1)

    def test_single_exchange_plan(self, spark):
        """All step windows + the final collapse share one hash
        partitioning on the entity — exactly one exchange."""
        from hadoopgis_spark.operators.funnel import funnel_times

        plan = (
            funnel_times(self._events(spark), ["view", "click", "purchase"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") == 1, plan


class TestPiiScrub:
    def test_redaction_and_counts(self, spark):
        from hadoopgis_spark.functions.text import pii_count, pii_redact

        rows = [
            (1, "mail me at jo.doe+x@sub.example.co.uk or 192.168.0.1 now"),
            (2, "call +1 555 0107 or +44 20 7946 0958 thanks"),
            (3, "plain text, no pii at all"),
        ]
        df = spark.createDataFrame(rows, "id int, text string")
        out = {
            r.id: (r.e, r.i, r.p, r.red)
            for r in df.select(
                "id",
                pii_count(F.col("text"), "email").alias("e"),
                pii_count(F.col("text"), "ipv4").alias("i"),
                pii_count(F.col("text"), "phone").alias("p"),
                pii_redact(F.col("text")).alias("red"),
            ).collect()
        }
        assert out[1][:3] == (1, 1, 0)
        assert out[1][3] == "mail me at <EMAIL> or <IP> now"
        assert out[2][:3] == (0, 0, 2)
        assert out[2][3] == "call <PHONE> or <PHONE> thanks"
        assert out[3] == (0, 0, 0, "plain text, no pii at all")

    def test_map_only_plan(self, spark):
        from hadoopgis_spark.functions.text import pii_redact

        df = spark.createDataFrame([(1, "x")], "id int, text string")
        plan = (
            df.select(pii_redact(F.col("text")).alias("r"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestDsirWeights:
    def test_target_docs_score_higher(self, spark):
        """Documents drawn from the target vocabulary must outscore
        documents from a disjoint vocabulary."""
        from hadoopgis_spark.operators.curate import dsir_weights

        target_docs = [(i, "alpha beta gamma delta " * 5) for i in range(5)]
        other_docs = [(10 + i, "omega psi chi phi " * 5) for i in range(5)]
        corpus = spark.createDataFrame(
            target_docs + other_docs, "doc_id long, text string"
        )
        target = corpus.filter(F.col("doc_id") < 5)
        scores = {r.id: r.score for r in dsir_weights(corpus, target).collect()}
        assert min(scores[i] for i in range(5)) > max(scores[10 + i] for i in range(5))

    def test_empty_doc_scores_zero(self, spark):
        from hadoopgis_spark.operators.curate import dsir_weights

        corpus = spark.createDataFrame(
            [(1, "words here"), (2, "   ")], "doc_id long, text string"
        )
        out = {r.id: (r.n_tokens, r.score) for r in
               dsir_weights(corpus, corpus.limit(1)).collect()}
        assert out[2] == (0, 0)
        assert out[1][0] == 2 and out[1][1] > 0


class TestKmeansAssign:
    def test_matches_numpy_argmin(self, spark):
        import numpy as np

        from hadoopgis_spark.operators.similarity import ivf_assign

        rng = np.random.RandomState(7)
        vecs = rng.randn(200, 8).astype("float64")
        cents = rng.randn(4, 8).tolist()
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(200)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.id: r.cid
            for r in ivf_assign(df, n_centroids=4, dim=8, centroids=cents).collect()
        }
        c = np.array(cents)
        want = np.argmin(
            ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1
        )
        assert got == {i: int(want[i]) for i in range(200)}


class TestSlidingWindows:
    def test_sliding_stream_matches_batch(self, spark, tmp_path):
        """Real streaming run of the hopping-window rollup (2h every 1h)
        equals the batch run of the same expression — and each event
        contributes to exactly two hops."""
        from hadoopgis_spark.streaming import windowed_event_counts
        from hadoopgis_spark.streaming.events import normalize_event_ts

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        src = str(tmp_path / "slide_src")
        ev = normalize_event_ts(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        )
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        agg = windowed_event_counts(
            stream, window="2 hours", slide="1 hour", watermark="1 hour"
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("slide_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM slide_counts").collect()
        }
        batch = {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in windowed_event_counts(
                ev, window="2 hours", slide="1 hour"
            ).collect()
        }
        assert got == batch
        # every event lands in window/slide = 2 hops
        n_events = ev.count()
        assert sum(v[0] for v in batch.values()) == 2 * n_events


class TestChunkDocs:
    def test_chunk_invariants(self, spark):
        """Chunks tile the document: strides of 400, all but possibly
        the last chunk are full-size, empty docs produce no chunks."""
        from hadoopgis_spark.workload import cur_chunk_docs  # gate fn needs sf dir

        rows = [
            (1, "a" * 1300),   # 4 chunks: starts 0/400/800/1200
            (2, "b" * 400),    # 1 chunk, exactly one stride
            (3, "c" * 401),    # 2 chunks: second is 1 char
            (4, ""),           # no chunks
            (5, "d" * 5),      # 1 short chunk
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # reuse the gate's expression via a temp table-free call path:
        # build the same projection inline
        import hadoopgis_spark.workload as W
        from pyspark.sql import functions as F  # noqa: F811

        size, stride = 500, 400
        n = F.when(F.length("text") == 0, F.lit(0)).otherwise(
            F.expr(f"(length(text) - 1) div {stride}") + 1
        )
        chunks = F.when(n == 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(0), (n - 1).cast("int"))
        )
        out = df.select(
            "doc_id",
            F.explode(
                F.transform(
                    chunks,
                    lambda i: F.struct(
                        i.alias("chunk_idx"),
                        F.substring(F.col("text"), i * stride + 1, size).alias("chunk"),
                    ),
                )
            ).alias("c"),
        ).select("doc_id", "c.chunk_idx", F.length("c.chunk").alias("n"))
        got = {(r.doc_id, r.chunk_idx): r.n for r in out.collect()}
        assert {k[0] for k in got} == {1, 2, 3, 5}
        assert [got[(1, i)] for i in range(4)] == [500, 500, 500, 100]
        assert got[(2, 0)] == 400
        assert [got[(3, i)] for i in range(2)] == [401, 1]
        assert got[(5, 0)] == 5


class TestAsofBroadcast:
    @pytest.mark.parametrize("seed", [0, 4])
    @pytest.mark.parametrize("tolerance", [None, 50])
    def test_matches_shuffle_strategy(self, spark, seed, tolerance):
        from hadoopgis_spark.operators.asof import asof_join_broadcast

        left, right, ldf, rdf = _frames(spark, seed)
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join_broadcast(
                ldf, rdf, on="t", by="k", tolerance=tolerance
            ).collect()
        )
        assert got == _brute(left, right, "backward", tolerance)

    def test_left_never_shuffled(self, spark):
        """Plan contract: only the SMALL side's history aggregation
        exchanges; the left frame reaches the broadcast join unshuffled
        (no SortMergeJoin, no Window)."""
        from hadoopgis_spark.operators.asof import asof_join_broadcast

        ldf = spark.range(1000).select(
            (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.lit(1).alias("lv")
        )
        rdf = spark.range(50).select(
            (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("t"),
            F.lit(2).alias("rv"),
        )
        plan = (
            asof_join_broadcast(ldf, rdf, on="t", by="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan and "Window" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan  # right agg only

    def test_streaming_left_frame(self, spark, tmp_path):
        """The broadcast strategy is stateless — a streaming left frame
        runs through the identical plan; results equal the batch run."""
        from hadoopgis_spark.operators.asof import asof_join_broadcast

        ldf = spark.range(200).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("t"),
            F.col("id").alias("lv"),
        )
        rdf = spark.range(20).select(
            (F.col("id") % 3).alias("k"), (F.col("id") * 9).alias("t"),
            (F.col("id") + 100).alias("rv"),
        )
        src = str(tmp_path / "asof_left")
        ldf.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ldf.schema).parquet(src)
        out = asof_join_broadcast(stream, rdf, on="t", by="k")
        q = (
            out.writeStream.format("memory").queryName("asof_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM asof_stream").collect()
        )
        want = sorted(
            tuple(r) for r in asof_join_broadcast(ldf, rdf, on="t", by="k").collect()
        )
        assert got == want and len(got) == 200


class TestSessionWindowNative:
    def test_stream_matches_batch(self, spark, tmp_path):
        from hadoopgis_spark.streaming.events import normalize_event_ts
        from hadoopgis_spark.streaming.sessions import session_window_rollup

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ev = normalize_event_ts(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        )
        src = str(tmp_path / "sess_src")
        ev.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        agg = session_window_rollup(stream)
        q = (
            agg.writeStream.format("memory").queryName("sess_native")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM sess_native").collect()
        )
        want = sorted(tuple(r) for r in session_window_rollup(ev).collect())
        assert got == want and len(got) > 0

    def test_matches_custom_sessionize(self, spark):
        """The native session_window path and the custom stateful
        operator agree on (user, session_start, n_events) — two
        independent implementations of the same gap semantics."""
        from hadoopgis_spark.streaming.events import normalize_event_ts
        from hadoopgis_spark.streaming.sessions import (
            session_window_rollup,
            sessionize,
        )

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = normalize_event_ts(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        )
        native = {
            (r.user_id, r.session_start): r.n_events
            for r in session_window_rollup(ev).collect()
        }
        custom = {
            (r.user_id, r.session_start // 1_000_000_000): r.n_events
            for r in sessionize(ev).collect()
        }
        assert native == custom


class TestAsofAutoStrategy:
    def test_auto_picks_broadcast_for_small_right(self, spark):
        left, right, ldf, rdf = _frames(spark, 5)
        spark.conf.set("hgs.broadcastRowThreshold", "5000")
        out = asof_join(ldf, rdf, on="t", by="k", strategy="auto")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "Window" not in plan
        got = sorted((r.k, r.t, r.lv, r.t_right, r.rv) for r in out.collect())
        assert got == _brute(left, right)

    def test_auto_falls_back_to_shuffle(self, spark):
        left, right, ldf, rdf = _frames(spark, 6)
        spark.conf.set("hgs.broadcastRowThreshold", "10")
        try:
            out = asof_join(ldf, rdf, on="t", by="k", strategy="auto")
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Window" in plan  # union-merge path
            got = sorted((r.k, r.t, r.lv, r.t_right, r.rv) for r in out.collect())
            assert got == _brute(left, right)
        finally:
            spark.conf.set("hgs.broadcastRowThreshold", "5000")

    @pytest.mark.parametrize("strategy", ["broadcast", "bucketed"])
    def test_forward_via_time_mirror(self, spark, strategy):
        """forward on the backward-only strategies = negated backward."""
        left, right, ldf, rdf = _frames(spark, 7)
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join(
                ldf, rdf, on="t", by="k", strategy=strategy, direction="forward"
            ).collect()
        )
        assert got == _brute(left, right, "forward")


class TestAsofBucketed:
    @pytest.mark.parametrize("seed", [0, 8])
    @pytest.mark.parametrize("n_buckets", [1, 4, 32])
    def test_matches_shuffle_strategy(self, spark, seed, n_buckets):
        from hadoopgis_spark.operators.asof import asof_join_bucketed

        left, right, ldf, rdf = _frames(spark, seed)
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join_bucketed(
                ldf, rdf, on="t", by="k", n_buckets=n_buckets
            ).collect()
        )
        assert got == _brute(left, right)

    def test_hot_key_with_tolerance(self, spark):
        """80% of left rows on one key; carry seeding + tolerance filter
        must still match the brute force exactly."""
        from hadoopgis_spark.operators.asof import asof_join_bucketed

        rng = random.Random(11)
        left = [(0 if i % 5 else rng.randrange(1, 4), rng.randrange(1000), i)
                for i in range(400)]
        right, seen = [], set()
        for i in range(60):
            r = (rng.randrange(4), rng.randrange(1000), 1000 + i)
            if r[:2] not in seen:
                seen.add(r[:2]); right.append(r)
        ldf = spark.createDataFrame(left, "k int, t int, lv int")
        rdf = spark.createDataFrame(right, "k int, t int, rv int")
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join_bucketed(
                ldf, rdf, on="t", by="k", tolerance=120, n_buckets=8
            ).collect()
        )
        assert got == _brute(left, right, "backward", 120)

    def test_degenerate_right_range_falls_back(self, spark):
        from hadoopgis_spark.operators.asof import asof_join_bucketed

        ldf = spark.createDataFrame([(1, 5, 0), (1, 3, 1)], "k int, t int, lv int")
        rdf = spark.createDataFrame([(1, 4, 9)], "k int, t int, rv int")  # lo == hi
        got = sorted(
            (r.k, r.t, r.t_right, r.rv)
            for r in asof_join_bucketed(ldf, rdf, on="t", by="k").collect()
        )
        assert got == [(1, 3, None, None), (1, 5, 4, 9)]

    def test_null_times_agree_across_strategies(self, spark):
        """Null right times never match (dropped at entry); null left
        times match nothing — identical across all three strategies."""
        from hadoopgis_spark.operators.asof import (
            asof_join,
            asof_join_broadcast,
            asof_join_bucketed,
        )

        ldf = spark.createDataFrame(
            [(1, 10, 0), (1, None, 1), (2, 50, 2), (2, None, 3)],
            "k int, t int, lv int",
        )
        rdf = spark.createDataFrame(
            [(1, 8, 100), (1, None, 666), (2, None, 667), (2, 40, 101)],
            "k int, t int, rv int",
        )
        want = sorted(
            [(1, 10, 0, 8, 100), (1, None, 1, None, None),
             (2, 50, 2, 40, 101), (2, None, 3, None, None)],
            key=repr,
        )
        for out in (
            asof_join(ldf, rdf, on="t", by="k"),
            asof_join_broadcast(ldf, rdf, on="t", by="k"),
            asof_join_bucketed(ldf, rdf, on="t", by="k", n_buckets=4),
        ):
            got = sorted(
                ((r.k, r.t, r.lv, r.t_right, r.rv) for r in out.collect()), key=repr
            )
            assert got == want

    def test_window_partitions_include_bucket(self, spark):
        """Plan contract: the big window partitions on (key, bucket) —
        the hot key spreads across n_buckets tasks."""
        from hadoopgis_spark.operators.asof import asof_join_bucketed

        _, _, ldf, rdf = _frames(spark, 9)
        plan = (
            asof_join_bucketed(ldf, rdf, on="t", by="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "windowspecdefinition(k#" in plan.replace(" ", "")[:0] or "__b" in plan
        # the union-side exchange keys on (k, __b), not k alone
        import re
        ex = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert any("__b" in l for l in ex), plan


class TestAsofHypothesis:
    def test_all_strategies_agree_property(self, spark):
        """Hypothesis: for random workloads (duplicate left times, hot
        keys, negative times, empty sides) the three physical strategies
        and the brute force all agree row-for-row."""
        from hypothesis import given, settings, strategies as st

        from hadoopgis_spark.operators.asof import (
            asof_join,
            asof_join_broadcast,
            asof_join_bucketed,
        )

        @settings(max_examples=8, deadline=None)
        @given(
            n_left=st.integers(0, 60),
            n_right=st.integers(0, 40),
            n_keys=st.integers(1, 5),
            t_lo=st.integers(-500, 0),
            hot=st.booleans(),
            seed=st.integers(0, 2**16),
        )
        def run(n_left, n_right, n_keys, t_lo, hot, seed):
            import random

            rng = random.Random(seed)

            def key():
                return 0 if (hot and rng.random() < 0.6) else rng.randrange(n_keys)

            left = [(key(), rng.randint(t_lo, 500), i) for i in range(n_left)]
            right, seen = [], set()
            for i in range(n_right):
                r = (key(), rng.randint(t_lo, 500), 1000 + i)
                if r[:2] not in seen:
                    seen.add(r[:2])
                    right.append(r)
            ldf = spark.createDataFrame(left, "k int, t int, lv int")
            rdf = spark.createDataFrame(right, "k int, t int, rv int")
            want = _brute(left, right)
            for fn in (
                lambda: asof_join(ldf, rdf, on="t", by="k"),
                lambda: asof_join_broadcast(ldf, rdf, on="t", by="k"),
                lambda: asof_join_bucketed(ldf, rdf, on="t", by="k", n_buckets=4),
            ):
                got = sorted(
                    (r.k, r.t, r.lv, r.t_right, r.rv) for r in fn().collect()
                )
                assert got == want

        run()


class TestAsofBucketedGuards:
    def test_timestamp_column_refused_clearly(self, spark):
        import datetime

        from hadoopgis_spark.operators.asof import asof_join_bucketed

        rows = [(1, datetime.datetime(2024, 1, 1), 0), (1, datetime.datetime(2024, 1, 2), 1)]
        ldf = spark.createDataFrame(rows, "k int, t timestamp, lv int")
        with pytest.raises(ValueError, match="numeric time column"):
            asof_join_bucketed(ldf, ldf.withColumnRenamed("lv", "rv"), on="t", by="k")


class TestFunnelStream:
    def test_stream_matches_batch_under_ordered_delivery(self, spark, tmp_path):
        """Two ordered micro-batches (maxFilesPerTrigger=1): the latest
        update per user equals the batch funnel, and state carries the
        funnel across the batch boundary."""
        import os

        from hadoopgis_spark.operators.funnel import funnel_times
        from hadoopgis_spark.streaming.funnel import funnel_stream

        early = [
            (1, "view", 10), (1, "click", 20),
            (2, "click", 5), (2, "view", 10),
            (3, "view", 7),
        ]
        late = [
            (1, "purchase", 30),      # completes u1 using state from batch 1
            (2, "purchase", 20),      # u2 still has no qualifying click
            (3, "click", 9), (3, "purchase", 11),
        ]
        src = str(tmp_path / "funnel_src")
        os.makedirs(src)
        schema = "user_id long, event_type string, ts long"
        spark.createDataFrame(early, schema).coalesce(1).write.mode("overwrite").parquet(src + "/b1")
        spark.createDataFrame(late, schema).coalesce(1).write.mode("overwrite").parquet(src + "/b2")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        out = funnel_stream(stream, ["view", "click", "purchase"])
        q = (
            out.writeStream.format("memory").queryName("funnel_updates")
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        updates = spark.sql("SELECT * FROM funnel_updates").collect()
        latest = {}
        for r in updates:  # update-mode: later rows supersede
            latest[r.user_id] = (r.t1, r.t2, r.t3, r.funnel_level)
        batch_events = spark.createDataFrame(early + late, schema)
        want = {
            r.user_id: (r.t1, r.t2, r.t3, r.funnel_level)
            for r in funnel_times(
                batch_events, ["view", "click", "purchase"], time_col="ts"
            ).collect()
            if r.funnel_level > 0
        }
        assert latest == want
        # u1 must have emitted an update in BOTH batches (state advanced twice)
        assert sum(1 for r in updates if r.user_id == 1) == 2


class TestAsofCobucketed:
    def _tables(self, spark, seed, tag, n_buckets=8):
        from hadoopgis_spark.sources import save_asof_facts, save_asof_history

        left, right, ldf, rdf = _frames(spark, seed)
        save_asof_facts(ldf, f"asof_facts_{tag}", by="k", n_buckets=n_buckets)
        save_asof_history(rdf, f"asof_hist_{tag}", on="t", by="k", n_buckets=n_buckets)
        return left, right

    @pytest.mark.parametrize("tolerance", [None, 100])
    def test_matches_shuffle_strategy(self, spark, tolerance):
        from hadoopgis_spark.sources import asof_join_cobucketed

        left, right = self._tables(spark, 4, f"par{tolerance}")
        got = sorted(
            (r.k, r.t, r.lv, r.t_right, r.rv)
            for r in asof_join_cobucketed(
                spark, f"asof_facts_par{tolerance}", f"asof_hist_par{tolerance}",
                on="t", by="k", tolerance=tolerance,
            ).collect()
        )
        assert got == _brute(left, right, "backward", tolerance)

    def test_zero_exchange_plan(self, spark):
        """The whole point: both sides pre-bucketed on the key → the
        query-time join plans ZERO shuffle exchanges."""
        from hadoopgis_spark.plans.inspect import count_exchanges
        from hadoopgis_spark.sources import asof_join_cobucketed

        self._tables(spark, 5, "plan")
        j = asof_join_cobucketed(spark, "asof_facts_plan", "asof_hist_plan", on="t", by="k")
        assert count_exchanges(j) == 0, j._jdf.queryExecution().executedPlan().toString()

    def test_mismatched_layout_refused(self, spark):
        from hadoopgis_spark.sources import (
            asof_join_cobucketed,
            save_asof_facts,
            save_asof_history,
        )

        _, _, ldf, rdf = _frames(spark, 6)
        save_asof_facts(ldf, "asof_facts_mm", by="k", n_buckets=8)
        save_asof_history(rdf, "asof_hist_mm", on="t", by="k", n_buckets=4)
        with pytest.raises(ValueError, match="bucket-count mismatch"):
            asof_join_cobucketed(spark, "asof_facts_mm", "asof_hist_mm", on="t", by="k")
        with pytest.raises(ValueError, match="not saved by"):
            asof_join_cobucketed(spark, "asof_hist_mm", "asof_hist_mm", on="t", by="k")
