"""Bloom-filter equality skipping: build/probe parity, sharpness,
incremental maintenance, conservativeness, and plan contracts."""

import os

import pytest
from pyspark.sql import functions as F

from hadoopgis_spark.sources.bloom import (
    _params,
    _positions,
    build_bloom_index,
    prune_files_eq,
    read_eq,
)


def _write_scattered(spark, path, n=20_000, n_files=16):
    """A table clustered on ts whose id column is SCATTERED across
    files — the zonemap-can't-help case bloom exists for. Each id
    appears in exactly one file (ids are a permutation), but file
    min/max id ranges all span the whole domain."""
    df = (
        spark.range(n)
        .withColumn("ts", F.col("id"))  # clustering dim
        # multiplicative permutation scatters ids across the ts order
        .withColumn("id", (F.col("id") * 7919) % n)
        .withColumn("name", F.concat(F.lit("u"), F.col("id")))
        .withColumn("val", F.col("id") % 97)
    )
    (df.repartitionByRange(n_files, "ts").sortWithinPartitions("ts")
       .write.mode("overwrite").parquet(path))
    return n


class TestBloomMath:
    def test_params_sizing(self):
        m, k = _params(100_000, 0.01)
        assert m % 8 == 0
        assert 900_000 < m < 1_100_000  # ~9.6 bits/key at 1%
        assert 5 <= k <= 9

    def test_positions_deterministic_and_in_range(self):
        for v in [0, 1, 2**63 - 1, -5, "x", "", "héllo"]:
            p1 = _positions(v, 1024, 7)
            p2 = _positions(v, 1024, 7)
            assert p1 == p2
            assert all(0 <= p < 1024 for p in p1)

    def test_int_and_str_domains_disjoint(self):
        assert _positions(7, 4096, 5) != _positions("7", 4096, 5)

    def test_unsupported_types_refused(self):
        for bad in [1.5, True, None]:
            with pytest.raises(TypeError):
                _positions(bad, 64, 2)

    def test_vectorized_build_matches_scalar_probe(self):
        """The numpy splitmix64 build path and the python-int probe path
        MUST set/test the same bits — including negative keys (two's-
        complement wrap) and 64-bit extremes."""
        import numpy as np

        from hadoopgis_spark.sources.bloom import _set_bits_vectorized

        m, k = 8192, 5
        keys = np.array([0, 1, -1, -123456789, 2**62, -(2**62), 7919],
                        dtype=np.int64)
        bits = np.zeros(m // 8, dtype=np.uint8)
        _set_bits_vectorized(bits, keys, m, k)
        expect = np.zeros_like(bits)
        for v in keys.tolist():
            for pos in _positions(v, m, k):
                expect[pos >> 3] |= np.uint8(1 << (pos & 7))
        assert np.array_equal(bits, expect)
        # string fallback path too
        sbits = np.zeros(m // 8, dtype=np.uint8)
        _set_bits_vectorized(sbits, np.array(["a", "b", ""], dtype=object),
                             m, k)
        sexpect = np.zeros_like(sbits)
        for v in ["a", "b", ""]:
            for pos in _positions(v, m, k):
                sexpect[pos >> 3] |= np.uint8(1 << (pos & 7))
        assert np.array_equal(sbits, sexpect)


class TestBloomProperties:
    def test_no_false_negatives_property(self):
        """Hypothesis: for random int/str key sets and filter params,
        every inserted key tests present (bloom's defining invariant —
        a false negative would silently lose rows)."""
        from hypothesis import given, settings, strategies as st

        import numpy as np

        from hadoopgis_spark.sources.bloom import (
            _params, _positions, _set_bits_vectorized)

        @settings(max_examples=30, deadline=None)
        @given(
            ints=st.lists(st.integers(-(2**63), 2**63 - 1), max_size=60),
            strs=st.lists(st.text(max_size=12), max_size=40),
            n_items=st.integers(1, 500),
            fpp=st.floats(0.001, 0.2),
        )
        def run(ints, strs, n_items, fpp):
            m, k = _params(n_items, fpp)
            bits = np.zeros(m // 8, dtype=np.uint8)
            _set_bits_vectorized(bits, np.array(ints, dtype=np.int64), m, k)
            _set_bits_vectorized(bits, np.array(strs, dtype=object), m, k)
            for v in ints + strs:
                assert all(
                    (bits[p >> 3] >> (p & 7)) & 1 for p in _positions(v, m, k))

        run()


class TestBloomBuildProbe:
    def test_no_false_negatives_and_sharp(self, spark, tmp_path):
        path = str(tmp_path / "t")
        n = _write_scattered(spark, path, n=20_000, n_files=16)
        info = build_bloom_index(spark, path, ["id", "name"],
                                 n_items=2_000, fpp=0.01)
        assert info == {"indexed": 16, "total": 16}
        hits = 0
        for key in [0, 1, 4242, n - 1]:
            kept, total = prune_files_eq(spark, path, {"id": key})
            assert total == 16
            # the key lives in exactly one file; fpp=1% over 15 others
            assert 1 <= len(kept) <= 4
            got = read_eq(spark, path, {"id": key}).collect()
            assert len(got) == 1 and got[0]["id"] == key
            hits += len(kept)
        # string column probes too
        got = read_eq(spark, path, {"name": "u777"}).collect()
        assert len(got) == 1 and got[0]["id"] == 777

    def test_absent_key_prunes_everything(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=5_000, n_files=8)
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        kept, total = prune_files_eq(spark, path, {"id": 10_000_000})
        assert total == 8
        assert len(kept) <= 1  # fpp stragglers only
        assert read_eq(spark, path, {"id": 10_000_000}).count() == 0

    def test_conjunction_intersects(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=5_000, n_files=8)
        build_bloom_index(spark, path, ["id", "name"], n_items=1_000)
        # consistent pair → the row; inconsistent pair → empty
        assert read_eq(spark, path, {"id": 9, "name": "u9"}).count() == 1
        assert read_eq(spark, path, {"id": 9, "name": "u10"}).count() == 0

    def test_no_index_keeps_everything(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=2_000, n_files=4)
        kept, total = prune_files_eq(spark, path, {"id": 7})
        assert len(kept) == total == 4
        assert read_eq(spark, path, {"id": 7}).count() == 1

    def test_probe_value_type_checked(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=1_000, n_files=2)
        build_bloom_index(spark, path, ["id"], n_items=500)
        with pytest.raises(TypeError):
            prune_files_eq(spark, path, {"id": 1.5})
        with pytest.raises(ValueError):
            prune_files_eq(spark, path, {"id": []})

    def test_in_list_probe(self, spark, tmp_path):
        path = str(tmp_path / "t")
        n = _write_scattered(spark, path, n=10_000, n_files=16)
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        keys = [3, 4444, 9_999]
        # union semantics: keeps the union of each key's files, prunes
        # the rest; residual isin returns exactly the 3 rows
        kept, total = prune_files_eq(spark, path, {"id": keys})
        assert total == 16 and 1 <= len(kept) <= 6
        got = sorted(r.id for r in read_eq(spark, path, {"id": keys}).collect())
        assert got == keys
        # mixed present/absent: absent members add nothing
        got = read_eq(spark, path, {"id": [3, n + 123456]}).collect()
        assert [r.id for r in got] == [3]

    def test_layout_health_reports_bloom_coverage(self, spark, tmp_path):
        from hadoopgis_spark.sources.skipping import (
            layout_health, save_range_sorted)

        path = str(tmp_path / "t")
        df = (spark.range(4_000)
              .withColumn("ts", F.col("id"))
              .withColumn("id", (F.col("id") * 7919) % 4_000))
        save_range_sorted(df, path, "ts", n_files=4)
        h = layout_health(spark, path, "ts")
        assert "bloom_unindexed" not in h  # no index yet
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        assert layout_health(spark, path, "ts")["bloom_unindexed"] == {"id": 0}
        # batch types must match the stored layout exactly (round-12
        # schema guard: an int32 batch in a bigint table would make the
        # read schema footer-dependent)
        extra = spark.range(1).select(
            F.lit(9_999).cast("long").alias("ts"),
            F.lit(8_888).cast("long").alias("id"))
        from hadoopgis_spark.sources.skipping import append_range_sorted
        append_range_sorted(extra, path, "ts", n_files=1)
        h = layout_health(spark, path, "ts")
        assert h["bloom_unindexed"] == {"id": 1}  # the re-index signal
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        assert layout_health(spark, path, "ts")["bloom_unindexed"] == {"id": 0}


class TestBloomMaintenance:
    def test_unindexed_append_is_kept_then_indexed_incrementally(
            self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=4_000, n_files=8)
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        # append a batch carrying a brand-new key, NO index rebuild
        extra = (spark.range(1).select(
            F.lit(999_999).alias("ts"), F.lit(777_777).alias("id"),
            F.lit("u777777").alias("name"), F.lit(0).alias("val")))
        extra.coalesce(1).write.mode("append").parquet(path)
        # conservative: the new (indexless) file is always kept
        kept, total = prune_files_eq(spark, path, {"id": 777_777})
        assert total == 9
        assert any("part-" in p for p in kept) and len(kept) >= 1
        assert read_eq(spark, path, {"id": 777_777}).count() == 1
        # incremental build reads ONLY the new file
        info = build_bloom_index(spark, path, ["id"], n_items=1_000)
        assert info == {"indexed": 1, "total": 9}
        assert read_eq(spark, path, {"id": 777_777}).count() == 1
        # an old key still resolves and prunes sharply
        kept, _ = prune_files_eq(spark, path, {"id": 42})
        assert len(kept) <= 3

    def test_rebuild_is_noop_when_covered(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=1_000, n_files=4)
        build_bloom_index(spark, path, ["id"], n_items=500)
        info = build_bloom_index(spark, path, ["id"], n_items=500)
        assert info == {"indexed": 0, "total": 4}

    def test_new_column_triggers_rebuild_keeping_old(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=1_000, n_files=4)
        build_bloom_index(spark, path, ["id"], n_items=500)
        info = build_bloom_index(spark, path, ["id", "name"], n_items=500)
        assert info["indexed"] == 4  # name rows missing everywhere
        assert read_eq(spark, path, {"name": "u5"}).count() == 1
        kept, _ = prune_files_eq(spark, path, {"id": 5})
        assert len(kept) <= 3  # id rows survived the swap

    def test_null_int_keys_build_and_probe(self, spark, tmp_path):
        """A NULLABLE int key column must index its non-null keys: the
        Arrow->pandas null-padding turns int64 into float64 inside
        mapInPandas, and the dropna'd values used to reach _canon as
        floats and abort the build (round-9 advisor finding — one null
        key in a micro-batch killed a streaming ingest's bloom loop)."""
        path = str(tmp_path / "t")
        df = (spark.range(2_000)
              .withColumn("ts", F.col("id"))
              .withColumn("id", F.when(F.col("id") % 100 == 7, None)
                          .otherwise((F.col("id") * 7919) % 2_000)))
        (df.repartitionByRange(4, "ts").sortWithinPartitions("ts")
           .write.mode("overwrite").parquet(path))
        info = build_bloom_index(spark, path, ["id"], n_items=1_000)
        assert info == {"indexed": 4, "total": 4}
        # non-null keys resolve exactly through the pruned read
        got = read_eq(spark, path, {"id": (13 * 7919) % 2_000}).collect()
        assert len(got) >= 1
        # an absent key prunes every file (no false 'present' from the
        # float round-trip)
        kept, total = prune_files_eq(spark, path, {"id": 10_000_000})
        assert total == 4 and len(kept) <= 1

    def test_nullable_bigint_beyond_2_53_never_false_negative(
            self, spark, tmp_path):
        """A NULLABLE int64 key with magnitude >= 2^53 is ROUNDED by the
        Arrow->pandas float64 null-pad before the build ever sees it —
        hashing the rounded value would prune files that DO contain the
        true key (silent lost rows, round-10 advisor finding). The
        build poisons such (file, col) partials with an all-ones bitset
        instead: the file is always scanned, never wrongly pruned."""
        big = (1 << 53) + 1  # float64(big) == 2^53 — unrepresentable
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(0, big), (1, 5), (2, None), (3, 7)], "ts long, id long")
        (df.repartitionByRange(1, "ts").sortWithinPartitions("ts")
         .write.mode("overwrite").parquet(path))
        # a second file with small non-null... keys stays precise
        df2 = spark.createDataFrame(
            [(10, 100), (11, 101), (12, None)], "ts long, id long")
        df2.coalesce(1).write.mode("append").parquet(path)
        build_bloom_index(spark, path, ["id"], n_items=100)
        # the true big key resolves exactly (its file was not pruned)
        got = [r.ts for r in read_eq(spark, path, {"id": big}).collect()]
        assert got == [0]
        # ... and the ROUNDED value matches nothing
        assert read_eq(spark, path, {"id": 1 << 53}).count() == 0
        # the poisoned file never prunes; the clean file still does
        kept, total = prune_files_eq(spark, path, {"id": 999_999})
        assert total == 2 and len(kept) == 1

    def test_subset_rebuild_preserves_other_columns(self, spark, tmp_path):
        """Rebuilding for a SUBSET of the indexed columns must keep the
        other columns' rows per (file, col) — build(['id']) then
        build(['name']) used to silently drop every 'id' row (round-9
        advisor finding)."""
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=2_000, n_files=4)
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        info = build_bloom_index(spark, path, ["name"], n_items=1_000)
        assert info["indexed"] == 4  # name rows were missing everywhere
        # id rows survived: an id probe still prunes (not kept-everywhere)
        kept, total = prune_files_eq(spark, path, {"id": 42})
        assert total == 4 and len(kept) <= 2
        assert read_eq(spark, path, {"id": 42}).count() == 1
        # and name rows exist too
        kept, _ = prune_files_eq(spark, path, {"name": "u5"})
        assert len(kept) <= 2
        # same per-(file,col) rule on an append: only the new file's id
        # rows regenerate; old files keep BOTH columns' rows
        extra = (spark.range(1).select(
            F.lit(99_999).alias("ts"), F.lit(55_555).alias("id"),
            F.lit("u55555").alias("name"), F.lit(0).alias("val")))
        extra.coalesce(1).write.mode("append").parquet(path)
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        kept, total = prune_files_eq(spark, path, {"name": "u5"})
        assert total == 5
        assert len(kept) <= 3  # old name rows still prune

    def test_combines_with_zonemap_manifest(self, spark, tmp_path):
        from hadoopgis_spark.sources.skipping import save_range_sorted

        path = str(tmp_path / "t")
        n = 8_000
        df = (spark.range(n)
              .withColumn("ts", F.col("id"))
              .withColumn("id", (F.col("id") * 7919) % n))
        save_range_sorted(df, path, "ts", n_files=8)
        build_bloom_index(spark, path, ["id"], n_items=1_000)
        # ts is manifest-covered: an eq probe on it prunes by RANGE even
        # though ts has no bloom rows; id prunes by bloom
        got = read_eq(spark, path, {"ts": 4_000}).collect()
        assert len(got) == 1 and got[0]["id"] == (4_000 * 7919) % n
        assert read_eq(spark, path, {"id": 17}).count() == 1


class TestBloomStreamingIngest:
    def test_ingest_maintains_bloom_incrementally(self, spark, tmp_path):
        """bloom_cols= folds per-batch index extension into the ingest
        loop (with compaction interleaved): after the stream drains,
        point lookups on the scattered id prune sharply and exactly."""
        from hadoopgis_spark.sources import skipping as sk
        from hadoopgis_spark.streaming.ingest import streaming_ingest_sorted

        src = str(tmp_path / "src")
        n = 1_200
        df = (spark.range(n)
              .withColumn("k", F.col("id"))
              .withColumn("uid", (F.col("id") * 7919) % n)
              .drop("id"))
        for i in range(4):
            (df.filter((F.col("k") >= i * 300) & (F.col("k") < (i + 1) * 300))
               .coalesce(1).write.mode("append").parquet(src))
        stream = (spark.readStream.schema("k bigint, uid bigint")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = str(tmp_path / "tbl")
        q = streaming_ingest_sorted(
            stream, out, "k", n_files=2,
            checkpoint=str(tmp_path / "chk"),
            trigger={"availableNow": True},
            compact_every=3, compact_n_files=1,
            bloom_cols=("uid",), bloom_n_items=500)
        q.awaitTermination(240)
        total = len(sk._data_files(out))
        # every active file is indexed (the post-compaction batch
        # re-indexed the folded file), so an absent uid prunes everything
        kept, t = prune_files_eq(spark, out, {"uid": 10_000_000})
        assert t == total and len(kept) <= 1
        for uid in [0, 577, n - 1]:
            got = read_eq(spark, out, {"uid": uid}).collect()
            assert len(got) == 1 and got[0]["uid"] == uid


class TestStreamingAggManifest:
    def test_ingest_maintains_sum_manifest_incrementally(
            self, spark, tmp_path):
        """agg_cols= folds per-batch sum-manifest extension into the
        ingest loop: after the stream drains, every active file carries
        agg rows and a whole-table SUM is answered purely from stored
        per-file sums (exact vs recompute)."""
        from hadoopgis_spark.sources import skipping as sk
        from hadoopgis_spark.streaming.ingest import streaming_ingest_sorted

        src = str(tmp_path / "src")
        n = 1_000
        df = (spark.range(n)
              .withColumn("k", F.col("id"))
              .withColumn("v", (F.col("id") * 7) % 1000)
              .drop("id"))
        for i in range(3):
            (df.filter((F.col("k") >= i * 334) & (F.col("k") < (i + 1) * 334))
               .coalesce(1).write.mode("append").parquet(src))
        stream = (spark.readStream.schema("k bigint, v bigint")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = str(tmp_path / "tbl")
        q = streaming_ingest_sorted(
            stream, out, "k", n_files=2,
            checkpoint=str(tmp_path / "chk"),
            trigger={"availableNow": True},
            agg_cols=("v",))
        q.awaitTermination(240)
        h = sk.layout_health(spark, out, "k")
        assert h["agg_uncovered"] == {"v": 0}
        s, cnt = sk.sum_range(spark, out, "v")
        assert (s, cnt) == (sum((k * 7) % 1000 for k in range(n)), n)
        # and a windowed sum stays exact through interior+boundary tiers
        s, cnt = sk.sum_range(spark, out, "v", {"k": (100, 899)})
        assert (s, cnt) == (sum((k * 7) % 1000 for k in range(100, 900)), 800)


class TestBloomPlan:
    def test_scan_lists_only_kept_files_and_pushes_equality(
            self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write_scattered(spark, path, n=20_000, n_files=16)
        build_bloom_index(spark, path, ["id"], n_items=2_000)
        kept, total = prune_files_eq(spark, path, {"id": 4242})
        df = read_eq(spark, path, {"id": 4242})
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert f"InMemoryFileIndex({len(kept)} paths)" in plan or \
            "InMemoryFileIndex(1 paths)" in plan, plan[:1500]
        assert "PushedFilters: [IsNotNull(id), EqualTo(id,4242)" in plan, \
            plan[:1500]
        assert len(kept) < total
