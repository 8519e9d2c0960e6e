"""Add-column schema evolution (round 12): evolve_add_column records the
widened schema in a sidecar and every managed read pins it, so
pre-evolution files serve the new column as NULL instead of the column's
visibility depending on which footer Spark samples. No data file is
rewritten at evolve time; rewrites that do happen (compaction, merge,
delete) materialize the column into the files they touch."""

import pytest
from pyspark.sql import functions as F

from hadoopgis_spark.sources import fsio as _fs
from hadoopgis_spark.sources import skipping as sk


def _base(spark, tmp_path, name="t"):
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    path = str(tmp_path / name)
    sk.save_range_sorted(df, path, "k", n_files=4)
    return path


class TestEvolveAddColumn:
    def test_reads_null_fill_and_appends_carry(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        sk.evolve_add_column(spark, path, "w", "double")
        # every read shape sees the evolved schema, nulls for old files
        got = sk.read_range(spark, path, "k", 0, 199)
        assert got.columns == ["k", "v", "w"]
        assert got.filter(F.col("w").isNotNull()).count() == 0
        assert got.count() == 200
        # appends must now carry w (schema guard compares vs EVOLVED)
        with pytest.raises(ValueError, match="missing \\['w'\\]"):
            sk.append_range_sorted(
                spark.range(200, 220).select(
                    F.col("id").alias("k"), (F.col("id") % 7).alias("v")),
                path, "k")
        batch = spark.range(200, 220).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v"),
            (F.col("id") * 1.5).alias("w"))
        sk.append_range_sorted(batch, path, "k", n_files=1)
        got = sk.read_range(spark, path, "k", 0, 299)
        assert got.count() == 220
        assert got.filter(F.col("w").isNotNull()).count() == 20
        # old rows still read every original value
        assert got.filter((F.col("k") < 200)
                          & (F.col("v") != F.col("k") % 7)).count() == 0
        # pruned read that touches ONLY old files still shows the column
        old_only = sk.read_range(spark, path, "k", 10, 20)
        assert old_only.columns == ["k", "v", "w"]
        assert old_only.count() == 11

    def test_refusals(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        with pytest.raises(ValueError, match="already exists"):
            sk.evolve_add_column(spark, path, "v", "double")
        with pytest.raises(Exception):  # engine-side parse error, loud
            sk.evolve_add_column(spark, path, "w", "not_a_type(")
        # failed evolutions left no sidecar
        assert sk._evolved_schema(path) is None
        with pytest.raises(ValueError, match="manifest"):
            sk.evolve_add_column(spark, str(tmp_path / "nope"), "w", "int")

    def test_rewrites_materialize_and_metadata_stays_exact(
            self, spark, tmp_path):
        path = _base(spark, tmp_path)
        sk.evolve_add_column(spark, path, "w", "bigint")
        sk.append_range_sorted(
            spark.range(200, 300).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("v"),
                (F.col("id") * 3).alias("w")),
            path, "k", n_files=2)
        # metadata count path (interior files from manifest sums)
        assert sk.count_range(spark, path, "k", 0, 299) == 300
        # agg index over the EVOLVED column: nulls contribute nothing
        sk.build_agg_index(spark, path, ["w"])
        s, n = sk.sum_range(spark, path, "w", {"k": (0, 299)})
        assert (s, n) == (sum(i * 3 for i in range(200, 300)), 100)
        # delete a window straddling old and new rows
        sk.delete_range(spark, path, "k", 150, 249)
        got = sk.read_range(spark, path, "k", 0, 299)
        assert got.count() == 200
        assert got.filter(F.col("w").isNotNull()).count() == 50
        # merge replaces whole rows: batch must carry the full evolved
        # schema (merge guard uses the evolved column set)
        with pytest.raises(ValueError, match="lacks table columns"):
            sk.merge_range(
                spark, path,
                spark.range(0, 5).select(
                    F.col("id").alias("k"), (F.col("id") % 7).alias("v")),
                "k")
        sk.merge_range(
            spark, path,
            spark.range(0, 5).select(
                F.col("id").alias("k"), F.lit(99).cast("bigint").alias("v"),
                F.lit(7).cast("bigint").alias("w")),
            "k")
        top = sk.read_range(spark, path, "k", 0, 4)
        assert top.filter((F.col("v") == 99) & (F.col("w") == 7)).count() == 5
        # compaction keeps the evolved read intact
        sk.compact_range_sorted(spark, path, "k")
        got = sk.read_range(spark, path, "k", 0, 299)
        assert got.count() == 200
        assert got.filter(F.col("w") == 7).count() == 5

    def test_time_travel_and_bloom_see_evolved_schema(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("v"))
        sk.save_range_sorted(df, path, "k", n_files=2)
        sk.enable_time_travel(spark, path)
        sk.append_range_sorted(
            spark.range(100, 120).select(
                F.col("id").alias("k"), (F.col("id") % 5).alias("v")),
            path, "k", n_files=1)
        versions = [v["version"] for v in sk.list_versions(spark, path)]
        v_pre = max(versions)
        sk.evolve_add_column(spark, path, "w", "string")
        # historical read: the evolved schema applies, column is null
        hist = sk.read_version(spark, path, v_pre)
        assert hist.columns == ["k", "v", "w"]
        assert hist.count() == 120
        assert hist.filter(F.col("w").isNotNull()).count() == 0
        # bloom point read on an evolved table carries the column
        from hadoopgis_spark.sources.bloom import (
            build_bloom_index, read_eq)
        build_bloom_index(spark, path, ["v"], n_items=200)
        eq = read_eq(spark, path, {"v": 3})
        assert eq.columns == ["k", "v", "w"]
        assert eq.count() == 24

    def test_bloom_index_on_evolved_column(self, spark, tmp_path):
        """Bloom over the EVOLVED column: old files are all-null on it
        (nulls hash to nothing), so the index prunes to the post-evolve
        files and the point lookup is exact."""
        from hadoopgis_spark.sources.bloom import build_bloom_index, read_eq

        path = str(tmp_path / "t")
        sk.save_range_sorted(
            spark.range(0, 500).select(F.col("id").alias("k")),
            path, "k", n_files=2)
        sk.evolve_add_column(spark, path, "tag", "bigint")
        sk.append_range_sorted(
            spark.range(500, 600).select(F.col("id").alias("k"),
                                         (F.col("id") % 9).alias("tag")),
            path, "k", n_files=1)
        build_bloom_index(spark, path, ["tag"], n_items=1000)
        got = sorted(x.k for x in read_eq(spark, path, {"tag": 4}).collect())
        assert got == [i for i in range(500, 600) if i % 9 == 4]

    def test_spatial_layout_evolves(self, spark, tmp_path):
        ext = (0.0, 0.0, 11.0, 8.0)
        sp_path = str(tmp_path / "s")
        boxes = spark.createDataFrame(
            [(i, float(i % 10), float(i % 7), float(i % 10) + 1.0,
              float(i % 7) + 1.0) for i in range(100)],
            "id long, xmin double, ymin double, xmax double, ymax double")
        sk.save_spatial_clustered(boxes, sp_path, ext, n_files=2)
        sk.evolve_add_column(spark, sp_path, "label", "string")
        b2 = spark.createDataFrame(
            [(100 + i, float(i % 10), float(i % 7), float(i % 10) + 1.0,
              float(i % 7) + 1.0, f"x{i}") for i in range(20)],
            "id long, xmin double, ymin double, xmax double, "
            "ymax double, label string")
        sk.append_spatial_clustered(b2, sp_path, ext, n_files=1)
        w = sk.read_window(spark, sp_path, (0.0, 0.0, 11.0, 8.0))
        assert w.columns == ["id", "xmin", "ymin", "xmax", "ymax", "label"]
        assert w.count() == 120
        assert w.filter(F.col("label").isNotNull()).count() == 20

    def test_drop_column(self, spark, tmp_path):
        """evolve_drop_column: the column disappears from every read
        without touching a file, appends must stop carrying it, and the
        name cannot be re-added without a re-cluster (old files may
        still carry it physically — resurfacing stale values silently
        is the bug class this tier exists to prevent)."""
        path = _base(spark, tmp_path)  # (k, v) clustered on k
        sk.evolve_drop_column(spark, path, "v")
        got = sk.read_range(spark, path, "k", 0, 199)
        assert got.columns == ["k"]
        assert got.count() == 200
        # appends must NOT carry v anymore
        with pytest.raises(ValueError, match="extra \\['v'\\]"):
            sk.append_range_sorted(
                spark.range(200, 210).select(
                    F.col("id").alias("k"), (F.col("id") % 7).alias("v")),
                path, "k")
        sk.append_range_sorted(
            spark.range(200, 210).select(F.col("id").alias("k")),
            path, "k", n_files=1)
        assert sk.read_range(spark, path, "k", 0, 299).count() == 210
        # re-adding the dropped name refuses (stale resurface hazard)
        with pytest.raises(ValueError, match="previously DROPPED"):
            sk.evolve_add_column(spark, path, "v", "bigint")
        # compaction materializes the narrowed schema physically
        sk.compact_range_sorted(spark, path, "k")
        assert sk.read_range(spark, path, "k", 0, 299).columns == ["k"]

    def test_drop_refusals(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        with pytest.raises(ValueError, match="manifest-covered"):
            sk.evolve_drop_column(spark, path, "k")
        with pytest.raises(ValueError, match="does not exist"):
            sk.evolve_drop_column(spark, path, "nope")
        sk.build_agg_index(spark, path, ["v"])
        with pytest.raises(ValueError, match="agg-indexed"):
            sk.evolve_drop_column(spark, path, "v")
        # bloom-indexed columns refuse too
        from hadoopgis_spark.sources.bloom import build_bloom_index

        p2 = _base(spark, tmp_path, "t2")
        build_bloom_index(spark, p2, ["v"], n_items=500)
        with pytest.raises(ValueError, match="bloom-indexed"):
            sk.evolve_drop_column(spark, p2, "v")

    def test_add_then_drop_then_stack(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        sk.evolve_add_column(spark, path, "w", "double")
        sk.evolve_drop_column(spark, path, "w")
        assert sk.read_range(spark, path, "k", 0, 199).columns == ["k", "v"]
        sk.evolve_add_column(spark, path, "u", "string")
        got = sk.read_range(spark, path, "k", 0, 199)
        assert got.columns == ["k", "v", "u"]
        # the dropped ledger survives further evolution
        with pytest.raises(ValueError, match="previously DROPPED"):
            sk.evolve_add_column(spark, path, "w", "double")

    def test_overwrite_clears_evolution_and_evolution_stacks(
            self, spark, tmp_path):
        path = _base(spark, tmp_path)
        sk.evolve_add_column(spark, path, "w", "double")
        sk.evolve_add_column(spark, path, "tag", "string")
        got = sk.read_range(spark, path, "k", 0, 199)
        assert got.columns == ["k", "v", "w", "tag"]
        # full rewrite: the sidecar dies with the directory — fresh schema
        sk.save_range_sorted(
            spark.range(0, 50).select(F.col("id").alias("k"),
                                      (F.col("id") % 3).alias("v")),
            path, "k", n_files=2)
        assert sk._evolved_schema(path) is None
        assert sk.read_range(spark, path, "k", 0, 49).columns == ["k", "v"]


class TestEvolveWidenColumn:
    """Round 13: type-widening evolution — pinned wider read schema over
    narrower physical pages (Spark's native parquet upcast), metadata
    tiers exact by construction."""

    def _int_table(self, spark, tmp_path, **save_kw):
        df = spark.range(0, 200).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("int").alias("v"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=4, **save_kw)
        return path

    def test_int_to_bigint_roundtrip(self, spark, tmp_path):
        path = self._int_table(spark, tmp_path)
        sk.evolve_widen_column(spark, path, "v", "bigint")
        got = sk.read_range(spark, path, "k", 0, 199)
        assert dict(got.dtypes)["v"] == "bigint"
        assert got.count() == 200
        assert got.filter(F.col("v") != F.col("k") % 7).count() == 0
        # a still-narrow batch refuses with the usual drift message
        with pytest.raises(ValueError, match="types drift"):
            sk.append_range_sorted(
                spark.range(200, 210).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 7).cast("int").alias("v")),
                path, "k")
        # a wide batch with a value only BIGINT can hold lands exactly
        big = 5_000_000_000
        batch = spark.range(200, 210).select(
            F.col("id").alias("k"),
            (F.col("id") % 7 + F.lit(big)).cast("bigint").alias("v"))
        sk.append_range_sorted(batch, path, "k", n_files=1)
        got = sk.read_range(spark, path, "k", 0, 299)
        assert got.count() == 210
        assert got.filter(F.col("v") >= big).count() == 10

    def test_refusals(self, spark, tmp_path):
        path = self._int_table(spark, tmp_path)
        with pytest.raises(ValueError, match="only safe widenings"):
            sk.evolve_widen_column(spark, path, "v", "string")
        with pytest.raises(ValueError, match="only safe widenings"):
            sk.evolve_widen_column(spark, path, "v", "double")
        with pytest.raises(ValueError, match="does not exist"):
            sk.evolve_widen_column(spark, path, "nope", "bigint")
        sk.evolve_widen_column(spark, path, "v", "bigint")
        with pytest.raises(ValueError, match="only safe widenings"):
            sk.evolve_widen_column(spark, path, "v", "int")  # narrowing
        # float -> double allowed; double -> float refused
        df = spark.range(0, 20).select(
            F.col("id").alias("k"), F.col("id").cast("float").alias("f"))
        p2 = str(tmp_path / "t2")
        sk.save_range_sorted(df, p2, "k", n_files=2)
        sk.evolve_widen_column(spark, p2, "f", "double")
        assert dict(sk.read_range(spark, p2, "k").dtypes)["f"] == "double"
        with pytest.raises(ValueError, match="only safe widenings"):
            sk.evolve_widen_column(spark, p2, "f", "float")

    def test_widened_clustering_column_keeps_pruning(self, spark, tmp_path):
        """Widening the MANIFEST-COVERED order column itself: stats are
        type-tagged strings compared as Python ints, so old rows keep
        pruning, and post-widen appends mix in seamlessly."""
        df = spark.range(0, 400).select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") % 5).alias("v"))
        path = str(tmp_path / "t")
        sk.save_range_sorted(df, path, "k", n_files=8)
        sk.evolve_widen_column(spark, path, "k", "bigint")
        batch = spark.range(0, 10).select(
            (F.col("id") + 3_000_000_000).alias("k"),
            (F.col("id") % 5).alias("v"))
        sk.append_range_sorted(batch, path, "k", n_files=1)
        kept, total = sk.prune_files(spark, path, {"k": (100, 199)})
        assert len(kept) < total  # old files still prune
        got = sk.read_range(spark, path, "k", 100, 199)
        assert got.count() == 100
        assert sk.count_range(spark, path, "k", 3_000_000_000, None) == 10

    def test_agg_and_bloom_survive_widening(self, spark, tmp_path):
        from hadoopgis_spark.sources.bloom import build_bloom_index, read_eq

        path = self._int_table(spark, tmp_path, agg_cols=["v"])
        build_bloom_index(spark, path, ["v"], n_items=1000)
        sk.evolve_widen_column(spark, path, "v", "bigint")
        # agg index: pre-widen per-file sums + post-widen appended sums
        big = 5_000_000_000
        sk.append_range_sorted(
            spark.range(200, 210).select(
                F.col("id").alias("k"),
                F.lit(big).cast("bigint").alias("v")),
            path, "k", n_files=1)
        s, n = sk.sum_range(spark, path, "v", {"k": (0, 299)})
        expect = sum(k % 7 for k in range(200)) + 10 * big
        assert (s, n) == (expect, 210)
        # bloom bits hashed the canonical int value: still match post-widen
        got = read_eq(spark, path, {"v": 3})
        assert got.filter(F.col("v") == 3).count() > 0


class TestEvolveReaddColumn:
    """Round 13: explicit re-add of a dropped name — masked old files
    serve NULL, new files serve values, stale physical data stays
    unreachable (the Iceberg field-id idea in miniature)."""

    def test_readd_masks_stale_values(self, spark, tmp_path):
        path = _base(spark, tmp_path)  # k bigint, v bigint (0..6 values)
        sk.evolve_drop_column(spark, path, "v")
        assert sk.read_range(spark, path, "k").columns == ["k"]
        # silent re-add still refuses; the explicit hatch works
        with pytest.raises(ValueError, match="previously DROPPED"):
            sk.evolve_add_column(spark, path, "v", "double")
        sk.evolve_readd_column(spark, path, "v", "double")
        got = sk.read_range(spark, path, "k")
        assert got.columns == ["k", "v"]
        assert dict(got.dtypes)["v"] == "double"
        # the 200 old rows physically carry bigint v values — all masked
        assert got.count() == 200
        assert got.filter(F.col("v").isNotNull()).count() == 0
        # post-re-add appends serve real values
        sk.append_range_sorted(
            spark.range(200, 220).select(
                F.col("id").alias("k"),
                (F.col("id") * 0.5).alias("v")),
            path, "k", n_files=1)
        got = sk.read_range(spark, path, "k")
        assert got.count() == 220
        assert got.filter(F.col("v").isNotNull()).count() == 20
        assert got.filter(F.col("v") == 100.0).count() == 1  # k=200
        # pruned read touching ONLY masked files still shows the column
        old_only = sk.read_range(spark, path, "k", 10, 20)
        assert old_only.columns == ["k", "v"]
        assert old_only.filter(F.col("v").isNotNull()).count() == 0

    def test_refusals(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        with pytest.raises(ValueError, match="never dropped"):
            sk.evolve_readd_column(spark, path, "w", "double")
        with pytest.raises(ValueError, match="never dropped"):
            sk.evolve_readd_column(spark, path, "v", "double")

    def test_rewrites_materialize_nulls_and_converge(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        sk.evolve_drop_column(spark, path, "v")
        sk.evolve_readd_column(spark, path, "v", "bigint")
        sk.append_range_sorted(
            spark.range(200, 250).select(
                F.col("id").alias("k"), (F.col("id") % 9).alias("v")),
            path, "k", n_files=1)
        before = sorted((r.k, r.v) for r in
                        sk.read_range(spark, path, "k").collect())
        # compact everything: masked files are rewritten THROUGH the
        # mask, so the outputs physically carry NULLs, not stale values
        stats = sk.compact_range_sorted(spark, path, "k",
                                        small_bytes=1 << 30, n_files=2)
        assert stats["compacted"] > 0
        after = sorted((r.k, r.v) for r in
                       sk.read_range(spark, path, "k").collect())
        assert after == before
        # no active file is masked anymore: the plain read path is back
        masked = set(sk._evolution_masked(path).get("v", []))
        assert not (masked & sk._data_files(path))

    def test_drop_again_and_readd_again(self, spark, tmp_path):
        path = _base(spark, tmp_path)
        sk.evolve_drop_column(spark, path, "v")
        sk.evolve_readd_column(spark, path, "v", "bigint")
        sk.append_range_sorted(
            spark.range(200, 210).select(
                F.col("id").alias("k"), F.lit(42).cast("bigint").alias("v")),
            path, "k", n_files=1)
        sk.evolve_drop_column(spark, path, "v")
        assert sk.read_range(spark, path, "k").columns == ["k"]
        # second re-add masks the post-first-re-add files too (their
        # physical 42s are stale now)
        sk.evolve_readd_column(spark, path, "v", "bigint")
        got = sk.read_range(spark, path, "k")
        assert got.count() == 210
        assert got.filter(F.col("v").isNotNull()).count() == 0
