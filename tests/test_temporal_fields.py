"""Temporal interval extension + the -f output-field grammar."""

import pytest

from hadoopgis_spark.functions.temporal import (
    interval_contains,
    interval_intersects,
    interval_join,
    interval_mindist,
)
from hadoopgis_spark.operators import spatial_join
from hadoopgis_spark.operators.fields import select_fields


class TestIntervalPredicates:
    def test_predicates(self, spark):
        rows = [
            (1, 0, 10, 5, 15, True, False, 0),     # overlap
            (2, 0, 10, 12, 20, False, False, 2),   # gap of 2
            (3, 0, 10, 2, 8, True, True, 0),       # containment
            (4, 0, 10, 10, 20, True, False, 0),    # touching endpoints
        ]
        df = spark.createDataFrame(
            rows, "id long, s1 long, e1 long, s2 long, e2 long, want_i boolean, want_c boolean, want_d long"
        )
        got = df.select(
            "id",
            interval_intersects("s1", "e1", "s2", "e2").alias("i"),
            interval_contains("s1", "e1", "s2", "e2").alias("c"),
            interval_mindist("s1", "e1", "s2", "e2").alias("d"),
            "want_i", "want_c", "want_d",
        ).collect()
        for r in got:
            assert r.i == r.want_i and r.c == r.want_c and r.d == r.want_d, r


class TestIntervalJoin:
    def test_matches_bruteforce(self, spark):
        import random

        rng = random.Random(13)
        rows = [(i, s := rng.randint(0, 10_000), s + rng.randint(1, 300)) for i in range(1, 301)]
        df = spark.createDataFrame(rows, "id long, start long, end long")
        got = {
            (r.id_1, r.id_2)
            for r in interval_join(df, None, bucket_size=40).select("id_1", "id_2").collect()
        }
        expected = {
            (i, j)
            for i, s1, e1 in rows
            for j, s2, e2 in rows
            if i < j and s1 <= e2 and s2 <= e1
        }
        assert got == expected and len(expected) > 100

    def test_ns_precision_exact(self, spark):
        """Nanosecond epochs (~1.7e18) exceed 2^53: the double cast rounds
        by ~256 ns, which without the long-column refine merges a 1 ns gap
        into a false overlap and can drop a boundary touch."""
        S = 1_700_000_000_000_000_000
        rows = [
            (1, S, S + 1000),
            (2, S + 1000, S + 2000),   # touches id 1 exactly (closed ⇒ overlap)
            (3, S + 2001, S + 3000),   # 1 ns gap after id 2 ⇒ NO overlap
            (4, S + 100, S + 200),     # strictly inside id 1
        ]
        df = spark.createDataFrame(rows, "id long, start long, end long")
        got = {
            (r.id_1, r.id_2)
            for r in interval_join(df, None, bucket_size=2).select("id_1", "id_2").collect()
        }
        assert got == {(1, 2), (1, 4)}


class TestFieldsGrammar:
    @pytest.fixture(scope="class")
    def joined(self, spark):
        rows_a = [(i, float(i), 0.0, i + 5.0, 5.0, f"a{i}") for i in range(20)]
        rows_b = [(i, i + 2.0, 0.0, i + 6.0, 4.0, f"b{i}") for i in range(20)]
        a = spark.createDataFrame(rows_a, "id long, xmin double, ymin double, xmax double, ymax double, tag string")
        b = spark.createDataFrame(rows_b, "id long, xmin double, ymin double, xmax double, ymax double, tag string")
        j = spatial_join(a, b, "st_intersects", bucket_size=10,
                         stats=["area2", "jaccard", "tileid"])
        return j, a.columns, b.columns

    def test_reference_spec(self, spark, joined):
        j, ac, bc = joined
        out = select_fields(j, "1:1, 2:6, area2, jaccard, tileid", ac, bc)
        assert out.columns == ["1_1", "2_6", "area2", "jaccard", "tileid"]
        rows = out.collect()
        assert len(rows) > 0
        assert all(r["2_6"].startswith("b") for r in rows)

    def test_bad_specs(self, spark, joined):
        j, ac, bc = joined
        for bad in ["3:1", "1:99", "nope", "", "1:x"]:
            with pytest.raises(ValueError):
                select_fields(j, bad, ac, bc)


class TestBoxes3D:
    def test_3d_functions(self, spark):
        from hadoopgis_spark.functions.boxes3d import (
            box3d_contains,
            box3d_distance,
            box3d_intersection_volume,
            box3d_intersects,
            box3d_volume,
        )

        rows = [(1, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0, 5.0, 5.0, 5.0, 15.0, 15.0, 15.0)]
        df = spark.createDataFrame(
            rows,
            "id long, ax0 double, ay0 double, az0 double, ax1 double, ay1 double, az1 double, "
            "bx0 double, by0 double, bz0 double, bx1 double, by1 double, bz1 double",
        )
        A = ("ax0", "ay0", "az0", "ax1", "ay1", "az1")
        B = ("bx0", "by0", "bz0", "bx1", "by1", "bz1")
        r = df.select(
            box3d_intersects(A, B).alias("i"),
            box3d_contains(A, B).alias("c"),
            box3d_volume(A).alias("v"),
            box3d_intersection_volume(A, B).alias("iv"),
            box3d_distance(A, B).alias("d"),
        ).collect()[0]
        assert r.i and not r.c
        assert r.v == 1000.0 and r.iv == 125.0 and r.d == 0.0

    def test_3d_join_matches_bruteforce(self, spark):
        import random

        from hadoopgis_spark.functions.boxes3d import spatial_join_3d

        rng = random.Random(31)
        rows = []
        for i in range(250):
            x, y, z = rng.uniform(0, 100), rng.uniform(0, 100), rng.uniform(0, 100)
            rows.append((i, x, y, z, x + rng.uniform(1, 8), y + rng.uniform(1, 8), z + rng.uniform(1, 8)))
        df = spark.createDataFrame(
            rows, "id long, xmin double, ymin double, zmin double, xmax double, ymax double, zmax double"
        )
        got = {
            (r.id_1, r.id_2)
            for r in spatial_join_3d(df, None, bucket_size=40).select("id_1", "id_2").collect()
        }
        expected = set()
        for i, x0, y0, z0, x1, y1, z1 in rows:
            for j, u0, v0, w0, u1, v1, w1 in rows:
                if i < j and x0 <= u1 and u0 <= x1 and y0 <= v1 and v0 <= y1 and z0 <= w1 and w0 <= z1:
                    expected.add((i, j))
        assert got == expected and len(expected) > 20


class TestSqlRegistration:
    def test_sql_surface(self, spark):
        from hadoopgis_spark.functions.register import register_all

        names = register_all(spark)
        assert "st_intersects" in names
        spark.createDataFrame(
            [(1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
             (2, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
             (3, "POLYGON ((50 50, 60 50, 60 60, 50 60, 50 50))")],
            "id long, geom string",
        ).createOrReplaceTempView("polys")
        rows = spark.sql("""
            SELECT a.id AS id_1, b.id AS id_2,
                   ROUND(st_jaccard(a.geom, b.geom), 6) AS jac
            FROM polys a JOIN polys b ON a.id < b.id
            WHERE st_intersects(a.geom, b.geom)
        """).collect()
        got = {(r.id_1, r.id_2): r.jac for r in rows}
        assert set(got) == {(1, 2)}
        assert got[(1, 2)] == round(25.0 / 175.0, 6)
        area = spark.sql("SELECT st_area('POLYGON ((0 0, 4 0, 0 4, 0 0))') AS a").collect()[0].a
        assert area == 8.0


class TestTemporalObject:
    """Multi-interval TemporalObject (reference spt ext, temporal.h:13-24)."""

    def test_parse_formats(self, spark):
        from hadoopgis_spark.functions.temporal import parse_temporal

        rows = [
            (1, "3 7,10 12,20"),          # two intervals + degenerate
            (2, "  5   9  "),             # single interval, messy spaces
            (3, "42"),                    # bare value
            (4, "1 2,x y,3 4"),           # malformed middle token skipped
            (5, ""),                      # empty -> no intervals
        ]
        df = spark.createDataFrame(rows, "id long, s string")
        got = {r.id: [(iv.start, iv.end) for iv in r.o]
               for r in df.select("id", parse_temporal("s").alias("o")).collect()}
        assert got[1] == [(3, 7), (10, 12), (20, 20)]
        assert got[2] == [(5, 9)]
        assert got[3] == [(42, 42)]
        assert got[4] == [(1, 2), (3, 4)]
        assert got[5] == []

    def test_set_predicates_vs_bruteforce(self, spark):
        import random

        from hadoopgis_spark.functions.temporal import (
            parse_temporal,
            temporal_contains,
            temporal_end,
            temporal_intersects,
            temporal_lit,
            temporal_mindist,
            temporal_mindist_set,
            temporal_n_intervals,
            temporal_start,
        )

        rng = random.Random(23)

        def rand_obj():
            ivs = []
            for _ in range(rng.randint(1, 4)):
                s = rng.randint(0, 200)
                ivs.append((s, s + rng.randint(0, 30)))
            return ivs

        q = [(40, 60), (150, 160)]
        rows = []
        for i in range(200):
            ivs = rand_obj()
            rows.append((i, ",".join(f"{s} {e}" for s, e in ivs), ivs))
        df = spark.createDataFrame([(i, s) for i, s, _ in rows], "id long, s string")
        o = parse_temporal("s")
        got = {
            r.id: r
            for r in df.select(
                "id",
                temporal_n_intervals(o).alias("n"),
                temporal_start(o).alias("ts"),
                temporal_end(o).alias("te"),
                temporal_intersects(o, temporal_lit(q)).alias("i"),
                temporal_contains(o, temporal_lit([(50, 55)])).alias("c"),
                temporal_mindist(o, temporal_lit([(500, 510)])).alias("m1"),
                temporal_mindist_set(o, temporal_lit(q)).alias("ms"),
            ).collect()
        }
        for i, _, ivs in rows:
            r = got[i]
            assert r.n == len(ivs)
            assert r.ts == ivs[0][0] and r.te == ivs[-1][1]
            want_i = any(s <= qe and e >= qs for s, e in ivs for qs, qe in q)
            assert r.i == want_i, (ivs, q)
            # contains: reference parity — single-interval only
            want_c = len(ivs) == 1 and ivs[0][0] <= 50 and 55 <= ivs[0][1]
            assert r.c == want_c
            want_m1 = (
                max(0, 500 - ivs[0][1], ivs[0][0] - 510) if len(ivs) == 1 else 0
            )
            assert r.m1 == want_m1
            want_ms = min(
                max(0, qs - e, s - qe) for s, e in ivs for qs, qe in q
            )
            assert r.ms == want_ms

    def test_multi_interval_join_vs_bruteforce(self, spark):
        import random

        from pyspark.sql import functions as F

        from hadoopgis_spark.functions.temporal import multi_interval_join

        rng = random.Random(31)

        def objs(n, lo, hi):
            out = []
            for i in range(n):
                ivs = []
                for _ in range(rng.randint(1, 3)):
                    s = rng.randint(lo, hi)
                    ivs.append((s, s + rng.randint(0, 40)))
                out.append((i, sorted(ivs)))
            return out

        A, B = objs(40, 0, 2000), objs(50, 0, 2000)
        adf = spark.createDataFrame(
            [(i, [{"start": s, "end": e} for s, e in ivs]) for i, ivs in A],
            "a_id long, intervals array<struct<start:long,end:long>>",
        )
        bdf = spark.createDataFrame(
            [(i, [{"start": s, "end": e} for s, e in ivs]) for i, ivs in B],
            "b_id long, intervals array<struct<start:long,end:long>>",
        )
        j = multi_interval_join(adf, bdf, bucket_size=30)
        got = {(r[0], r[1]) for r in j.select("a_id_1", "b_id_2").collect()}
        want = {
            (i, jd)
            for i, ivs in A
            for jd, jvs in B
            if any(s <= e2 and s2 <= e for s, e in ivs for s2, e2 in jvs)
        }
        assert got == want and len(want) > 50

    def test_self_join_refused(self, spark):
        from hadoopgis_spark.functions.temporal import multi_interval_join

        df = spark.createDataFrame(
            [(1, [{"start": 0, "end": 5}])],
            "a_id long, intervals array<struct<start:long,end:long>>",
        )
        with pytest.raises(ValueError, match="self-join"):
            multi_interval_join(df, None)
