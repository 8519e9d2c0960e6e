"""Hypothesis property tests for the round-6b operators: vocabulary
n-grams, quantile binning, file-skipping reads, and the salted join —
each pinned against an independent pure-Python reference on random
inputs (the engine's §5-style randomized parity strategy)."""

import bisect

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,  # gate runs must not flake on a fresh random seed
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

token = st.text(alphabet="abc", min_size=1, max_size=3)
doc = st.lists(token, min_size=0, max_size=12).map(" ".join)


class TestVocabProperties:
    @given(docs=st.lists(doc, min_size=1, max_size=8), n=st.integers(1, 4))
    @settings(**SETTINGS)
    def test_word_ngrams_matches_python(self, spark, docs, n):
        from hadoopgis_spark.operators.vocab import word_ngrams
        df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "i int, text string")
        got = {r.i: r.g for r in df.select("i", word_ngrams(F.col("text"), n).alias("g")).collect()}
        for i, t in enumerate(docs):
            toks = t.split() if t.strip() else []
            expect = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            assert got[i] == expect, (t, n)


class TestBinningProperties:
    @given(
        vals=st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
            min_size=1, max_size=30),
        cuts=st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
            min_size=1, max_size=5, unique=True).map(sorted),
    )
    @settings(**SETTINGS)
    def test_bin_index_is_bisect_right(self, spark, vals, cuts):
        from hadoopgis_spark.operators.binning import bin_index
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
        got = {r.i: r.b for r in df.select("i", bin_index("v", cuts).alias("b")).collect()}
        for i, v in enumerate(vals):
            assert got[i] == bisect.bisect_right(cuts, v), (v, cuts)


class TestSkippingProperties:
    @given(
        keys=st.lists(st.one_of(st.none(), st.integers(-50, 50)),
                      min_size=1, max_size=60),
        lo=st.integers(-60, 60),
        width=st.integers(0, 40),
        n_files=st.integers(1, 6),
    )
    @settings(max_examples=6, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_read_range_equals_brute_filter(self, spark, tmp_path_factory,
                                            keys, lo, width, n_files):
        from hadoopgis_spark.sources.skipping import read_range, save_range_sorted
        hi = lo + width
        path = str(tmp_path_factory.mktemp("skipprop") / "t")
        df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)], "i int, k int")
        save_range_sorted(df, path, "k", n_files=n_files)
        got = sorted(r.i for r in read_range(spark, path, "k", lo, hi).collect())
        expect = sorted(i for i, k in enumerate(keys)
                        if k is not None and lo <= k <= hi)
        assert got == expect


class TestSaltedJoinProperties:
    @given(
        lkeys=st.lists(st.one_of(st.none(), st.integers(0, 5)),
                       min_size=0, max_size=25),
        rkeys=st.lists(st.one_of(st.none(), st.integers(0, 5)),
                       min_size=0, max_size=10),
        n_salt=st.integers(1, 5),
        how=st.sampled_from(["inner", "left"]),
    )
    @settings(**SETTINGS)
    def test_multiset_parity_with_plain_join(self, spark, lkeys, rkeys, n_salt, how):
        from collections import Counter
        from hadoopgis_spark.operators.skew import salted_join
        # every 5th rid NULL: a NULL salt_col must still match (coalesced
        # to salt 0), per the exact-multiset guarantee
        left = spark.createDataFrame(
            [(k, None if i % 5 == 4 else i) for i, k in enumerate(lkeys)],
            "k int, rid int")
        right = spark.createDataFrame(
            [(k, 1000 + i) for i, k in enumerate(rkeys)], "k int, tag int")
        got = Counter((r.k, r.rid, r.tag) for r in
                      salted_join(left, right, "k", salt_col="rid",
                                  n_salt=n_salt, how=how).collect())
        expect = Counter((r.k, r.rid, r.tag) for r in
                         left.join(right, "k", how).select("k", "rid", "tag").collect())
        assert got == expect
