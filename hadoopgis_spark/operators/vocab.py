"""Corpus vocabulary / heavy-hitter operators for training-data pipelines.

Vocabulary building and token-coverage QA are standard steps before
tokenizer training: count word n-grams across the corpus, keep the top-k
heavy hitters, and measure what fraction of the corpus a candidate
vocabulary covers (per source / language bucket).

Scale shape (100 TB discipline):

* ``ngram_counts`` — explode → ``groupBy(ngram).count()``. Hash
  aggregation with map-side partial combine: a hot n-gram ("the of")
  collapses to one row per map task before the shuffle, so Zipfian token
  skew never funnels into a single reducer.
* ``top_ngrams`` — ``orderBy(...).limit(k)`` compiles to
  TakeOrderedAndProject: per-partition top-k heaps merged on the driver,
  never a global sort. Ties break on the n-gram string so the result set
  is deterministic (and oracle-checkable) even at the k boundary.
* ``vocab_coverage`` — the vocabulary (k rows) is broadcast; the corpus
  streams through one explode + broadcast-hash-join + partial aggregate.
  The corpus side is never shuffled on the (heavily skewed) token key —
  only on the low-cardinality group key, after partial aggregation.

All expressions are JVM Column built-ins sharing ``functions.text``'s
normalize/tokenize chain, so every operator is ANSI-SQL-expressible and
oracle-checked (``txt_top_ngrams``, ``txt_vocab_coverage``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.functions.text import tokens

__all__ = ["word_ngrams", "ngram_counts", "top_ngrams", "vocab_coverage"]


def word_ngrams(col, n: int = 1) -> Column:
    """``array<string>`` of space-joined word ``n``-grams of the
    normalized text (``[]`` when the text has fewer than ``n`` tokens).

    The token array is let-bound once via ``transform(array(x), f)[0]``:
    higher-order functions are CodegenFallback (no codegen CSE — CLAUDE.md
    trap list), so without the binding the 3-regex normalize/split chain
    would re-evaluate once per slice reference.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    t = tokens(col)
    if n == 1:
        return t

    def build(tk):
        cnt = F.greatest(F.size(tk) - F.lit(n - 1), F.lit(0))
        acc = F.slice(tk, F.lit(1), cnt)
        for i in range(1, n):
            acc = F.zip_with(
                acc,
                F.slice(tk, F.lit(i + 1), cnt),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return acc

    return F.transform(F.array(t), build)[0]


def ngram_counts(df: DataFrame, text_col: str = "text", n: int = 1) -> DataFrame:
    """``(ngram, cnt)`` corpus-wide counts of word n-grams.

    Occurrence counts (not document frequency): a document contributes
    every occurrence. Empty / too-short documents contribute nothing.
    """
    return (
        df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_ngrams(df: DataFrame, text_col: str = "text", n: int = 1,
               k: int = 100) -> DataFrame:
    """Top-``k`` most frequent word n-grams, ``(ngram, cnt)``.

    Deterministic total order: ``cnt`` descending, then ``ngram``
    ascending — the boundary of the k-set is stable across runs and
    engines.
    """
    c = ngram_counts(df, text_col, n)
    return c.orderBy(F.desc("cnt"), F.asc("ngram")).limit(k)


def vocab_coverage(df: DataFrame, text_col: str, vocab: DataFrame,
                   group_col: str = "source") -> DataFrame:
    """Per-``group_col`` token coverage of a candidate vocabulary:
    ``(group, covered, total, coverage)`` where ``coverage`` is the
    fraction of token occurrences found in ``vocab`` (column ``ngram``).

    ``vocab`` is broadcast (it is a top-k result — small by
    construction); the corpus is never shuffled on the skewed token key.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    v = vocab.select(F.col("ngram").alias("tok"), F.lit(1).alias("__inv"))
    joined = toks.join(F.broadcast(v), "tok", "left")
    covered = F.sum(F.when(F.col("__inv").isNotNull(), 1).otherwise(0))
    return joined.groupBy("grp").agg(
        covered.cast("bigint").alias("covered"),
        F.count(F.lit(1)).alias("total"),
        (covered.cast("double") / F.count(F.lit(1))).alias("coverage"),
    ).withColumnRenamed("grp", group_col)
