"""Distributed BPE tokenizer training.

The missing half of the engine's tokenizer stack (``bpe_tokens`` counts
with a FIXED pre-tokenization; this module LEARNS the merge table).
The standard industrial shape — what HF ``tokenizers`` does on one
machine — decomposes cleanly for Spark:

1. **Corpus → word-frequency table** (the only pass over the 100 TB):
   normalize, tokenize, ``groupBy(word).count()`` — partial-aggregated,
   Zipf-skew-proof, and the result is BOUNDED (vocabulary-sized, ~10M
   rows at web scale), independent of corpus size.
2. **Cap the table** at ``max_words`` by frequency (TakeOrdered heaps,
   deterministic ``(count desc, word asc)`` tie-break). Dropping the
   rare tail is standard and changes merges only through the tail's
   negligible pair mass.
3. **Merge loop on the driver** over the word-frequency dict — each
   iteration counts adjacent symbol pairs weighted by word frequency,
   merges the most frequent pair (ties: lexicographic pair, the
   deterministic choice), and rewrites only the words containing it.
   O(vocab) memory, no Spark jobs inside the loop.

The learned merges then drive ``apply_bpe`` (a driver-built merge
ranking applied per word — exposed for completeness and testing; at
serving scale tokenization belongs in the same Arrow batch stage as
the model's real tokenizer).

Reference: Sennrich et al. '16 (the original subword-BPE recipe, which
this follows exactly, including end-of-word markers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.functions.text import tokens

__all__ = ["word_frequency_table", "word_frequencies", "train_bpe", "apply_bpe"]

_EOW = "</w>"


def word_frequency_table(df: DataFrame, text_col: str = "text",
                         max_words: int = 100_000) -> DataFrame:
    """The corpus's single full pass as a DataFrame: normalize →
    explode tokens → partial-aggregated groupBy count, capped at
    ``max_words`` with the deterministic (count desc, word asc)
    tie-break (TakeOrderedAndProject — per-partition heaps, never a
    global sort). Bounded output regardless of corpus size."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
    )


def word_frequencies(df: DataFrame, text_col: str = "text",
                     max_words: int = 100_000) -> list[tuple[str, int]]:
    """Deterministic capped word-frequency table: the corpus's single
    full pass. Returns ``[(word, count)]`` sorted (count desc, word)."""
    wf = word_frequency_table(df, text_col, max_words)
    return [(r.w, int(r.c)) for r in wf.collect()]


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(df: DataFrame, text_col: str = "text", n_merges: int = 100,
              *, max_words: int = 100_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    the word table is tie-broken, and each iteration merges the
    (count, pair) lexicographic-max pair. Stops early when no pair
    repeats. Returns the ordered merge list."""
    wf = word_frequencies(df, text_col, max_words)
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wf:
        syms = tuple(list(w) + [_EOW])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        # accumulate, don't comprehend: two distinct symbol tuples can
        # merge to the SAME tuple (e.g. ('ab','c') and a pre-existing
        # ('abc',) formed by a different merge path) — a dict
        # comprehension would silently drop one word's frequency
        new_vocab: dict[tuple[str, ...], int] = {}
        for s, f in vocab.items():
            ns = _merge_word(s, pair) if pair[0] in s else s
            new_vocab[ns] = new_vocab.get(ns, 0) + f
        vocab = new_vocab
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge list (rank order)."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = tuple(list(word) + [_EOW])
    while len(syms) > 1:
        pairs = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
        if not pairs:
            break
        _, pair = min(pairs)
        syms = _merge_word(syms, pair)
    return list(syms)
