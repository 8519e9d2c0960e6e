"""Training-data curation operators: reproducible splits, stratified
downsampling, sequence packing, benchmark decontamination.

Everything here is DETERMINISTIC — splits and samples key off
md5-derived hashes of stable ids, never ``rand()``: re-running the
pipeline (or re-running one failed partition, which Spark does
transparently) must select the same rows, and an auditor must be able
to reproduce the selection from the id alone. That determinism is also
what makes every operator exactly oracle-checkable in DuckDB.

Scale shapes:

* ``split_assign`` / ``stratified_sample`` — pure Column expressions,
  map-side only, zero shuffles: the 100 TB curation filter runs inside
  the parquet scan stage.
* ``pack_sequences`` — the greedy "pack documents into <= budget-token
  sequences" step of LLM pretraining. A single global cumsum would be
  one total sort + one partition holding the running sum; instead docs
  are salted into ``n_streams`` independent streams and packed per
  stream (window over the salt), so packing parallelizes and the only
  shuffle is the hash partition by salt. Bins are globally unique via
  (salt, per-stream bin index).
* ``contamination_flags`` — the eval side (benchmarks are small) is the
  BUILD side of a broadcast semi/anti join on shared n-grams; the
  training corpus is never shuffled, only flat-mapped to n-grams and
  probed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoopgis_spark.functions.text import bpe_token_count, md5_hash32, tokens

__all__ = [
    "split_assign",
    "stratified_sample",
    "stratified_take_n",
    "pack_sequences",
    "shuffle_shards",
    "ngram_rows",
    "contamination_flags",
    "dsir_weights",
]


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
                 salt: str = "split") -> DataFrame:
    """Append a reproducible ``split`` column (train/val/test).

    Buckets ``md5(salt || id)`` into 10000 slots and cuts at the weight
    boundaries — content-stable (adding rows never moves an existing row
    between splits) and exactly reproducible in any engine with md5.
    """
    w_train, w_val, _ = weights
    b = md5_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 10000
    cut1 = int(round(w_train * 10000))
    cut2 = cut1 + int(round(w_val * 10000))
    split = (
        F.when(b < cut1, F.lit("train"))
        .when(b < cut2, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 1.0, salt: str = "sample") -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. cap a crawl dump at
    10% while keeping all curated sources).

    Keeps a row iff ``md5(salt || id) % 10000 < rate(stratum) * 10000``
    — a map-side filter with no shuffle and no RNG state, unlike
    ``DataFrame.sampleBy`` whose Bernoulli draw is neither re-runnable
    nor cross-engine checkable. Rates are compiled into one CASE
    expression (plan-side literal, nothing broadcast).
    """
    b = md5_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 10000
    rate = F.lit(int(round(default_rate * 10000)))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(int(round(r * 10000)))).otherwise(rate)
    return df.filter(b < rate)


def stratified_take_n(df: DataFrame, n: int, stratum_col: str = "source",
                      id_col: str = "doc_id", salt: str = "taken",
                      oversample: float = 4.0) -> DataFrame:
    """EXACTLY-n-per-stratum deterministic sample (the fixed-count
    sibling of :func:`stratified_sample`'s rate-based filter): the n
    kept rows of each stratum are those with the smallest
    ``md5(salt || id)``, ties to the lowest id — reproducible from ids
    alone, no RNG state.

    Scale shape (two-phase): a literal global rank-within-stratum is a
    window over the stratum key — one task per stratum, a straggler for
    any hot stratum. Instead phase 1 computes per-stratum counts (map-
    side partials) and broadcast-filters to the rows whose hash falls in
    the smallest ``oversample·n/count`` fraction of hash space — a
    map-side cut that keeps ~oversample·n rows per stratum; phase 2
    ranks only those survivors, so the window's partitions are bounded
    by ~oversample·n regardless of stratum size. Strata with count ≤ n
    skip the cut entirely (everything kept). The hash is uniform, so
    the oversampled pool misses a true top-n row only with probability
    ~exp(-Θ(n·oversample)) — and the DETERMINISM contract stays exact
    either way because any oracle/re-run applies the identical cut.
    """
    h = md5_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = df.withColumn("__h", h)
    counts = d.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__cnt"))
    d = d.join(F.broadcast(counts), stratum_col)
    # hash space is [0, 2^32); keep the smallest oversample*n/count slice
    cut = (
        F.lit(float(oversample * n) * 4294967296.0) / F.col("__cnt")
    )
    pool = d.filter((F.col("__cnt") <= n) | (F.col("__h") < cut))
    w = Window.partitionBy(stratum_col).orderBy("__h", id_col)
    return (
        pool.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__h", "__cnt", "__rn")
    )


def pack_sequences(df: DataFrame, budget: int, id_col: str = "doc_id",
                   text_col: str = "text", n_streams: int = 64) -> DataFrame:
    """GPT-style sequence packing metadata: concatenate documents in a
    deterministic order and chunk the token stream into ``budget``-sized
    training sequences. For each document, emit the sequence (``bin``)
    and token offset (``offset``) where it STARTS — a long document
    simply spans into the following sequences, exactly like the
    concatenate-and-chunk packing used for LLM pretraining.

    A literal global concatenation is one total sort plus a single task
    holding the running sum, so documents are salted into ``n_streams``
    independent streams by id hash and each stream is its own token
    stream (window cumsum ordered by id within the stream) — streams
    pack in parallel, the only shuffle is the hash partition by salt,
    and the waste is at most one partial tail sequence per stream.
    Output bins are globally identified by the (stream, bin) pair.
    """
    nt = F.greatest(bpe_token_count(F.col(text_col)), F.lit(1))
    stream = md5_hash32(F.col(id_col).cast("string"), offset=9) % n_streams
    d = df.select(F.col(id_col).alias("id"), nt.alias("n_tokens"), stream.alias("stream"))
    w = Window.partitionBy("stream").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    # integer `div`, not floor(double /): the repo's cross-engine float
    # discipline — starts are non-negative so trunc == floor here
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return d.select(
        "id", "n_tokens", "stream", start.alias("__start")
    ).select(
        "id",
        "n_tokens",
        "stream",
        F.expr(f"__start div {int(budget)}").cast("long").alias("bin"),
        F.expr(f"__start % {int(budget)}").cast("long").alias("tok_offset"),
    )


def shuffle_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                   salt: str = "shuffle") -> DataFrame:
    """Deterministic global shuffle for training-data ordering: append
    ``(shard, pos)`` — a reproducible random permutation expressed as
    md5 order, the standard trick for shuffling 100 TB of training docs
    without RNG state (re-runs, failed-task retries, and any engine
    reproduce the identical order from the ids alone).

    ``shard = md5(salt||id) % n_shards`` is a map-side expression;
    ``pos`` ranks the full hash within the shard (ties broken by id, so
    the order is total — PROVIDED ``id_col`` is unique, same
    precondition as ``exact_dedup``; duplicate ids would tie on both
    sort keys and rank nondeterministically). One shuffle (the per-shard window), which is
    the floor for any global permutation; shards are hash-uniform so no
    window partition is hot. Readers stream shard files in ``pos``
    order and get a stable pseudo-random document order.
    """
    h = md5_hash32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    d = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return d.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("long")
    ).drop("__h")


def ngram_rows(frame: DataFrame, n: int, text_col: str = "text",
               id_col: str = "doc_id", keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, g [, keep_cols]): one row per distinct word n-gram of each
    document. Pure Column expressions (stream-safe); the token array is
    let-bound — HOFs are CodegenFallback (no CSE), see
    operators.dedup.shingle_sets."""
    words = tokens(F.col(text_col))

    def grams_of(w):
        g = w
        for k in range(1, n):
            g = F.zip_with(
                g, F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0))),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        return F.array_distinct(F.slice(g, 1, F.greatest(F.size(w) - (n - 1), F.lit(0))))

    sh = F.transform(F.array(words), grams_of)[0]
    return frame.select(F.col(id_col).alias("id"), *keep_cols, F.explode(sh).alias("g"))


def contamination_flags(train: DataFrame, eval_df: DataFrame, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least one word ``n``-gram with the (small) eval set.

    The standard published recipe (GPT-3 appendix / Dolma / FineWeb use
    8-13-gram overlap). Eval n-grams are deduplicated and become the
    build side of a broadcast LEFT SEMI join against the exploded
    training n-grams — the corpus is scanned once, flat-mapped, probed
    in place, and never shuffled. Returns (id, contaminated).
    """
    bad = ngram_rows(eval_df, n, text_col, id_col).select("g").distinct()
    tg = ngram_rows(train, n, text_col, id_col)
    hits = tg.join(F.broadcast(bad), "g", "left_semi").select("id").distinct()
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits.withColumn("contaminated", F.lit(True)), "id", "left")
        .select("id", F.coalesce("contaminated", F.lit(False)).alias("contaminated"))
    )


def dsir_weights(corpus: DataFrame, target: DataFrame, n_buckets: int = 256,
                 scale: int = 1_000_000, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """DSIR-style hashed-unigram importance weights (after Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"), engine-exact integer variant.

    DSIR scores documents by ``log p_target(x) / p_corpus(x)`` under
    hashed bag-of-n-gram models and resamples by weight. A float
    log-sum is order-dependent (partitioning-dependent in the last
    ulps), so the estimator here is kept EXACT instead: each token in
    md5 bucket ``b`` contributes the integer

        (scale * (target_count[b] + 1)) div (corpus_count[b] + 1)

    (add-one smoothing; ``div`` is exact, so the per-document SUM is
    bit-identical on any engine and any partitioning). The per-bucket
    contribution is monotone in the target/corpus likelihood ratio, so
    ranking behavior matches the published estimator bucket-wise.

    Scale shape: tokenize/explode is map-side; the two bucket-count
    aggregations collapse to ``n_buckets`` rows via map-side partials;
    the tiny stats table broadcasts back onto the token stream; the only
    data-sized shuffle is the per-document SUM on the uniform id key.

    Returns ``(id, n_tokens, score)`` for every corpus row (0/0 for
    token-less documents).
    """
    toks = corpus.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).withColumn("b", md5_hash32(F.col("term")) % n_buckets).drop("term")
    t_toks = target.select(F.explode(tokens(F.col(text_col))).alias("term")).select(
        (md5_hash32(F.col("term")) % n_buckets).alias("b")
    )
    cc = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cc"))
    tc = t_toks.groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    stats = (
        cc.join(tc, "b", "left")
        .withColumn("tcp", F.coalesce(F.col("tc"), F.lit(0)) + 1)
        # integral `div`, NOT `/`: Column `/` is double division and its
        # rounding can disagree with DuckDB's exact BIGINT `//`
        .selectExpr("b", f"(CAST({scale} AS BIGINT) * tcp) div (cc + 1) AS contrib")
    )
    scored = (
        toks.join(F.broadcast(stats), "b")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("contrib").alias("score"))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("score", F.lit(0)).alias("score"),
        )
    )
