"""Streaming near-duplicate suppression: minhash-band LSH dedup at
ingestion time.

A training-data ingest pipeline wants to drop near-duplicate documents
AS THEY ARRIVE, not re-scan the corpus afterwards. The LSH rule: a
document is suppressed when ANY of its minhash band keys was already
seen (a banded collision is exactly the minhash near-dup candidate
signal of ``operators.dedup.minhash_lsh_pairs``); equivalently, it is
KEPT only when it is the first occurrence of EVERY one of its band
keys.

Construction (shingles → md5 hash family → linear minhash → banded
keys) is identical to the batch pipeline, but built as ONE nested
let-bound Column expression — no checkpoint/persist boundary, which a
streaming frame cannot have, and one evaluation pass per row (each
intermediate — words, grams, hashes, minima — is bound once via
``transform(array(x), f)[0]``; higher-order functions are
CodegenFallback with no common-subexpression elimination).

Faces:

* ``near_dedup_keep`` (batch) — winner of a band bucket is min(id);
  a doc is kept iff it wins all its bands. Deterministic, hence the
  oracle-checkable form (`stream_near_dedup_batch`).
* ``streaming_near_dedup`` — first ARRIVAL wins a bucket
  (``dropDuplicatesWithinWatermark`` keyed by (band_idx, key), state
  bounded by the watermark), then a windowed count keeps docs whose
  surviving bands == n_bands. Two chained stateful operators in append
  mode (supported since Spark 3.4). On an id-ordered arrival the two
  faces agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoopgis_spark.functions.text import md5_hash32, tokens
from hadoopgis_spark.materialize import durable_checkpoint
from hadoopgis_spark.operators.dedup import MH_PRIME
from hadoopgis_spark.streaming.events import _event_time

__all__ = [
    "minhash_band_rows",
    "near_dedup_keep",
    "streaming_near_dedup",
    "streaming_contamination",
]


def _band_array(text_col: str, n_hashes: int, n_bands: int, shingle_n: int):
    """array<struct<band_idx,key>> of the document's banded minhash —
    pure expressions, stream-safe, single pass via nested let-binds."""
    r = n_hashes // n_bands
    params = F.array(*[
        F.struct(F.lit(2 * i + 3).alias("a"), F.lit(1000003 * i + 12345).alias("b"))
        for i in range(n_hashes)
    ])

    def grams_of(w):
        if shingle_n == 1:
            return F.array_distinct(w)
        nk = F.greatest(F.size(w) - (shingle_n - 1), F.lit(0))
        g = w
        for k in range(1, shingle_n):
            g = F.zip_with(
                g, F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0))),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        return F.array_distinct(F.slice(g, 1, nk))

    def mh_of(hs):
        return F.transform(
            params,
            lambda p: F.array_min(
                F.transform(hs, lambda h: (p.getField("a") * h + p.getField("b")) % F.lit(MH_PRIME))
            ),
        )

    def bands_of(mh):
        return F.array(*[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.concat_ws(
                    "_", *[F.element_at(mh, r * bi + j + 1).cast("string") for j in range(r)]
                ).alias("key"),
            )
            for bi in range(n_bands)
        ])

    words = tokens(F.col(text_col))
    return F.transform(
        F.array(words),
        lambda w: F.transform(
            F.array(grams_of(w)),
            lambda g: F.transform(
                F.array(F.transform(g, lambda t: md5_hash32(t))),
                lambda hs: F.transform(F.array(mh_of(hs)), bands_of)[0],
            )[0],
        )[0],
    )[0]


def minhash_band_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_hashes: int = 16, n_bands: int = 4, shingle_n: int = 2,
                      keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, band_idx, key [, keep_cols]) — one row per (doc, band).
    Documents too short to produce a shingle are dropped (their minhash
    is undefined; every engine face agrees)."""
    bands = _band_array(text_col, n_hashes, n_bands, shingle_n)
    return (
        df.filter(F.size(tokens(F.col(text_col))) >= shingle_n)
        .select(F.col(id_col).alias("id"), *keep_cols, F.explode(bands).alias("b"))
        .select("id", *keep_cols, F.col("b.band_idx").alias("band_idx"), F.col("b.key").alias("key"))
    )


def near_dedup_keep(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    n_hashes: int = 16, n_bands: int = 4, shingle_n: int = 2) -> DataFrame:
    """Batch face: ids kept by LSH near-dup suppression — the winner of
    each band bucket is min(id) (deterministic stand-in for arrival
    order), and a doc survives iff it wins ALL its bands. Both
    aggregations partial-combine map-side; no windows, skew-safe."""
    bands = minhash_band_rows(df, text_col, id_col, n_hashes, n_bands, shingle_n)
    # the band frame feeds both sides of the winners join — materialize
    # once (batch frames only; a stream cannot checkpoint mid-plan and
    # never takes this face)
    bands = durable_checkpoint(bands)
    winners = bands.groupBy("band_idx", "key").agg(F.min("id").alias("wid"))
    return (
        bands.join(winners, ["band_idx", "key"])
        .groupBy("id")
        .agg(F.max((F.col("id") != F.col("wid")).cast("int")).alias("lost"))
        .filter(F.col("lost") == 0)
        .select("id")
    )


def streaming_near_dedup(stream: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                         ts_col: str = "ts", watermark: str = "1 hour",
                         window: str = "1 minute", n_hashes: int = 16, n_bands: int = 4,
                         shingle_n: int = 2) -> DataFrame:
    """Streaming face: suppress arriving documents whose ANY band key
    was seen within the watermark. First arrival wins each (band_idx,
    key) bucket (``dropDuplicatesWithinWatermark`` — per-key state is
    evicted after ``watermark``); a windowed count then emits ids whose
    surviving bands == ``n_bands`` once the window closes. Emits
    (window_start, id) in append mode."""
    e = _event_time(stream, ts_col)
    bands = minhash_band_rows(
        e, text_col, id_col, n_hashes, n_bands, shingle_n, keep_cols=("event_time",)
    ).withWatermark("event_time", watermark)
    first = bands.dropDuplicatesWithinWatermark(["band_idx", "key"])
    return (
        first.groupBy(F.window("event_time", window), F.col("id"))
        .count()
        .filter(F.col("count") == n_bands)
        .select(F.col("window.start").alias("window_start"), "id")
    )


def streaming_contamination(stream: DataFrame, eval_df: DataFrame, n: int = 8,
                            text_col: str = "text", id_col: str = "doc_id",
                            ts_col: str = "ts",
                            watermark: str = "1 hour") -> DataFrame:
    """Decontamination at ingestion: emit the id of every arriving
    document that shares a word ``n``-gram with the STATIC eval set
    (benchmarks are bounded — their n-grams broadcast), each id once.

    Stream shape: explode the arriving doc's n-grams (stateless), LEFT
    SEMI against the broadcast eval grams (stateless stream-static
    join), then one ``dropDuplicatesWithinWatermark`` on the id so a doc
    matching many grams emits a single row with bounded state. On a
    batch frame the same plan ends in ``distinct()`` — the
    oracle-checkable face."""
    from hadoopgis_spark.operators.curate import ngram_rows

    bad = eval_df.transform(
        lambda f: ngram_rows(f, n, text_col, id_col)
    ).select("g").distinct()
    if not stream.isStreaming:
        tg = ngram_rows(stream, n, text_col, id_col)
        return tg.join(F.broadcast(bad), "g", "left_semi").select("id").distinct()
    e = _event_time(stream, ts_col)
    tg = ngram_rows(e, n, text_col, id_col, keep_cols=("event_time",))
    hits = tg.join(F.broadcast(bad), "g", "left_semi")
    return (
        hits.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["id"])
        .select("id")
    )
