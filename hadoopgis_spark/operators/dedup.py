"""Deduplication operators for document pipelines.

Library surface behind the workload's dedup queries, plus SimHash and
embedding near-dup. All hot paths are JVM Column expressions; the only
driver-side data is parameters. Hash primitives are md5-derived
(cross-engine deterministic, see ``functions.text.md5_hash32``).

Techniques (all public knowledge: Broder '97 minhash, Charikar '02
simhash, banding from Leskovec et al. MMDS):

* ``exact_dedup``        — hash-groupBy, keep first per group
* ``minhash_lsh_pairs``  — shingle → minhash → band → bucket-join
* ``simhash64``/``simhash_pairs`` — 64-bit sign fingerprint, near-dup =
  small Hamming distance (banded by 16-bit chunks for candidates)
* ``jaccard_verify``     — exact set-jaccard verification of candidates
* ``jaccard_prefix_pairs`` — COMPLETE jaccard join (prefix filtering)
* ``embedding_dup_pairs`` — cosine ≥ τ pairs via ANN candidates
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoopgis_spark.functions.text import md5_hash32, normalize_text, tokens
from hadoopgis_spark.materialize import durable_checkpoint

__all__ = [
    "exact_dedup",
    "line_dedup",
    "shingle_sets",
    "minhash_signature",
    "minhash_lsh_pairs",
    "jaccard_verify",
    "jaccard_prefix_pairs",
    "simhash64",
    "simhash_pairs",
    "embedding_dup_pairs",
    "semdedup_pairs",
    "edit_dup_pairs",
    "dup_clusters",
    "keep_best",
    "dup_spans",
]

MH_PRIME = 4294967311  # prime > 2^32; (a·h+b) products stay < 2^63


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalized: bool = False, check_unique: bool = False) -> DataFrame:
    """Keep the lowest-id row per identical (optionally normalized) text.

    Skew-proof shape: ``groupBy(hash).agg(min(id))`` (map-side partial
    aggregation — a document duplicated millions of times collapses to
    one row per map task) followed by a LEFT SEMI join on the UNIFORM id
    key. A window partitioned by the content hash would funnel every
    copy of a hot document into one task AQE cannot split.

    PRECONDITION: ``id_col`` must be globally unique — the semi join
    keeps every row carrying a winning id, so a duplicated id would
    retain all its copies where the window form kept one. Pass
    ``check_unique=True`` to verify (one extra aggregation job) and fail
    loudly instead of silently returning duplicates.
    """
    if check_unique:
        dup = (
            df.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"exact_dedup requires unique {id_col!r}: id {dup[0][0]!r} "
                f"appears {dup[0]['_n']} times"
            )
    key = F.md5(normalize_text(F.col(text_col))) if normalized else F.md5(F.col(text_col))
    keyed = df.withColumn("_k", key)
    winners = keyed.groupBy("_k").agg(F.min(F.col(id_col)).alias(id_col)).drop("_k")
    return keyed.join(winners, on=id_col, how="left_semi").drop("_k")


def line_dedup(df: DataFrame, lines_col: str = "lines", id_col: str = "doc_id") -> DataFrame:
    """Corpus-GLOBAL exact line dedup (the C4 cleanup step: a line that
    appears anywhere else in the corpus survives only at its first
    occurrence). Keeps each distinct line's first copy by (id, position),
    drops every other copy, and reassembles documents preserving line
    order. Returns (id, lines) — documents whose every line was a
    repeat disappear.

    Scale shape: explode → ``groupBy(line).agg(min(struct(id, pos)))`` →
    re-group by id. Deliberately an aggregation, NOT a window: min() gets
    map-side partial aggregation, so a pathologically hot line (empty
    string, boilerplate — guaranteed at corpus scale) collapses to one
    row per map task before the shuffle, where a window partitioned by
    line would funnel every copy into a single straggler task that AQE
    cannot split. Two shuffles total, no driver data.
    """
    e = df.select(id_col, F.posexplode(F.col(lines_col)).alias("pos", "line"))
    kept = (
        e.groupBy("line")
        .agg(F.min(F.struct(id_col, "pos")).alias("_w"))
        .select(F.col(f"_w.{id_col}").alias(id_col), F.col("_w.pos").alias("pos"), "line")
    )
    return kept.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "line"))),
            lambda s: s["line"],
        ).alias(lines_col)
    )


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 2) -> DataFrame:
    """(id, sh, hs): distinct word n-gram shingles + one 32-bit hash per
    shingle. n-grams built with zip_with chains — never element_at(expr)
    inside a lambda (that inlines the tokenize expression per element).

    The token array and the gram array are LET-BOUND via
    ``transform(array(x), f)[0]``: higher-order functions are
    CodegenFallback (no common-subexpression elimination), so the gram
    chain's ~2(n+1) references to the bare ``tokens()`` expression would
    each re-run the two normalization regexes over the whole document —
    measured 3x on the trigram build. The packed (sh, hs) struct is
    checkpointed BEFORE the empty-set filter and the column fan-out:
    projection collapse would otherwise substitute the whole shingle
    expression once per consumer (filter + sh + hs = 3 evaluations)."""
    words = tokens(F.col(text_col))

    def grams_of(w):
        if n == 1:
            return F.array_distinct(w)
        nk = F.greatest(F.size(w) - (n - 1), F.lit(0))
        grams = w
        for k in range(1, n):
            grams = F.zip_with(
                grams, F.slice(w, k + 1, F.greatest(F.size(w) - k, F.lit(0))),
                lambda x, y: F.concat_ws(" ", x, y),
            )
        return F.array_distinct(F.slice(grams, 1, nk))

    def pack(w):
        return F.transform(
            F.array(grams_of(w)),
            lambda g: F.struct(
                g.alias("sh"),
                F.transform(g, lambda t: md5_hash32(t)).alias("hs"),
            ),
        )[0]

    packed = F.transform(F.array(words), pack)[0]
    return (
        df.select(F.col(id_col).alias("id"), packed.alias("p"))
        .transform(durable_checkpoint)
        .filter(F.size("p.sh") > 0)
        .select("id", "p.sh", "p.hs")
    )


def minhash_signature(shingled: DataFrame, n_hashes: int = 16) -> DataFrame:
    """(id, mh0..mh{n-1}) linear minhash family over the shingle hashes."""
    def mh(i):
        a, b = F.lit(2 * i + 3), F.lit(1000003 * i + 12345)
        return F.array_min(
            F.transform(F.col("hs"), lambda h: (a * h + b) % F.lit(MH_PRIME))
        ).alias(f"mh{i}")

    return shingled.select("id", *[mh(i) for i in range(n_hashes)])


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      shingle_n: int = 2, n_hashes: int = 16, n_bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs (id_1 < id_2) via banded minhash."""
    r = n_hashes // n_bands
    sig = minhash_signature(shingle_sets(df, text_col, id_col, shingle_n), n_hashes).transform(durable_checkpoint)
    bands = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band_idx"),
                F.concat_ws("_", *[F.col(f"mh{r*bi+j}") for j in range(r)]).alias("key"),
            )
            for bi in range(n_bands)
        ])).alias("band"),
    ).select("id", "band.band_idx", "band.key")
    return (
        bands.alias("a")
        .join(bands.withColumnRenamed("id", "id2").alias("b"), ["band_idx", "key"])
        .filter(F.col("id") < F.col("id2"))
        .select(F.col("id").alias("id_1"), F.col("id2").alias("id_2"))
        .distinct()
    )


def jaccard_verify(candidates: DataFrame, shingled: DataFrame, threshold: float) -> DataFrame:
    """Exact jaccard over candidate pairs; keeps pairs ≥ threshold."""
    a = shingled.select(F.col("id").alias("id_1"), F.col("sh").alias("_sh1"))
    b = shingled.select(F.col("id").alias("id_2"), F.col("sh").alias("_sh2"))
    j = candidates.join(a, "id_1").join(b, "id_2")
    inter = F.size(F.array_intersect("_sh1", "_sh2"))
    uni = F.size(F.array_union("_sh1", "_sh2"))
    return (
        j.withColumn("jaccard", inter.cast("double") / uni)
        .filter(F.col("jaccard") >= threshold)
        .drop("_sh1", "_sh2")
    )


def jaccard_prefix_pairs(df: DataFrame | None, text_col: str = "text",
                         id_col: str = "doc_id", shingle_n: int = 2,
                         threshold: float = 0.5,
                         shingled: DataFrame | None = None) -> DataFrame:
    """EXACT all-pairs set-jaccard ≥ ``threshold`` via prefix filtering.

    The AllPairs/PPJoin family (Bayardo et al. WWW'07; Xiao et al.
    WWW'08; parallel dataflow from Vernica, Carey & Li SIGMOD'10 — all
    public knowledge). Complements :func:`minhash_lsh_pairs`: LSH recall
    is probabilistic, this join is COMPLETE — every pair whose shingle
    jaccard meets the threshold is returned, with its exact similarity.

    Dataflow (the SIGMOD'10 parallel shape, Spark-native):

    1. global shingle document-frequency — a vocab-sized aggregate;
    2. each doc orders its shingles rarest-first (total order: (df,
       shingle) ascending) and emits two prefixes: the PROBE prefix
       (first ``s - ceil(t*s) + 1`` shingles) and the shorter INDEX
       prefix (first ``s - ceil(2t/(1+t)*s) + 1``). Completeness
       (textbook PPJoin): with the length filter ``|B| ≥ t·|A|`` and
       ``|B| ≤ |A|``, J(A,B) ≥ t implies overlap ≥ α_req =
       ``ceil(t/(1+t)·(|A|+|B|))``, α_req ≥ ceil(t·|A|) and ≥
       ceil(2t/(1+t)·|B|), and two sets with overlap ≥ a share a token
       among the first ``s - a + 1`` tokens of each under ANY common
       total order — so the earliest common token of a qualifying pair
       sits in the larger doc's probe prefix AND the smaller doc's
       index prefix;
    3. equi-join probe(larger) × index(smaller) on the prefix shingle —
       never all-pairs — with the length filter and PPJoin's positional
       filter: a match at 1-based positions (pa, pb) bounds the overlap
       by ``1 + min(sz_a - pa, sz_b - pb)``; rows whose bound < α_req
       cannot come from the earliest common token of a qualifying pair;
    4. :func:`jaccard_verify` on the surviving candidates.

    100 TB notes: the frequency join keys both sides on the shingle, so
    it shares one shuffle partitioning (AQE broadcasts when the vocab is
    small); rarest-first ordering keeps prefix-bucket sizes small — the
    corpus's hottest shingles are never prefix members at useful
    thresholds, which is exactly the skew that would otherwise melt the
    candidate join. All ceils carry a 1e-9 slack so float rounding can
    only LENGTHEN a prefix or LOOSEN a filter (the safe directions for
    completeness); exactness of the output comes from the verify step.
    """
    base = shingled if shingled is not None else shingle_sets(df, text_col, id_col, shingle_n)
    t = float(threshold)
    eps = F.lit(1e-9)
    ex = base.select("id", F.size("sh").alias("sz"), F.explode("sh").alias("tok"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    ordered = (
        ex.join(freq, "tok")
        .groupBy("id", "sz")
        .agg(F.sort_array(F.collect_list(F.struct(F.col("cnt"), F.col("tok")))).alias("ord"))
    )

    def prefix(frame, length_factor, names):
        plen = (F.col("sz") - F.ceil(F.lit(length_factor) * F.col("sz") - eps) + 1).cast("int")
        return frame.select(
            F.col("id").alias(names[0]),
            F.col("sz").alias(names[1]),
            F.posexplode(F.slice(F.col("ord"), F.lit(1), plen)).alias("p0", "p"),
        ).select(names[0], names[1], (F.col("p0") + 1).alias(names[2]), F.col("p.tok").alias("tok"))

    probe = prefix(ordered, t, ("id_p", "sz_p", "pos_p"))
    index = prefix(ordered, 2 * t / (1 + t), ("id_i", "sz_i", "pos_i"))
    alpha_req = F.ceil(F.lit(t / (1 + t)) * (F.col("sz_p") + F.col("sz_i")) - eps)
    overlap_ub = 1 + F.least(F.col("sz_p") - F.col("pos_p"), F.col("sz_i") - F.col("pos_i"))
    cand = (
        probe.join(index, "tok")
        .filter(
            # probe the larger record against the smaller's index prefix
            ((F.col("sz_p") > F.col("sz_i"))
             | ((F.col("sz_p") == F.col("sz_i")) & (F.col("id_p") < F.col("id_i"))))
            & (F.col("sz_i").cast("double") >= F.lit(t) * F.col("sz_p") - eps)
            & (overlap_ub >= alpha_req)
        )
        .select(
            F.least("id_p", "id_i").alias("id_1"),
            F.greatest("id_p", "id_i").alias("id_2"),
        )
        .distinct()
    )
    return jaccard_verify(cand, base, threshold)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) 64-bit SimHash over word tokens.

    Per bit b: sign of Σ_tokens (±1 depending on bit b of the token
    hash). Two md5-derived 32-bit hashes form the 64-bit space. Stored
    as the bit array folded to a BIGINT via aggregate — all JVM.
    """
    words = F.array_distinct(tokens(F.col(text_col)))
    # One pass, all JVM codegen: explode distinct tokens, hash each token
    # once per 32-bit half, then a single hash aggregation computing the 63
    # per-bit vote sums as flat SUM(CASE ...) columns. Map-side partial
    # aggregation reduces the shuffle to one 63-long row per document —
    # this replaces the previous 63 independent F.aggregate folds per row
    # (each re-traversing the whole token-hash array; CLAUDE.md trap list).
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(words).alias("t"))
        .select(
            "id",
            # both 32-bit halves come from ONE md5 digest (offsets 1 and 9)
            # — codegen subexpression elimination evaluates md5 once/token
            md5_hash32(F.col("t")).alias("h1"),
            md5_hash32(F.col("t"), offset=9).alias("h2"),
        )
    )
    # the 63 vote aggregates and the bit fold are emitted as SQL text —
    # ONE JVM parse per expression instead of ~10,000 py4j round trips
    # (round 13, the wave-2 treatment; measured 4.2 s of pure driver
    # plan construction before). Everything here is exact INTEGER
    # arithmetic (±1 vote sums, power-of-two adds), so unlike the float
    # folds there is no IEEE-tree-parity concern: any equivalent
    # expression yields bit-identical values.
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright({'h1' if b < 32 else 'h2'}, {b % 32})"
            f" & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"_v{b}")
        for b in range(63)
    ]
    sig = tok.groupBy("id").agg(*votes)
    # 63-bit fingerprint: bit 63 would need 1<<63 which overflows signed long
    sim = " + ".join(
        f"(CASE WHEN _v{b} > 0 THEN CAST({1 << b} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(63)
    )
    return sig.select("id", F.expr(f"CAST(0 AS BIGINT) + {sim}").alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates: Hamming(simhash) ≤ max_hamming, banded on
    16-bit chunks (a pair within distance 3 must agree on ≥1 of 4
    chunks — pigeonhole), verified with exact popcount."""
    sig = simhash64(df, text_col, id_col).persist()
    chunks = sig.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
            )
            for c in range(4)
        ])).alias("ck"),
    ).select("id", "simhash", "ck.chunk_idx", "ck.chunk")
    cand = (
        chunks.alias("a")
        .join(
            chunks.select(
                F.col("id").alias("id2"), F.col("simhash").alias("simhash2"),
                "chunk_idx", "chunk",
            ).alias("b"),
            ["chunk_idx", "chunk"],
        )
        .filter(F.col("id") < F.col("id2"))
        .select(F.col("id").alias("id_1"), F.col("id2").alias("id_2"),
                "simhash", "simhash2")
        .distinct()
    )
    ham = F.bit_count(F.col("simhash").bitwiseXOR(F.col("simhash2")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_1", "id_2", "hamming")
    )


def edit_dup_pairs(df: DataFrame, candidates: DataFrame, max_dist: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   normalized: bool = True) -> DataFrame:
    """Edit-distance near-dup verification: join candidate id pairs back
    to their (optionally normalized) texts and keep pairs with
    Levenshtein distance ≤ ``max_dist``. Returns (id_1, id_2, edit_dist).

    The character-level tier of the dedup family — catches small edits
    (typo fixes, boilerplate tweaks) that token-set jaccard scores as
    identical and simhash may miss. The DP is O(|a|·|b|) per pair,
    which is exactly why this ONLY ever runs on a bounded candidate set
    (``minhash_lsh_pairs`` / ``jaccard_prefix_pairs`` output), never all
    pairs; Spark's 3-arg ``levenshtein`` abandons the DP early once the
    running distance exceeds ``max_dist`` (returns -1), so a
    far-apart candidate costs O(max_dist · min_len), not the full
    matrix. JVM built-in — no Python in the loop."""
    t = normalize_text(F.col(text_col)) if normalized else F.col(text_col)
    txt = df.select(F.col(id_col).alias("__id"), t.alias("__t"))
    j = (
        candidates.join(txt.select(F.col("__id").alias("id_1"), F.col("__t").alias("__t1")), "id_1")
        .join(txt.select(F.col("__id").alias("id_2"), F.col("__t").alias("__t2")), "id_2")
    )
    d = F.levenshtein(F.col("__t1"), F.col("__t2"), int(max_dist))
    return (
        j.withColumn("edit_dist", d)
        .filter(F.col("edit_dist") >= 0)
        .select("id_1", "id_2", "edit_dist")
    )


def semdedup_pairs(df: DataFrame, centroids, *, dim: int, threshold: float = 0.9,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) candidate pairs:
    semantic duplicates = embedding pairs with cosine ≥ ``threshold``
    WITHIN the same k-means cluster. Returns (id_1, id_2, cosine, cid),
    id_1 < id_2; compose with :func:`dup_clusters` + keep-min-id for the
    published keep-one-per-group prune.

    Scale shape (the paper's own): clustering gates the quadratic — the
    candidate join is cid-equi (one shuffle keyed on cluster id), never
    an all-pairs product; within a cluster the comparison IS quadratic
    by design, so size ``len(centroids)`` to bound cluster populations
    (the paper uses 50k clusters for 5B embeddings). Cluster assignment
    is map-only over literal centroids (``ivf_assign``), vector norms
    are computed once per row there, and the per-pair work is a single
    dot fold.
    """
    from hadoopgis_spark.functions.vector import cosine_from, dot
    from hadoopgis_spark.operators.similarity import ivf_assign

    asg = ivf_assign(
        df, vec_col, id_col, n_centroids=len(centroids), dim=dim, centroids=centroids
    )
    a = asg.select(
        F.col("id").alias("id_1"), F.col("vec").alias("v1"),
        F.col("v_norm").alias("n1"), "cid",
    )
    b = asg.select(
        F.col("id").alias("id_2"), F.col("vec").alias("v2"),
        F.col("v_norm").alias("n2"), "cid",
    )
    return (
        a.join(b, "cid")
        .filter(F.col("id_1") < F.col("id_2"))
        .withColumn(
            "cosine", cosine_from(dot(F.col("v1"), F.col("v2")), F.col("n1"), F.col("n2"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_1", "id_2", "cosine", "cid")
    )


def dup_clusters(pairs: DataFrame, max_iters: int = 15) -> DataFrame:
    """Connected components over near-dup pairs → (id, cluster) with
    cluster = min id of the component (the canonical survivor).

    Distributed min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(component diameter) rounds (dup clusters are shallow). Each round
    is one join + one aggregation; labels are checkpointed so lineage
    stays flat. No driver-side graph, scales with the pair list.
    """
    edges = pairs.select(
        F.col("id_1").alias("src"), F.col("id_2").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_2").alias("src"), F.col("id_1").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .transform(durable_checkpoint)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # ONE action per round (round 13; was three — checkpoint job,
        # a join-based diff, an isEmpty): the new label row carries its
        # own did-it-change flag, the checkpoint is LAZY, and the
        # convergence count both materializes the checkpointed frame
        # (an action on any child computes the full parent RDD once)
        # and answers the stop test.
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label"))
                 < F.col("label")).alias("_chg"),
            )
            .transform(lambda d: durable_checkpoint(d, eager=False))
        )
        n_changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if n_changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster"))


def embedding_dup_pairs(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
                        threshold: float = 0.95, n_planes: int = 8,
                        *, dim: int) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, with random-
    hyperplane LSH bucketing as the candidate generator (see
    operators.similarity.hyperplane_buckets). ``dim`` is required so
    no schema-probe job ever runs."""
    from hadoopgis_spark.functions.vector import cosine_from, dot, norm
    from hadoopgis_spark.operators.similarity import hyperplane_buckets

    # norm once per row pre-join (the norm fold is CodegenFallback and
    # would re-run per candidate pair otherwise)
    b = hyperplane_buckets(df, vec_col, id_col, n_planes=n_planes, dim=dim).withColumn(
        "nrm", norm(F.col("vec"))
    )
    cand = (
        b.alias("a")
        .join(
            b.select(
                F.col("id").alias("id2"), F.col("vec").alias("vec2"),
                F.col("nrm").alias("nrm2"), "bucket",
            ).alias("b"),
            "bucket",
        )
        .filter(F.col("id") < F.col("id2"))
        .select(
            F.col("id").alias("id_1"), F.col("id2").alias("id_2"),
            "vec", "vec2", "nrm", "nrm2",
        )
        .dropDuplicates(["id_1", "id_2"])
    )
    return (
        cand.withColumn(
            "cosine",
            cosine_from(dot(F.col("vec"), F.col("vec2")), F.col("nrm"), F.col("nrm2")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_1", "id_2", "cosine")
    )


def keep_best(corpus: DataFrame, clusters: DataFrame, score,
              id_col: str = "doc_id") -> DataFrame:
    """Survivor selection — the dedup pipeline's endpoint: given the
    (id, cluster) table from :func:`dup_clusters` and a per-document
    ``score`` Column, decide which document of each near-dup group to
    KEEP (highest score, ties to the lowest id — use an integer score
    like a token count for cross-engine determinism). Documents in no
    cluster are their own singleton group and are always kept.

    Returns (id, cluster, keep). Scale shape: one left join on the
    uniform id key + one window over the cluster key — groups are
    near-dup clusters (small by construction), so no hot partition; the
    score expression is evaluated once per row, map-side.
    """
    scored = corpus.select(F.col(id_col).alias("id"), score.alias("__s"))
    j = scored.join(clusters, "id", "left").withColumn(
        "cluster", F.coalesce(F.col("cluster"), F.col("id"))
    )
    w = Window.partitionBy("cluster").orderBy(F.col("__s").desc(), F.col("id"))
    return (
        j.withColumn("keep", F.row_number().over(w) == 1)
        .select("id", "cluster", "keep")
    )


def dup_spans(df: DataFrame, min_tokens: int = 8, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """EXACT duplicated-span detection (the token-level form of Lee et
    al. '22 "Deduplicating Training Data Makes Language Models Better"):
    every maximal token span of length >= ``min_tokens`` whose content
    occurs at least twice in the corpus (across documents or repeated
    within one).

    Shape: position-stamped ``min_tokens``-gram hashes (one let-bound
    transform per doc — JVM, no Python), a corpus-wide occurrence count
    with map-side partials, a semi join back to the positions, then
    per-doc gaps-and-islands (``pos − row_number``) merges runs of
    duplicated grams into MAXIMAL spans. Unlike the winnowing-based
    ``txt_dup_passages`` sampling signal this is exact — and unlike a
    suffix array it is plain hash aggregation, so it distributes with
    ordinary shuffles (the gram explode is the honest cost every exact
    substring-dedup pipeline pays).

    Returns (id, span_start, span_len): 1-based token offset and length
    in tokens of each maximal duplicated span.
    """
    L = min_tokens
    words = tokens(F.col(text_col))

    def grams(w):
        return F.when(
            F.size(w) >= L,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (L - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(F.concat_ws(" ", F.slice(w, i, L))).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))

    g = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(F.array(words), grams)[0]).alias("z"),
    ).select("id", F.col("z.pos").alias("pos"), F.col("z.h").alias("h"))

    hot = g.groupBy("h").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 2)
    d = g.join(hot.select("h"), "h", "left_semi")

    w = Window.partitionBy("id").orderBy("pos")
    islands = d.withColumn("isl", F.col("pos") - F.row_number().over(w))
    return (
        islands.groupBy("id", "isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") - F.min("pos") + L).cast("long").alias("span_len"),
        )
        .select("id", "span_start", "span_len")
    )
