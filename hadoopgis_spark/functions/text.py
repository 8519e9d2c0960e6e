"""Text-analysis functions for large-scale document pipelines.

All pure Column expressions (JVM-side, codegen) — no Python in the hot
path. Deterministic and expressible in ANSI SQL so every operator built
on them can be oracle-checked.

The cross-engine hash primitive is md5-derived: Spark's ``md5`` and
DuckDB's ``md5`` agree byte-for-byte, so ``md5_hash32`` gives identical
32-bit integer hashes in both engines (unlike murmur/xxhash, whose
seeds differ between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "token_count",
    "char_count",
    "avg_word_len",
    "punct_ratio",
    "alpha_ratio",
    "stopword_ratio",
    "lang_guess",
    "quality_score",
    "fingerprint",
    "char_entropy",
    "winnow_fingerprints",
    "char_shingles",
    "md5_hash32",
    "bpe_tokens",
    "bpe_token_count",
    "pii_count",
    "pii_redact",
    "hashed_bow_embedding",
    "BPE_PATTERN",
    "PII_PATTERNS",
    "STOPWORDS",
]

# GPT-2-style pre-tokenization pattern, restricted to constructs RE2 and
# Java regex match identically (no lookahead, no unicode classes): an
# optional leading space glued to a letter / digit / punctuation run,
# else a whitespace run. Token counts from this are the standard cheap
# proxy for BPE token budgets in training-data pipelines.
BPE_PATTERN = r"'(?:ll|ve|re|[sdmt])| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"

# small public stopword lists per language for the n-gram/stopword
# language heuristic (public knowledge; any basic list works)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "pour", "que", "une"],
    "es": ["el", "la", "los", "las", "es", "en", "que", "por", "con", "para"],
}


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v)


def normalize_text(col) -> Column:
    """lowercase, strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.trim(F.regexp_replace(c, " +", " "))
    return c


def tokens(col) -> Column:
    """Whitespace tokens of the normalized text (empty string → [])."""
    n = normalize_text(col)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(F.split(n, " "))


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_tokens(col) -> Column:
    """BPE-ish pre-tokens of the raw text (``BPE_PATTERN`` matches, in
    order). Unlike ``tokens`` this is NOT normalized — whitespace runs
    and punctuation count, like a real tokenizer's input segmentation."""
    return F.regexp_extract_all(_c(col), F.lit(BPE_PATTERN), 0)


def bpe_token_count(col) -> Column:
    """Proxy token budget of a document (JVM regex, no Python)."""
    return F.size(bpe_tokens(col))


def char_count(col) -> Column:
    return F.length(_c(col))


def avg_word_len(col) -> Column:
    t = tokens(col)
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / F.size(t),
    ).otherwise(F.lit(0.0))


def punct_ratio(col) -> Column:
    """Fraction of characters that are .,!?;: punctuation."""
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, "[.,!?;:]", ""))
    return F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def alpha_ratio(col) -> Column:
    c = _c(col)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return F.when(F.length(c) > 0, n_alpha.cast("double") / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    t = tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def lang_guess(col) -> Column:
    """Stopword-vote language heuristic: the language whose stopword list
    scores the most token hits; 'und' (undetermined) when no hits.

    Single-pass: all four languages' votes are packed into one long
    (14-bit lanes) accumulated by ONE aggregate over the token array —
    the tokenize expression is evaluated once, not per language.
    Per-language counts cap at 2^14-1 hits (ample for any document).
    """
    t = tokens(col)
    langs = sorted(STOPWORDS)  # lane order: de, en, es, fr
    arrays = {lang: F.array(*[F.lit(w) for w in STOPWORDS[lang]]) for lang in langs}

    def tok_votes(tok):
        s = F.lit(0).cast("long")
        for i, lang in enumerate(langs):
            s = s + F.when(
                F.array_contains(arrays[lang], tok), F.lit(1 << (14 * i)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return s

    packed = F.aggregate(t, F.lit(0).cast("long"), lambda acc, tok: acc + tok_votes(tok))
    hits = {
        lang: F.shiftright(packed, 14 * i).bitwiseAND(F.lit((1 << 14) - 1))
        for i, lang in enumerate(langs)
    }
    # argmax with deterministic tie-break priority es > fr > en > de —
    # with a strict `>` comparison the first-processed language wins
    # ties, and this order matches the TXT_LANG_SQL oracle's CASE
    # cascade exactly (e.g. 'la la': la ∈ both es+fr stopwords → 'es').
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in ("es", "fr", "en", "de"):
        cond = hits[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, hits[lang]).otherwise(best_score)
    return best


def quality_score(col) -> Column:
    """Composite [0,1] document quality: length band + alpha ratio +
    moderate word length + stopword presence. Deterministic arithmetic.

    Single-pass: token count, summed word length, and stopword hits are
    packed into one long (count<<40 | sum_len<<14 | hits) accumulated by
    ONE aggregate over the token array, so the tokenize expression is
    evaluated once. Lanes cap at 2^20 tokens / 2^26 chars / 2^14 hits.
    """
    c = _c(col)
    t = tokens(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])

    def tok_acc(tok):
        hit = F.when(F.array_contains(sw, tok), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        return (
            F.lit(1 << 40).cast("long")
            + (F.length(tok).cast("long") * F.lit(1 << 14).cast("long"))
            + hit
        )

    packed = F.aggregate(t, F.lit(0).cast("long"), lambda acc, tok: acc + tok_acc(tok))

    # HOFs are CodegenFallback (no codegen CSE), so referencing `packed`
    # three times would re-tokenize and re-fold per reference. transform
    # over a 1-element array is a let-binding: the lambda variable `p`
    # is the evaluated-once packed value.
    def unpack(p):
        n_tok = F.shiftright(p, 40)
        sum_len = F.shiftright(p, 14).bitwiseAND(F.lit((1 << 26) - 1))
        hits = p.bitwiseAND(F.lit((1 << 14) - 1))
        awl = F.when(n_tok > 0, sum_len.cast("double") / n_tok).otherwise(F.lit(0.0))
        wl_score = F.when((awl >= 3.0) & (awl <= 10.0), 1.0).otherwise(0.5)
        swr = F.when(n_tok > 0, hits.cast("double") / n_tok).otherwise(F.lit(0.0))
        sw_score = F.least(swr * 5.0, F.lit(1.0))
        return wl_score + sw_score

    tok_scores = F.transform(F.array(packed), unpack)[0]
    len_score = F.least(F.length(c).cast("double") / 500.0, F.lit(1.0))
    return (len_score + alpha_ratio(c) + tok_scores) / 4.0


def fingerprint(col) -> Column:
    """Normalization fingerprint: md5 of the normalized text — identical
    docs modulo case/punct/whitespace collide (rolling-hash analogue)."""
    return F.md5(normalize_text(col))


# the normalized alphabet (everything normalize_text can emit)
_NORM_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(col) -> Column:
    """Shannon entropy (bits) of the normalized character distribution —
    the classic gibberish/boilerplate detector (near-0 = one repeated
    character, ~4.7 max over the 37-char alphabet; English prose sits
    around 4).

    Pure JVM single pass: the normalized text is let-bound once, each
    character's count is ``length(n) - length(replace(n, ch))`` (37
    cheap codegen terms, no explode/shuffle), and the entropy sum folds
    over that count array IN FIXED ALPHABET ORDER — the oracle sums the
    same literal order, so the only cross-engine wiggle is libm log
    (rounded at the gate per the float discipline)."""

    def body(n):
        length = F.length(n).cast("double")
        counts = F.array(*[
            (F.length(n) - F.length(F.replace(n, F.lit(ch), F.lit("")))).cast("double")
            for ch in _NORM_CHARS
        ])
        term = lambda acc, c: acc + F.when(
            c > 0, (c / length) * F.log2(c / length)).otherwise(F.lit(0.0))
        return F.when(
            F.length(n) == 0, F.lit(0.0)
        ).otherwise(-F.aggregate(counts, F.lit(0.0), term))

    return F.transform(F.array(normalize_text(col)), body)[0]


def winnow_fingerprints(col, k: int = 5, w: int = 8) -> Column:
    """MOSS-style winnowing fingerprints (Schleimer et al., SIGMOD '03):
    hash every character k-gram of the normalized text, slide a window
    of ``w`` consecutive hashes, keep each window's minimum, dedup and
    sort. Any shared substring of length ≥ w+k-1 between two documents
    GUARANTEES a shared fingerprint — the partial-overlap detector the
    whole-doc :func:`fingerprint` can't provide.

    Pure Column expression. The k-gram hash array is let-bound via
    ``transform(array(x), f)[0]`` (HOFs are CodegenFallback — a repeated
    reference would re-hash every k-gram per window otherwise).
    """
    hs = F.transform(char_shingles(col, k), lambda s: md5_hash32(s))

    def windows(h):
        n = F.size(h)
        mins = F.when(
            n >= w,
            F.transform(
                F.sequence(F.lit(0), n - w),
                lambda j: F.array_min(F.slice(h, j + 1, w)),
            ),
        ).otherwise(F.array(F.array_min(h)))
        return F.array_sort(F.array_distinct(mins))

    return F.transform(F.array(hs), windows)[0]


def char_shingles(col, n: int = 5) -> Column:
    """Array of overlapping character n-grams of the normalized text.

    The normalization (three regex passes) is let-bound via
    ``transform(array(x), f)[0]`` so the per-element ``substr`` reads the
    materialized string — referencing the regex expression inside the
    lambda would re-run it once PER SHINGLE (O(len²) regex work; this
    took txt_winnow from ~3 s to 60 s at sf0.1 before the binding).
    """

    def sh(t):
        return F.when(F.length(t) < n, F.array(t)).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (n - 1)),
                lambda i: t.substr(i, F.lit(n)),
            )
        )

    return F.transform(F.array(normalize_text(col)), sh)[0]


# PII patterns for training-corpus redaction. Deliberately restricted
# to regex features with IDENTICAL semantics in Java regex (Spark) and
# RE2 (DuckDB/Go tooling): character classes, bounded quantifiers,
# alternation — no lookaround, no backreferences (RE2 has neither).
# Order matters: emails first (an address contains dots that the IP
# pattern could otherwise nibble), then IPs, then phone numbers.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    # international-ish: +CC then 2-3 separated digit groups; the last
    # group is optional so both "+1 555 0107" and "+44 20 7946 0958"
    # match. Only greedy quantifiers + one optional group — identical
    # backtracking behavior in Java regex and RE2.
    "phone": (r"\+\d{1,3}[ -]?\d{2,4}[ -]?\d{3,4}([ -]?\d{3,4})?", "<PHONE>"),
}


def pii_count(col, kind: str) -> Column:
    """Number of ``kind`` PII matches (email / ipv4 / phone) in the raw
    text — JVM ``regexp_count``, no Python."""
    pat, _ = PII_PATTERNS[kind]
    return F.regexp_count(_c(col), F.lit(pat))


def pii_redact(col, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """Replace each PII match with its typed placeholder token.

    Applied in ``PII_PATTERNS`` order so composite strings (an email
    whose domain resembles an IP) are consumed by the more specific
    pattern first — counts therefore never double-book a character.
    """
    c = _c(col)
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, repl)
    return c


def md5_hash32(col, offset: int = 1) -> Column:
    """8 hex chars of md5 (starting at 1-based ``offset``) as a
    non-negative 32-bit int — the cross-engine (Spark ⇄ DuckDB)
    deterministic hash primitive. Independent 32-bit values come from
    different offsets of the SAME digest (one md5 evaluation feeds up to
    four hashes)."""
    return F.conv(F.substring(F.md5(_c(col)), offset, 8), 16, 10).cast("long")


def hashed_bow_embedding(df, dim: int = 64, text_col: str = "text",
                         id_col: str = "doc_id", l2_normalize: bool = False):
    """(id, embedding): hashing-trick bag-of-words featurizer — each
    document becomes a dense ``dim``-vector of token counts bucketed by
    ``md5(term) % dim``. The deterministic text→vector bridge into the
    engine's ANN / SemDeDup / k-means operators when no learned
    embeddings exist (the classic feature-hashing construction;
    cross-engine exact because counts are integers and the hash is md5).

    Scale shape: tokenize/explode is map-side; the (id, bucket) count
    collapses with map-side partials; the dense array is assembled from
    a per-id map lookup over a literal ``sequence`` — one shuffle total
    on the uniform id key. Token-less documents get the zero vector.
    ``l2_normalize=True`` divides by the L2 norm (computed once via the
    let-bound singleton-transform trick), leaving zero vectors zero.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    counts = (
        toks.withColumn("b", (md5_hash32(F.col("term")) % dim).cast("int"))
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dense = counts.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "cnt"))).alias("__m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.coalesce(F.try_element_at(F.col("__m"), d), F.lit(0)).cast("double"),
    )
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(dense, "id", "left")
        .select(
            "id",
            F.coalesce(
                arr, F.array(*[F.lit(0.0) for _ in range(dim)])
            ).alias("embedding"),
        )
    )
    if l2_normalize:
        # let-bind (vector, norm) into one struct so the norm is
        # evaluated once per ROW, not once per element (HOFs are
        # CodegenFallback — no CSE; projection collapse would otherwise
        # inline the norm fold into the division lambda)
        n = F.sqrt(
            F.aggregate(
                F.transform(F.col("embedding"), lambda x: x * x),
                F.lit(0.0),
                lambda a, t: a + t,
            )
        )
        packed = F.struct(F.col("embedding").alias("v"), n.alias("n"))
        out = out.select(
            "id",
            F.transform(
                F.array(packed),
                lambda s: F.when(
                    s["n"] > 0, F.transform(s["v"], lambda x: x / s["n"])
                ).otherwise(s["v"]),
            )[0].alias("embedding"),
        )
    return out
