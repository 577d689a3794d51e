"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north_star): language-ID,
quality scoring, token counting, and document fingerprinting over a
``documents(doc_id, text, …)`` table.  Everything is native Column
expressions — at 100 TB these run inside WholeStageCodegen with zero Python
in the loop; the only shuffles are whatever aggregation the caller adds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / counting
# ---------------------------------------------------------------------------


def tokenize(c: Column | str) -> Column:
    """Whitespace tokenization of trimmed text: ``\\s+`` split.
    Empty text → single empty token (Python/Java split parity)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(col), r"\s+")


def token_count(c: Column | str) -> Column:
    return F.size(tokenize(c))


def bpe_ish_token_count(c: Column | str) -> Column:
    """A BPE-flavored proxy count: word pieces of ≤4 chars — splits on
    whitespace/punctuation, then ceil(len/4) pieces per word.  Deterministic
    and cheap; a stand-in for real tokenizer cost models."""
    col = F.col(c) if isinstance(c, str) else c
    words = F.split(F.trim(F.lower(col)), r"[^a-z0-9]+")
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


# ---------------------------------------------------------------------------
# language identification (stopword-hit heuristic)
# ---------------------------------------------------------------------------

# tiny function-word lists per language; ties broken by list order
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "es": ["el", "la", "de", "y", "es", "que", "un"],
    "fr": ["le", "la", "de", "et", "est", "que", "un"],
    "de": ["der", "die", "das", "und", "ist", "zu", "ein"],
    "zh": ["的", "是", "了", "在", "和"],
}


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_scores(c: Column | str) -> dict[str, Column]:
    toks = F.transform(tokenize(c), lambda t: F.lower(t))
    return {lang: _marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id(c: Column | str, default: str = "und") -> Column:
    """n-gram/stopword language guess: argmax of marker hits; all-zero →
    ``default``.  Deterministic tie-break by LANG_MARKERS order."""
    scores = lang_scores(c)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_features(c: Column | str) -> dict[str, Column]:
    """Length/punctuation/stopword-ratio features used by web-scale corpus
    filters.  All doubles in [0, 1]-ish ranges, null-safe."""
    col = F.col(c) if isinstance(c, str) else c
    toks = tokenize(col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(col, r"[^\.,;:!\?'\"]", "")).cast("double")
    stop_arr = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_hits = F.size(
        F.filter(F.transform(toks, lambda t: F.lower(t)),
                 lambda t: F.array_contains(stop_arr, t))
    ).cast("double")
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return {
        "n_tokens": n_tok,
        "mean_token_len": safe(n_chars - (n_tok - 1), n_tok),
        "alpha_ratio": safe(alpha, n_chars),
        "punct_ratio": safe(punct, n_chars),
        "stopword_ratio": safe(stop_hits, n_tok),
    }


def quality_score(c: Column | str) -> Column:
    """Composite [0,1] quality score: rewards alphabetic, stopword-bearing,
    mid-length documents; penalizes punctuation soup.  Fixed weights so the
    score is reproducible across engines."""
    f = quality_features(c)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    return F.round(
        0.3 * f["alpha_ratio"]
        + 0.3 * F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
        + 0.3 * length_term
        + 0.1 * (1.0 - F.least(f["punct_ratio"] * 10.0, F.lit(1.0))),
        6,
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def normalize_text(c: Column | str) -> Column:
    """lowercase + collapse all whitespace runs to single spaces + trim."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_md5(c: Column | str) -> Column:
    """Cross-engine content fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(c))


def fingerprint_xxh64(c: Column | str) -> Column:
    """64-bit engine-native fingerprint (xxhash64) — the scale path: 8-byte
    keys shuffle ~4× cheaper than md5 hex strings.  No SQL oracle (hash
    function is Spark-specific)."""
    return F.xxhash64(normalize_text(c))


def rolling_fingerprint(c: Column | str, window: int = 8) -> Column:
    """Winnowing-style robust fingerprint: min xxhash64 over character
    ``window``-grams of the normalized text — stable under small edits at
    either end of the document."""
    norm = normalize_text(c)
    n = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1))),
        lambda i: F.substring(norm, i, window),
    )
    return F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction)
# ---------------------------------------------------------------------------

# Deliberately conservative patterns: a corpus scrubber must prefer false
# positives (over-redaction) to leaking identifiers into training data.
PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld (no lookarounds: portable across regex engines)
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 13-16 digit card numbers with optional space/dash groups
    "CARD": r"\b(?:\d[ -]?){13,16}\b",
    # international-ish phone numbers: +1 555-123-4567 / (555) 123 4567
    "PHONE": r"(?:\+?\d{1,3}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b",
    # IPv4
    "IP": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# CARD before PHONE: a 13+-digit run must become [CARD], not a partial
# phone match; EMAIL first so usernames with digits survive as one token.
PII_ORDER = ("EMAIL", "CARD", "PHONE", "IP")


def redact_pii(c: Column | str, kinds: tuple[str, ...] = PII_ORDER) -> Column:
    """Replace each PII match with its ``[KIND]`` placeholder.

    Pure ``regexp_replace`` chain — JVM-side, whole-stage codegen, no UDF;
    at corpus scale this is scan-bound, exactly as cheap as reading the
    text column."""
    col = F.col(c) if isinstance(c, str) else c
    for kind in kinds:
        col = F.regexp_replace(col, PII_PATTERNS[kind], f"[{kind}]")
    return col


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Per-kind match counts (audit / before-after accounting)."""
    col = F.col(c) if isinstance(c, str) else c
    out: dict[str, Column] = {}
    masked = col
    for kind in PII_ORDER:
        # count on the progressively-masked text so kinds don't double
        # count each other's spans (mirrors redact_pii's order)
        out[kind] = F.size(
            F.regexp_extract_all(masked, F.lit(PII_PATTERNS[kind]), F.lit(0))
        )
        masked = F.regexp_replace(masked, PII_PATTERNS[kind], f"[{kind}]")
    return out


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms — the retrieval primitive behind quality-targeted corpus
    curation (find documents about X to up/down-sample).

    ``score(d) = Σ_t idf(t) · tf/(tf + k1·(1-b+b·dl/avgdl))`` with the
    Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))``.  One explode →
    grouped-count pass restricted to the query terms (the per-term
    postings, shuffled at |matching terms| not corpus size), document
    lengths as a sibling aggregate, corpus stats (N, avgdl) as a 1-row
    broadcast.  Output: ``(id_col, bm25)`` for docs matching ≥1 term.
    """
    from pyspark.sql import functions as F

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    base = docs.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, "__toks", F.size("__toks").alias("__dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    terms = (
        base.select(id_col, "__dl", F.explode("__toks").alias("__term"))
        .filter(F.col("__term").isin([t.lower() for t in query_terms]))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    df_t = terms.groupBy("__term").agg(
        F.count(F.lit(1)).alias("__df")
    )
    scored = (
        terms.join(F.broadcast(df_t), "__term")
        .join(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__contrib",
            F.col("__idf")
            * F.col("__tf")
            / (
                F.col("__tf")
                + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("__contrib"), 6).alias("bm25")
    )


# ---------------------------------------------------------------------------
# blocklist screening (toxicity/NSFW-style word-list filter)
# ---------------------------------------------------------------------------


def blocklist_stats(
    c: Column | str, blocklist: list[str]
) -> tuple[Column, Column]:
    """``(n_blocked_tokens, blocked_fraction)`` of the lower-cased
    whitespace tokens that appear in ``blocklist``.

    The word-list screen is the standard first-pass toxicity/NSFW gate of
    web-corpus pipelines (C4 dropped pages on the 'bad words' list the
    same way): cheap, deterministic, explainable — ML classifiers come
    later in the funnel and cost 1000× more per doc.  Pure Column
    expressions: the list rides as an array literal, membership is a
    codegen'd array_contains, nothing leaves the JVM."""
    toks = F.transform(tokenize(c), lambda t: F.lower(t))
    arr = F.array(*[F.lit(w) for w in blocklist])
    n_blocked = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    frac = F.round(n_blocked / F.greatest(F.size(toks), F.lit(1)), 6)
    return n_blocked.cast("long"), frac
