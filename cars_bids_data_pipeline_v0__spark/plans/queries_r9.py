"""Round-9 batch (q266+): iterated BPE vocabulary training — the last
stubbed-at-one-step LLM-data operator (VERDICT r8 directive 5).

* **q266 BPE vocabulary training, K=6 merges**: q225 proved ONE
  count→argmax→merge→recount cycle; this runs the full training loop to
  a 6-entry merge table plus the encoded-corpus token-count curve.  The
  corpus is scanned once (persisted word table); each merge step's
  argmax is ONE bounded-aggregate driver row (see ``_train_bpe`` for
  the measured in-plan-vs-driver trade).  The DuckDB twin unrolls the
  same K stages as chained CTEs, so the whole trained vocabulary sits
  under the driver's value hash.

Reference parity: none — the reference has no tokenizer surface; this
extends the LLM-pipeline text family (SURVEY §2 addenda).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# q266 — iterated BPE vocabulary training (Sennrich et al. 2016)
# ---------------------------------------------------------------------------

# Merge s rewrites the argmax pair to the one-char sentinel chr(s), so
# the 2-char-window pair generation keeps working across iterations and
# later pairs may CONTAIN earlier merges (that is what makes it BPE —
# the vocab grows by composition).  Sentinels render as [s] on output.
_Q266_MERGES = 6


def _q266_render_sql(expr: str) -> str:
    for s in range(1, _Q266_MERGES + 1):
        expr = f"replace({expr}, chr({s}), '[{s}]')"
    return expr


def _q266_oracle() -> str:
    """The K-stage loop unrolled as chained CTEs — each stage is pair
    counts over the previous word table, a 1-row argmax, and the merge
    applied via literal replace (DuckDB's replace is the same
    non-overlapping left-to-right rule as Spark's)."""
    parts = [
        """
    WITH words0 AS (
        SELECT w AS word, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY w
    )"""
    ]
    for s in range(1, _Q266_MERGES + 1):
        parts.append(
            f""", p{s} AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS freq FROM (
            SELECT unnest(list_transform(
                       generate_series(1, len(word) - 1),
                       i -> substr(word, i, 2))) AS pair,
                   freq
            FROM words{s - 1} WHERE len(word) >= 2
        ) GROUP BY pair
    ), t{s} AS (
        SELECT pair, freq FROM p{s} ORDER BY freq DESC, pair LIMIT 1
    ), words{s} AS (
        SELECT replace(word, (SELECT pair FROM t{s}), chr({s})) AS word,
               freq
        FROM words{s - 1}
    )"""
        )
    steps = "\n        UNION ALL\n".join(
        f"""        SELECT {s} AS step,
               (SELECT pair FROM t{s}) AS raw_pair,
               (SELECT freq FROM t{s}) AS pair_freq,
               (SELECT CAST(sum(len(word) * freq) AS BIGINT)
                FROM words{s}) AS tokens_after"""
        for s in range(1, _Q266_MERGES + 1)
    )
    parts.append(
        f""", steps AS (
{steps}
    )
    SELECT CAST(step AS INT) AS step,
           {_q266_render_sql('raw_pair')} AS merged_pair,
           CAST(pair_freq AS BIGINT) AS pair_freq,
           tokens_after
    FROM steps ORDER BY step"""
    )
    return "".join(parts)



def _bpe_corpus_words(spark, sf_dir):
    """The persisted global word-frequency table BPE trains on — the
    single corpus-sized scan every BPE query shares."""
    from ..cache import track_persist

    d = _t(spark, sf_dir, "documents")
    return track_persist(
        d.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        # the vocab table is tiny next to the corpus (tens of kB per
        # million corpus tokens); 4 partitions keep the K-step loop's
        # ~25 micro-shuffles from paying 32-task scheduler overhead each
        .repartition(4)
    )


def _bpe_pair_counts(w):
    return (
        w.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("freq"))
    )


def _train_bpe(
    words, k: int, batch: int = 1
) -> list[tuple[int, str, int]]:
    """K BPE merges over a word-frequency table -> [(step, raw_pair,
    pair_freq)].  The loop is inherently sequential (merge s+1's counts
    depend on merge s), so each step's argmax comes back to the driver
    as ONE bounded-aggregate row (the allowed .collect() class —
    centroid-fetch precedent) and the merge applies as a LITERAL
    replace: a narrow projection, no broadcast-join chain.  Keeping the
    argmax in-plan instead (1-row crossJoin per step) nested K broadcast
    stages and re-evaluated the merge lineage per consumer — measured
    18–41 s at sf0.01 vs ~5 s this way.  Distributed work per step: one
    vocab-sized pair-count shuffle; the corpus is scanned exactly once
    (the persisted word table).

    ``batch > 1`` is the scale path for real vocabularies (K≈10³): the
    round-10 K-curve measured ~0.3–0.45 s/merge at sf1 — ALL
    job-scheduling floor (the sf1 word table is 30 rows) — so a
    K=1000 train is ~6 min of round trips at batch=1.  Per iteration
    the top ``batch`` pairs come back in one bounded collect and a
    GREEDY SYMBOL-DISJOINT prefix is applied in rank order (the
    standard distributed-BPE trick): a kept pair shares no symbol with
    any earlier-kept pair, so the literal replaces commute and none
    changes another kept pair's count.  Equal to sequential training
    whenever the next argmaxes are symbol-disjoint and strictly
    out-count every pair a kept merge creates (tests construct exactly
    that; created pairs are bounded by their creator's count, so
    rank-adjacent disjoint pairs with distinct counts always qualify).
    The oracled q266 stays batch=1 — bit-exact sequential semantics."""
    merges: list[tuple[int, str, int]] = []
    w_cur = words
    s = 1
    while s <= k:
        if batch <= 1:
            # argmax via min(struct(-freq, pair)): partial-combines
            # map-side (a row_number window would single-partition the
            # pair table)
            row = (
                _bpe_pair_counts(w_cur)
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("freq")).alias("nf"), F.col("pair")
                        )
                    ).alias("m")
                )
                .select(
                    F.col("m.pair").alias("p"),
                    (-F.col("m.nf")).cast("long").alias("f"),
                )
                .first()
            )
            if row["p"] is None:
                # vocabulary exhausted: every word is a single symbol,
                # the pair table is empty and min() returns NULL — a
                # real tokenizer trainer stops here (hit at K>~2|vocab|
                # on small corpora; round-10 K-curve)
                break
            kept = [(row["p"], int(row["f"]))]
        else:
            top = (
                _bpe_pair_counts(w_cur)
                .orderBy(F.col("freq").desc(), F.col("pair"))
                .limit(batch)
                .collect()
            )
            if not top:
                break
            kept = []
            used: set[str] = set()
            for r in top:
                if s + len(kept) > k:
                    break
                syms = set(r["pair"])
                if kept and (syms & used):
                    continue
                kept.append((r["pair"], int(r["freq"])))
                used |= syms
        repl = F.col("word")
        for p, f in kept:
            merges.append((s, p, f))
            repl = F.replace(repl, F.lit(p), F.lit(chr(s)))
            s += 1
        w_cur = w_cur.select(repl.alias("word"), "freq")
    return merges


@register(
    "q266_bpe_vocab_training",
    _q266_oracle(),
    doc=(
        "full BPE tokenizer training to a 6-merge vocabulary: the "
        "word-frequency table is built from ONE corpus scan and "
        "persisted; each merge is then an O(|vocab|) pair count "
        "(map-side-combining sum over an alphabet²+K-bounded pair "
        "space) whose argmax comes back to the driver as ONE "
        "bounded-aggregate row per step (min(struct(-freq, pair)) — "
        "the centroid-fetch .collect() class) and applies as a literal "
        "replace, a narrow projection.  Keeping the argmax in-plan "
        "instead nested K broadcast stages and re-evaluated the merge "
        "lineage per consumer — measured 18-41 s vs ~5 s this way "
        "(see _train_bpe).  Output is "
        "the merge table itself plus the encoded-corpus token count "
        "after every merge (the compression curve a tokenizer trainer "
        "reports).  At 100 TB the corpus-sized work is exactly the "
        "initial word count; the K-step loop never rescans the corpus "
        "— the Sennrich word-table trick made distributed "
        "(extends q225's single proven step)"
    ),
)
def q266(spark, sf_dir):
    words = _bpe_corpus_words(spark, sf_dir)
    merges = _train_bpe(words, _Q266_MERGES)

    # merge table (6 rows, sentinels rendered) + the token-count curve:
    # each step's count re-derives its word table from the persisted
    # base through s narrow literal replaces — one final job, no shuffle
    def render_py(pair: str) -> str:
        for s in range(1, _Q266_MERGES + 1):
            pair = pair.replace(chr(s), f"[{s}]")
        return pair

    vocab = spark.createDataFrame(
        [(s, render_py(p), f) for s, p, f in merges],
        "step int, merged_pair string, pair_freq long",
    )
    w_cur = words
    tok_rows = []
    for s, p, _f in merges:
        w_cur = w_cur.select(
            F.replace(F.col("word"), F.lit(p), F.lit(chr(s))).alias("word"),
            "freq",
        )
        tok_rows.append(
            w_cur.agg(
                F.sum(F.length("word") * F.col("freq"))
                .cast("long")
                .alias("tokens_after")
            ).select(F.lit(s).cast("int").alias("step"), "tokens_after")
        )
    toks = tok_rows[0]
    for r in tok_rows[1:]:
        toks = toks.unionByName(r)
    return vocab.join(F.broadcast(toks), "step").orderBy("step")


# ---------------------------------------------------------------------------
# q267 — DSIR importance weights (Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------

# Data Selection via Importance Resampling: score every document by
# log(p_target(doc)/p_raw(doc)) under hashed-ngram bag models — the
# standard cheap way to select pretraining data "like" a target corpus
# without training a classifier.  Features are word unigrams+bigrams
# hashed into B buckets (portable md5 hashing, q90-q93 discipline, so
# DuckDB reproduces the exact bucket ids); both distributions are
# Laplace-smoothed bucket frequencies; the target slice is the
# English-labelled documents.
_Q267_B = 512
_Q267_TOPK = 20


def _q267_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> regexp_matches(x, '^[a-z]+$')) AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, lang, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, lang,
               unnest(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1])) AS g
        FROM toks WHERE len(t) >= 2
    ), hashed AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5('dsir:' || g), 1, 15)) AS BIGINT)
                   % {_Q267_B} AS b
        FROM grams
    ), raw_counts AS (
        SELECT b, count(*) AS c_r FROM hashed GROUP BY b
    ), tgt_counts AS (
        SELECT b, count(*) AS c_t FROM hashed WHERE lang = 'en' GROUP BY b
    ), totals AS (
        SELECT CAST(count(*) AS DOUBLE) AS r_total,
               CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
                   AS t_total
        FROM hashed
    ), bucket_w AS (
        SELECT r.b,
               ln((coalesce(t.c_t, 0) + 1.0) / (tt.t_total + {_Q267_B}))
             - ln((r.c_r + 1.0) / (tt.r_total + {_Q267_B})) AS w
        FROM raw_counts r
        LEFT JOIN tgt_counts t USING (b)
        CROSS JOIN totals tt
    )
    SELECT doc_id, lang,
           round(sum(w), 4) AS dsir_weight
    FROM hashed JOIN bucket_w USING (b)
    GROUP BY doc_id, lang
    ORDER BY round(sum(w), 4) DESC, doc_id
    LIMIT {_Q267_TOPK}
    """


def _q267_doc_weights(spark, sf_dir):
    """``(doc_id, lang, w)`` — the unrounded per-doc DSIR log-ratio
    weight frame q267 ranks and q269 resamples from.  Delegates to the
    reusable operator (`operators/dsir.py` — explode-fusion persist
    barrier, one 512-bounded aggregate, broadcast weight table; also
    the release capstone's selection stage), carrying ``lang`` through
    the per-doc aggregate; target slice = English-labelled docs."""
    from ..operators.dsir import dsir_weights

    d = _t(spark, sf_dir, "documents")
    return dsir_weights(
        d,
        F.col("lang") == "en",
        n_buckets=_Q267_B,
        weight_col="w",
        carry_cols=["lang"],
    )


@register(
    "q267_dsir_importance_weights",
    _q267_oracle(),
    doc=(
        "DSIR data selection (Xie et al. 2023): per-doc importance "
        "weight log p_target/p_raw under Laplace-smoothed hashed-ngram "
        "(uni+bi, 512 buckets) bag models, target = English-labelled "
        "docs; top-20 under a (rounded weight, doc_id) total order.  "
        "Plan: one gram explode, two bucket-count aggregates "
        "(512-bounded, map-side combining), the <=512-row weight table "
        "broadcast back onto the gram stream, one per-doc sum — at "
        "100 TB the corpus is scanned once and nothing shuffled exceeds "
        "the bucket space except the final per-doc aggregate, keyed by "
        "doc_id.  Portable md5 bucket hashing keeps the oracle "
        "bit-exact (q90-q93 discipline)"
    ),
)
def q267(spark, sf_dir):
    return (
        _q267_doc_weights(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.round(F.col("w"), 4).alias("dsir_weight"),
        )
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id"))
        .limit(_Q267_TOPK)
    )



# ---------------------------------------------------------------------------
# q268 — tokenizer fertility by language under the trained BPE vocab
# ---------------------------------------------------------------------------

# The metric a curator actually reads off a trained tokenizer: how many
# symbols each language's text costs under the shared vocabulary
# (UniMax/NLLB-style mixture decisions key on exactly this).  Train the
# q266 vocabulary on the GLOBAL word table, then encode each language's
# word stream with the merge chain and count symbols — all-integer
# output, so the oracle comparison is exact by construction.


def _q268_oracle() -> str:
    parts = [
        """
    WITH words0 AS (
        SELECT w AS word, count(*) AS freq FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY w
    )"""
    ]
    for s in range(1, _Q266_MERGES + 1):
        parts.append(
            f""", p{s} AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS freq FROM (
            SELECT unnest(list_transform(
                       generate_series(1, len(word) - 1),
                       i -> substr(word, i, 2))) AS pair,
                   freq
            FROM words{s - 1} WHERE len(word) >= 2
        ) GROUP BY pair
    ), t{s} AS (
        SELECT pair FROM p{s} ORDER BY freq DESC, pair LIMIT 1
    ), words{s} AS (
        SELECT replace(word, (SELECT pair FROM t{s}), chr({s})) AS word,
               freq
        FROM words{s - 1}
    )"""
        )
    enc = "word"
    for s in range(1, _Q266_MERGES + 1):
        enc = f"replace({enc}, (SELECT pair FROM t{s}), chr({s}))"
    parts.append(
        f""", lang_words AS (
        SELECT lang, w AS word, count(*) AS freq FROM (
            SELECT lang,
                   unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
            FROM documents
        ) WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        GROUP BY lang, w
    )
    SELECT lang,
           CAST(sum(freq) AS BIGINT) AS n_words,
           CAST(sum(len(word) * freq) AS BIGINT) AS n_chars,
           CAST(sum(len({enc}) * freq) AS BIGINT) AS n_symbols
    FROM lang_words
    GROUP BY lang
    ORDER BY lang"""
    )
    return "".join(parts)


@register(
    "q268_bpe_fertility_by_lang",
    _q268_oracle(),
    doc=(
        "tokenizer fertility audit: the q266-trained 6-merge vocabulary "
        "(global word table, one corpus scan) applied to each "
        "language's word stream — words, characters, and encoded "
        "symbols per language, the all-integer compression readout "
        "mixture policies (UniMax-style) key on.  The encode is the "
        "merge chain as 6 chained literal replaces over the per-"
        "(lang, word) frequency table: narrow projections over a "
        "vocab×langs-sized frame, never a corpus rescan"
    ),
)
def q268(spark, sf_dir):
    words = _bpe_corpus_words(spark, sf_dir)
    merges = _train_bpe(words, _Q266_MERGES)
    d = _t(spark, sf_dir, "documents")
    lang_words = (
        d.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias(
                "word"
            ),
        )
        .filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= 2))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("freq"))
    )
    enc = F.col("word")
    for s, p, _f in merges:
        enc = F.replace(enc, F.lit(p), F.lit(chr(s)))
    return (
        lang_words.groupBy("lang")
        .agg(
            F.sum("freq").cast("long").alias("n_words"),
            F.sum(F.length("word") * F.col("freq"))
            .cast("long")
            .alias("n_chars"),
            F.sum(F.length(enc) * F.col("freq"))
            .cast("long")
            .alias("n_symbols"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q269 — DSIR importance RESAMPLING (the selection half of Xie 2023)
# ---------------------------------------------------------------------------

# Scoring (q267) is half of DSIR; the paper's second half SAMPLES
# without replacement with probability ∝ exp(weight).  The Gumbel-max
# trick makes that a deterministic top-k: key_i = w_i + Gumbel(u_i)
# with u_i a pseudo-uniform derived from the doc id's portable hash —
# RNG-free, engine-reproducible (the q19/q137 discipline), and
# embarrassingly parallel (one narrow map + a top-k).
_Q269_K = 15
_Q269_HASH_SPACE = float(1 << 60)


def _q269_oracle() -> str:
    base = _q267_oracle()
    # reuse q267's scoring CTE chain up to the per-doc weight, then race
    head = base[: base.rindex("SELECT doc_id, lang,")]
    return (
        head
        + f""", doc_w AS (
        SELECT doc_id, lang, sum(w) AS w
        FROM hashed JOIN bucket_w USING (b)
        GROUP BY doc_id, lang
    ), raced AS (
        SELECT doc_id, lang,
               round(w - ln(-ln(
                   (CAST(('0x' || substr(md5('gum:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                   / ({_Q269_HASH_SPACE} + 2.0)
               )), 4) AS race_key
        FROM doc_w
    )
    SELECT doc_id, lang, race_key
    FROM raced
    ORDER BY race_key DESC, doc_id
    LIMIT {_Q269_K}
    """
    )


@register(
    "q269_dsir_importance_resampling",
    _q269_oracle(),
    doc=(
        "DSIR's selection half (Xie 2023): sample-without-replacement "
        "with probability proportional to exp(importance weight) via "
        "the Gumbel-max trick — race_key = weight + Gumbel(u), u a "
        "pseudo-uniform from the doc id's portable md5 hash (RNG-free, "
        "engine-reproducible, the q19/q137 assignment discipline), "
        "top-15 under a (rounded key, doc_id) total order.  Plan adds "
        "one narrow map and a TakeOrdered to q267's scoring shape — "
        "at 100 TB the selection costs nothing beyond the scoring scan"
    ),
)
def q269(spark, sf_dir):
    from ..operators.dsir import dsir_race_key

    doc_w = _q267_doc_weights(spark, sf_dir)
    return (
        doc_w.select(
            "doc_id",
            "lang",
            F.round(
                dsir_race_key(F.col("w"), F.col("doc_id")), 4
            ).alias("race_key"),
        )
        .orderBy(F.col("race_key").desc(), F.col("doc_id"))
        .limit(_Q269_K)
    )
