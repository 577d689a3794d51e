"""Round-10 batch (q270+): the release capstone's selection math under
the driver's value hash.

* **q270 DSIR budget selection**: q267 scores, q269 races — this runs
  the paper's actual SELECTION: keep the Gumbel-max race's leading
  documents until a token budget fills (`operators/dsir.dsir_resample`,
  the stage `plans/release.py` wires into the capstone).  The engine
  computes the cumulative cutoff with the two-phase distributed prefix
  sum (no single-partition window); the DuckDB twin uses a plain
  cumulative window — same math, different physics, which is exactly
  what the hash gate is for.  Race keys are rounded to 4 decimals
  BEFORE ordering (doc id breaks ties): the weight is a float sum whose
  last ulp is aggregation-order-dependent, so only the rounded race is
  cross-engine total-ordered.

* **q271 quantile-normalized release gate**: `quantile_release_gate`
  (q191's Q-Q table applied — the capstone's fairness gate) as an
  oracled query: drop each source's bottom length-decile, emit the
  Q-Q-normalized score.  Interpolated percentiles (Spark `percentile`
  == DuckDB `quantile_cont`, both the standard (n-1)·p linear rule
  over the same doubles).

Reference parity: none — extensions of the LLM-pipeline family
(SURVEY §2 addenda); these put the release capstone's two non-dedup
stages under cumulative driver-hash evidence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, register
from .queries_r9 import _Q267_B, _q267_oracle

_Q270_BUDGET = 2_000  # whitespace tokens
_Q270_HASH_SPACE = float(1 << 60)


def _q270_oracle() -> str:
    base = _q267_oracle()
    head = base[: base.rindex("SELECT doc_id, lang,")]
    return (
        head
        + f""", doc_w AS (
        SELECT doc_id, lang, sum(w) AS w
        FROM hashed JOIN bucket_w USING (b)
        GROUP BY doc_id, lang
    ), raced AS (
        SELECT dw.doc_id, dw.lang,
               round(dw.w - ln(-ln(
                   (CAST(('0x' || substr(md5('gum:' || CAST(dw.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                   / ({_Q270_HASH_SPACE} + 2.0)
               )), 4) AS race_key,
               CAST(len(regexp_split_to_array(trim(d.text), '\\s+'))
                    AS BIGINT) AS n_toks
        FROM doc_w dw JOIN documents d ON d.doc_id = dw.doc_id
    ), cum AS (
        SELECT doc_id, lang, race_key, n_toks,
               sum(n_toks) OVER (
                   ORDER BY race_key DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_toks
        FROM raced
    )
    SELECT doc_id, lang, race_key, n_toks
    FROM cum WHERE cum_toks <= {_Q270_BUDGET}
    ORDER BY race_key DESC, doc_id
    """
    )


@register(
    "q270_dsir_budget_selection",
    _q270_oracle(),
    doc=(
        "DSIR selection to a token budget (Xie 2023's end-to-end, the "
        "release capstone's selection stage): score every doc vs the "
        "English target slice (q267's hashed-ngram models), race by "
        "Gumbel-max (q269), and keep the race's leaders while the "
        "cumulative whitespace-token count stays within the budget.  "
        "The cumulative cutoff runs as the two-phase distributed "
        "prefix sum (rankstats.prefix_sums_by_value — one range "
        "exchange, never a single-partition window), so the selection "
        "scales like a sort, not like a reduce-to-one; RNG-free race "
        "keys make the selection deterministic across engines and "
        "cluster layouts"
    ),
)
def q270(spark, sf_dir):
    from ..operators.dsir import dsir_resample
    from ..operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    sel = dsir_resample(
        d,
        F.col("lang") == "en",
        _Q270_BUDGET,
        n_buckets=_Q267_B,
        key_decimals=4,
    )
    return sel.select(
        "doc_id",
        "lang",
        "race_key",
        token_count("text").cast("long").alias("n_toks"),
    ).orderBy(F.col("race_key").desc(), "doc_id")


_Q271_PS = [i / 10.0 for i in range(1, 10)]


@register(
    "q271_quantile_release_gate",
    f"""
    WITH d AS (
        SELECT doc_id, source, CAST(len(text) AS INT) AS n_chars
        FROM documents
    ), per AS (
        SELECT source,
               quantile_cont(n_chars, {_Q271_PS}) AS src_cuts
        FROM d GROUP BY source
    ), gl AS (
        SELECT quantile_cont(n_chars, {_Q271_PS}) AS gcuts FROM d
    ), bucketed AS (
        SELECT d.doc_id, d.source, d.n_chars,
               len(list_filter(per.src_cuts, c -> d.n_chars >= c))
                   AS bucket
        FROM d JOIN per USING (source)
    )
    SELECT doc_id, source, n_chars,
           round(gl.gcuts[least(bucket, 9)], 4) AS score_norm
    FROM bucketed CROSS JOIN gl
    WHERE bucket >= 1
    ORDER BY doc_id
    """,
    doc=(
        "the release capstone's Q-Q fairness gate as an oracled query "
        "(plans/release.quantile_release_gate): per-source length "
        "deciles and global deciles from two partial-merging "
        "aggregates broadcast back (|sources|x9 and 9 values — never "
        "a per-row window), drop each source's bottom decile (a fixed "
        "absolute cutoff would gut short-document sources), and emit "
        "score_norm = the GLOBAL cut at the row's within-source "
        "decile — the Q-Q-normalized score downstream samplers mix on "
        "without per-source bias"
    ),
)
def q271(spark, sf_dir):
    from .release import quantile_release_gate

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").cast("int").alias("n_chars"),
    )
    kept = quantile_release_gate(d, "n_chars", "source")
    return kept.select(
        "doc_id",
        "source",
        "n_chars",
        F.round("score_norm", 4).alias("score_norm"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q272 — UniMax mixture allocation (Chung et al. 2023, arXiv:2304.09151)
# ---------------------------------------------------------------------------

# The multilingual mixture policy the BPE fertility readout (q268) feeds:
# give every language an equal share of the token budget, EXCEPT a
# language may repeat at most EPOCH_CAP epochs of its available data —
# capped languages release their unused share to the rest
# (waterfilling, languages processed ascending by availability so every
# cap decision is final).  Budget 45k vs the sf0.01 corpus's ~27k
# available tokens makes the cap bind for the four small languages
# while `en` takes the released remainder — a non-degenerate fill.
_Q272_BUDGET = 45_000
_Q272_CAP = 2.0  # max epochs over a language's available tokens


@register(
    "q272_unimax_mixture_allocation",
    f"""
    WITH RECURSIVE avail AS (
        SELECT lang,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                    AS BIGINT) AS available_tokens
        FROM documents GROUP BY lang
    ), ordered AS (
        SELECT lang, available_tokens,
               row_number() OVER (ORDER BY available_tokens, lang) AS rk,
               count(*) OVER () AS n_langs
        FROM avail
    ), fill AS (
        SELECT 0 AS rk, CAST({_Q272_BUDGET} AS DOUBLE) AS remaining,
               CAST(NULL AS VARCHAR) AS lang,
               CAST(NULL AS BIGINT) AS available_tokens,
               CAST(NULL AS DOUBLE) AS alloc
        UNION ALL
        SELECT o.rk,
               f.remaining - least(o.available_tokens * {_Q272_CAP},
                                   f.remaining / (o.n_langs - f.rk)),
               o.lang, o.available_tokens,
               least(o.available_tokens * {_Q272_CAP},
                     f.remaining / (o.n_langs - f.rk))
        FROM fill f JOIN ordered o ON o.rk = f.rk + 1
    )
    SELECT lang, available_tokens,
           CAST(floor(alloc + 0.5) AS BIGINT) AS alloc_tokens,
           floor(alloc / available_tokens * 1000000 + 0.5) / 1000000
               AS epochs
    FROM fill WHERE lang IS NOT NULL ORDER BY lang
    """,
    doc=(
        "UniMax mixture allocation (Chung 2023): equal token-budget "
        "shares per language with an epoch cap — capped languages "
        "release their unused share, waterfilled ascending by "
        "availability so each cap decision is final.  The distributed "
        "work is the per-language token aggregate (one "
        "partial-merging corpus scan); the fill itself is O(|langs|) "
        "driver arithmetic over that bounded config table (the "
        "q170/centroid-fetch .collect() class — |langs| rows, never "
        "corpus data), matching the recursive-CTE oracle step for "
        "step in IEEE-754.  Rounding is explicit half-up both sides "
        "(Python round() is banker's — floor(x+0.5) avoids the .5 "
        "tie divergence)"
    ),
)
def q272(spark, sf_dir):
    import math

    from ..operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(
        F.sum(token_count("text")).cast("long").alias("available_tokens")
    )
    rows = sorted(
        avail.collect(), key=lambda r: (r["available_tokens"], r["lang"])
    )
    remaining = float(_Q272_BUDGET)
    out = []
    for i, r in enumerate(rows):
        k = len(rows) - i
        alloc = min(r["available_tokens"] * _Q272_CAP, remaining / k)
        remaining -= alloc
        out.append(
            (
                r["lang"],
                r["available_tokens"],
                int(math.floor(alloc + 0.5)),
                math.floor(alloc / r["available_tokens"] * 1_000_000 + 0.5)
                / 1_000_000,
            )
        )
    return spark.createDataFrame(
        out,
        "lang string, available_tokens long, alloc_tokens long, "
        "epochs double",
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# q273 — n-gram novelty rate (first-occurrence fraction per document)
# ---------------------------------------------------------------------------

# The RefinedWeb-style curation signal between exact-dup and Jaccard:
# what fraction of a document's distinct 3-grams has never appeared in
# any EARLIER document (doc_id order = arrival order).  Boilerplate-
# heavy or templated docs trend to 0 novelty as the corpus grows; the
# signal needs only one min-aggregate over the inverted index — no
# pair join at all, so it scales strictly better than any pairwise
# dedup while catching the same template rot.


@register(
    "q273_ngram_novelty",
    """
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS g
        FROM (
            SELECT doc_id,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM documents
        )
    ), firsts AS (
        SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
    )
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE f.first_doc = sh.doc_id)
                AS BIGINT) AS n_novel,
           round(count(*) FILTER (WHERE f.first_doc = sh.doc_id)
                 * 1.0 / count(*), 6) AS novelty
    FROM sh JOIN firsts f USING (g)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    doc=(
        "per-document 3-gram novelty (RefinedWeb-style): the fraction "
        "of a doc's distinct shingles first seen in THIS doc under "
        "arrival (doc_id) order — templated/boilerplate docs trend to "
        "zero as the corpus grows.  One inverted-index min-aggregate "
        "(map-side combining) plus a broadcast-back join keyed by the "
        "64-bit shingle hash — NO pairwise join anywhere, so the cost "
        "is index-sized at any corpus scale (strictly cheaper than "
        "q53's pair machinery, catching the same template rot); the "
        "shingle array is materialized behind the round-10 persist "
        "barrier before exploding"
    ),
)
def q273(spark, sf_dir):
    from ..cache import track_persist
    from ..operators.dedup_docs import word_shingles

    d = _t(spark, sf_dir, "documents")
    sh_arr = track_persist(
        d.select("doc_id", word_shingles("text", 3).alias("sh"))
    )
    inv = track_persist(
        sh_arr.select("doc_id", F.explode("sh").alias("__s")).select(
            "doc_id", F.xxhash64("__s").alias("g")
        )
    )
    firsts = inv.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        inv.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count(
                F.when(F.col("first_doc") == F.col("doc_id"), 1)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_grams"), 6).alias(
                "novelty"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q274 — context-window truncation audit
# ---------------------------------------------------------------------------

# The question asked before choosing a packing policy: at context
# length L, how much of each source survives naive truncate-at-L vs
# how much the chunker must carry?  L=64 sits inside this corpus's
# 10..110-token range so both regimes are populated.
_Q274_L = 64


@register(
    "q274_context_truncation_audit",
    f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(count(*) FILTER (WHERE n > {_Q274_L}) AS BIGINT)
               AS docs_over_l,
           CAST(sum(greatest(n - {_Q274_L}, 0)) AS BIGINT)
               AS tokens_lost,
           round(1.0 - sum(greatest(n - {_Q274_L}, 0)) * 1.0 / sum(n), 6)
               AS kept_frac
    FROM (
        SELECT source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n
        FROM documents
    )
    GROUP BY source ORDER BY source
    """,
    doc=(
        "context-window truncation audit at L=64: per source, how many "
        "documents exceed the context and how many tokens a naive "
        "truncate-at-L policy would discard (vs the chunker carrying "
        "them) — the readout that decides chunk_documents' overlap "
        "budget.  One partial-merging aggregate over one scan; "
        "|sources|-bounded output"
    ),
)
def q274(spark, sf_dir):
    from ..operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    n = token_count("text")
    lost = F.greatest(n - _Q274_L, F.lit(0))
    return (
        d.select("source", n.alias("n"), lost.alias("lost"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("long").alias("total_tokens"),
            F.count(F.when(F.col("n") > _Q274_L, 1)).alias("docs_over_l"),
            F.sum("lost").cast("long").alias("tokens_lost"),
            F.round(
                1.0 - F.sum("lost") / F.sum("n"), 6
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )
