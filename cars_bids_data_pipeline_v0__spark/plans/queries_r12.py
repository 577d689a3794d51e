"""Round-12 batch (q299+): curation-pipeline audits and mixing/LM
readouts over the documents table.

* **q299 dedup cascade audit** — the per-source survivor funnel a
  curation run reports: raw docs → after exact dedup (min-id per
  md5 fingerprint) → after near-dup removal (3-gram Jaccard ≥ 0.25
  against a smaller-id partner, df-capped pair index).  The funnel is
  the "what did each stage cost me" readout every dedup pipeline
  publishes.
* **q300 temperature-mixing sweep** — the third classic mixing scheme
  alongside UniMax (q272) and DoReMi (q286): sampling weights
  w_i ∝ p_i^τ for τ ∈ {0.3, 0.5, 0.7, 1.0} with per-source effective
  epochs at a one-epoch token budget — the mT5-style table a mixing
  decision reads off.
* **q301 sampled dup-rate estimator** — estimate the exact-duplicate
  doc fraction from a 1-in-5 FINGERPRINT-space sample (hashing the
  fingerprint, not the doc, keeps every dup family wholly in or out
  of the sample — the estimator is unbiased), with the q279 Wilson
  interval and the true rate alongside: the cheap pre-flight that
  decides whether a corpus needs the full dedup pass.
* **q302 held-out interpolated LM perplexity** — q153's self-scored
  bigram LM upgraded to the honest eval: train on a deterministic 90%
  hash split, score the held-out 10% with Jelinek-Mercer interpolation
  (0.75·bigram + 0.25·add-k unigram), per-source bits and OOV rate.

Reference parity: none — LLM-pipeline extensions (SURVEY §2 addenda).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .queries import _t, register
from .queries_ext import _STOP_EN_SQL
from .queries_r10b import _Q279_Z, _Q279_Z2

# ---------------------------------------------------------------------------
# q299 — dedup cascade audit (per-source survivor funnel)
# ---------------------------------------------------------------------------

_Q299_THRESHOLD = 0.25

# duped corpus WITH source attribution (q52's planted-dup shape)
_Q299_DOCS_SQL = """
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, source FROM documents
    WHERE doc_id % 10 = 0
"""


def _q299_oracle() -> str:
    return f"""
    WITH docs AS ({_Q299_DOCS_SQL}),
    fp AS (
        SELECT doc_id, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM docs
    ), surv AS (
        SELECT f, min(doc_id) AS id FROM fp GROUP BY f
    ), ex AS (
        SELECT fp.doc_id AS id, fp.source, fp.f
        FROM fp JOIN surv ON surv.f = fp.f AND surv.id = fp.doc_id
    ), sh AS (
        SELECT ex.id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM ex JOIN (
            SELECT doc_id,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM docs
        ) tt ON tt.doc_id = ex.id
    ), inv AS (
        SELECT id, unnest(s) AS shingle FROM sh
    ), cap AS (
        SELECT greatest(4, CAST(ceil(0.01 * count(*)) AS INT)) AS c
        FROM ex
    ), hot AS (
        SELECT shingle FROM inv GROUP BY 1
        HAVING count(*) > (SELECT c FROM cap)
    ), kept AS (
        SELECT id, shingle FROM inv ANTI JOIN hot USING (shingle)
    ), sizes AS (
        SELECT id, count(*) AS sz FROM kept GROUP BY 1
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM kept a JOIN kept b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    ), near_dropped AS (
        SELECT DISTINCT id_b AS id
        FROM pairs
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE round(CAST(inter AS DOUBLE)
                    / (sa.sz + sb.sz - inter), 6) >= {_Q299_THRESHOLD}
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE ex.id IS NOT NULL) AS BIGINT)
               AS n_after_exact,
           CAST(count(*) FILTER (
               WHERE ex.id IS NOT NULL AND nd.id IS NULL) AS BIGINT)
               AS n_after_near
    FROM docs d
    LEFT JOIN ex ON ex.id = d.doc_id
    LEFT JOIN near_dropped nd ON nd.id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """


@register(
    "q299_dedup_cascade_audit",
    _q299_oracle(),
    doc=(
        "the per-source dedup FUNNEL a curation run publishes: raw docs "
        "→ exact-dedup survivors (min doc_id per md5-of-normalized-text "
        "fingerprint — one hash shuffle) → near-dup survivors (3-gram "
        "Jaccard ≥ 0.25 with a smaller-id partner removed; the pair "
        "index carries the q295 relative df-cap, sizes rescored over "
        "the retained shingle space exactly as q211).  The corpus "
        "plants q52's 10% exact copies so the exact stage provably "
        "fires.  Every stage is the already-proven operator; the new "
        "surface is the stage-attribution join — |sources|-bounded "
        "output, one scan per stage at any corpus scale"
    ),
)
def q299(spark, sf_dir):
    from ..cache import track_persist
    from ..operators.dedup_docs import ngram_jaccard_pairs
    from ..operators.text import fingerprint_md5

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    extra = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "source"
    )
    docs = track_persist(d.unionByName(extra))
    fp = docs.select(
        "doc_id", "source", fingerprint_md5("text").alias("f")
    )
    surv = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
    ex = track_persist(fp.join(surv, ["f", "doc_id"], "left_semi"))
    cap = max(4, math.ceil(0.01 * ex.count()))
    ex_docs = docs.join(
        ex.select("doc_id"), "doc_id", "left_semi"
    )
    near_dropped = (
        ngram_jaccard_pairs(
            ex_docs, n=3, threshold=_Q299_THRESHOLD, df_cap=cap
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    flagged = (
        docs.select("doc_id", "source")
        .join(
            ex.select("doc_id", F.lit(1).alias("__ex")), "doc_id", "left"
        )
        .join(
            near_dropped.withColumn("__nd", F.lit(1)), "doc_id", "left"
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(
                F.when(F.col("__ex").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_after_exact"),
            F.sum(
                F.when(
                    F.col("__ex").isNotNull() & F.col("__nd").isNull(), 1
                ).otherwise(0)
            ).cast("long").alias("n_after_near"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q300 — temperature-mixing sweep (the mT5/T5 sampling-weight table)
# ---------------------------------------------------------------------------

_Q300_TAUS = (0.3, 0.5, 0.7, 1.0)


@register(
    "q300_temperature_mixing_sweep",
    f"""
    WITH src AS (
        SELECT source,
               CAST(sum(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(sum(n_tokens) AS DOUBLE) AS n FROM src
    ), p AS (
        SELECT source, n_tokens, n_tokens / tot.n AS share
        FROM src CROSS JOIN tot
    ), sweep AS (
        SELECT source, n_tokens, share, tau, power(share, tau) AS pt
        FROM p CROSS JOIN (
            SELECT CAST(unnest(
                [{", ".join(repr(t) for t in _Q300_TAUS)}]
            ) AS DOUBLE) AS tau
        )
    ), z AS (
        SELECT tau, sum(pt) AS zt FROM sweep GROUP BY tau
    )
    SELECT s.source, s.tau,
           round(s.share, 6) AS share,
           round(s.pt / z.zt, 6) AS weight,
           round((s.pt / z.zt) / s.share, 4) AS eff_epochs
    FROM sweep s JOIN z ON z.tau = s.tau
    ORDER BY s.tau, s.source
    """,
    doc=(
        "temperature-scaled mixing weights w_i ∝ share_i^τ for "
        f"τ ∈ {list(_Q300_TAUS)} — the mT5/T5 sampling-rate table, the "
        "third classic mixing scheme beside UniMax (q272, hard epoch "
        "cap) and DoReMi (q286, loss-driven): τ<1 flattens toward "
        "uniform, and eff_epochs = weight/share is how many times each "
        "source repeats under a one-epoch token budget (the "
        "over-sampling small sources pay for flattening).  One "
        "token-count aggregate per source; the sweep is |sources|×|τ| "
        "bounded arithmetic — dashboard-cheap at any corpus scale"
    ),
)
def q300(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    src = d.groupBy("source").agg(
        F.sum(F.size(toks)).cast("long").alias("n_tokens")
    )
    tot = src.agg(F.sum("n_tokens").cast("double").alias("n"))
    p = src.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("n")
    )
    sweep = p.select(
        "source",
        "n_tokens",
        "share",
        F.explode(
            F.array(*[F.lit(float(t)) for t in _Q300_TAUS])
        ).alias("tau"),
    ).withColumn("pt", F.pow("share", "tau"))
    z = sweep.groupBy("tau").agg(F.sum("pt").alias("zt"))
    return (
        sweep.join(F.broadcast(z), "tau")
        .select(
            "source",
            "tau",
            F.round("share", 6).alias("share"),
            F.round(F.col("pt") / F.col("zt"), 6).alias("weight"),
            F.round(
                (F.col("pt") / F.col("zt")) / F.col("share"), 4
            ).alias("eff_epochs"),
        )
        .orderBy("tau", "source")
    )


# ---------------------------------------------------------------------------
# q301 — sampled dup-rate estimator (fingerprint-space sample + Wilson CI)
# ---------------------------------------------------------------------------

_Q301_MOD = 5  # 1-in-5 of fingerprint space


@register(
    "q301_sampled_dup_rate",
    f"""
    WITH docs AS ({_Q299_DOCS_SQL}),
    fp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM docs
    ), fam AS (
        SELECT f, CAST(count(*) AS BIGINT) AS n,
               CAST(('0x' || substr(md5('dupsample' || f), 1, 15))
                    AS BIGINT) % {_Q301_MOD} = 0 AS in_sample
        FROM fp GROUP BY f
    ), s AS (
        SELECT CAST(sum(n) FILTER (WHERE in_sample) AS BIGINT)
                   AS sample_docs,
               CAST(sum(CASE WHEN in_sample AND n > 1 THEN n - 1
                             ELSE 0 END) AS BIGINT) AS sample_dup_docs,
               CAST(sum(n) AS BIGINT) AS total_docs,
               CAST(sum(n - 1) AS BIGINT) AS total_dup_docs
        FROM fam
    ), p AS (
        SELECT sample_docs, sample_dup_docs, total_docs, total_dup_docs,
               sample_dup_docs * 1.0 / sample_docs AS ph
        FROM s
    )
    SELECT sample_docs, sample_dup_docs,
           round(ph, 6) AS est_dup_frac,
           round((ph + {_Q279_Z2!r} / (2 * sample_docs)
                  - {_Q279_Z!r} * sqrt((ph * (1 - ph)
                        + {_Q279_Z2!r} / (4 * sample_docs))
                        / sample_docs))
                 / (1 + {_Q279_Z2!r} / sample_docs), 6) AS wilson_lb,
           round((ph + {_Q279_Z2!r} / (2 * sample_docs)
                  + {_Q279_Z!r} * sqrt((ph * (1 - ph)
                        + {_Q279_Z2!r} / (4 * sample_docs))
                        / sample_docs))
                 / (1 + {_Q279_Z2!r} / sample_docs), 6) AS wilson_ub,
           round(total_dup_docs * 1.0 / total_docs, 6) AS true_dup_frac
    FROM p
    """,
    doc=(
        "exact-duplicate fraction estimated from a 1-in-5 sample of "
        "FINGERPRINT space (hash the md5 fingerprint, not the doc: "
        "every dup family lands wholly in or out of the sample, so the "
        "within-sample dup fraction is an unbiased estimator — "
        "doc-space sampling would quadratically under-count pairs), "
        "with the q279 Wilson 95% interval and the exact rate "
        "alongside as the eval.  Dup docs = family size − 1 (the kept "
        "survivor is not a duplicate).  This is the pre-flight that "
        "decides whether a corpus pays for the full dedup pass by "
        "scanning 20% of the fingerprint aggregate; the corpus plants "
        "q52's 10% copies so the rate is provably nonzero"
    ),
)
def q301(spark, sf_dir):
    from ..operators.dedup_docs import portable_hash60
    from ..operators.text import fingerprint_md5

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    docs = d.unionByName(extra)
    fam = (
        docs.select(fingerprint_md5("text").alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "in_sample",
            portable_hash60("f", "dupsample") % _Q301_MOD == 0,
        )
    )
    s = fam.agg(
        F.sum(F.when(F.col("in_sample"), F.col("n")))
        .cast("long")
        .alias("sample_docs"),
        F.sum(
            F.when(F.col("in_sample") & (F.col("n") > 1), F.col("n") - 1)
            .otherwise(0)
        ).cast("long").alias("sample_dup_docs"),
        F.sum("n").cast("long").alias("total_docs"),
        F.sum(F.col("n") - 1).cast("long").alias("total_dup_docs"),
    )
    ph = F.col("sample_dup_docs") * 1.0 / F.col("sample_docs")
    nd = F.col("sample_docs")
    half = F.lit(_Q279_Z) * F.sqrt(
        (ph * (1 - ph) + F.lit(_Q279_Z2) / (4 * nd)) / nd
    )
    center = ph + F.lit(_Q279_Z2) / (2 * nd)
    denom = 1 + F.lit(_Q279_Z2) / nd
    return s.select(
        "sample_docs",
        "sample_dup_docs",
        F.round(ph, 6).alias("est_dup_frac"),
        F.round((center - half) / denom, 6).alias("wilson_lb"),
        F.round((center + half) / denom, 6).alias("wilson_ub"),
        F.round(
            F.col("total_dup_docs") * 1.0 / F.col("total_docs"), 6
        ).alias("true_dup_frac"),
    )


# ---------------------------------------------------------------------------
# q302 — held-out interpolated LM perplexity (honest eval of q153's LM)
# ---------------------------------------------------------------------------

_Q302_MOD = 10  # 1-in-10 docs → held-out
_Q302_LAM = 0.75  # Jelinek-Mercer bigram weight


@register(
    "q302_heldout_lm_perplexity",
    f"""
    WITH toks AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS ws,
               CAST(('0x' || substr(md5('lmsplit'
                         || CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % {_Q302_MOD} = 0 AS held
        FROM documents WHERE length(trim(text)) > 0
    ), bigrams AS (
        SELECT doc_id, source, held, ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT doc_id, source, held, ws,
                     unnest(generate_series(1, len(ws) - 1)) AS i
              FROM toks)
    ), bg AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bigrams WHERE NOT held GROUP BY w1, w2
    ), ug AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1
        FROM bigrams WHERE NOT held GROUP BY w1
    ), tot AS (
        SELECT CAST(sum(c1) AS DOUBLE) AS n,
               CAST(count(*) AS DOUBLE) AS v
        FROM ug
    ), scored AS (
        SELECT h.source,
               -log2({_Q302_LAM!r}
                     * coalesce(CAST(bg.c12 AS DOUBLE) / ug.c1, 0.0)
                     + {1 - _Q302_LAM!r}
                     * ((coalesce(u2.c1, 0) + 0.5)
                        / (tot.n + 0.5 * tot.v))) AS bits,
               CASE WHEN u2.c1 IS NULL THEN 1 ELSE 0 END AS oov
        FROM bigrams h
        LEFT JOIN bg ON bg.w1 = h.w1 AND bg.w2 = h.w2
        LEFT JOIN ug ON ug.w1 = h.w1
        LEFT JOIN ug u2 ON u2.w1 = h.w2
        CROSS JOIN tot
        WHERE h.held
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(bits), 4) AS bits_per_bigram,
           round(sum(oov) * 1.0 / count(*), 6) AS oov_rate
    FROM scored GROUP BY source ORDER BY source
    """,
    doc=(
        "held-out LM perplexity — the honest version of q153's "
        "self-scored filter: a deterministic 1-in-10 hash split holds "
        "out eval docs, the bigram/unigram count model trains on the "
        "rest, and held-out bigrams score under Jelinek-Mercer "
        "interpolation (0.75·MLE-bigram + 0.25·add-k unigram, so "
        "unseen bigrams cost the unigram backoff instead of "
        "-log(0)).  Per-source bits/bigram + OOV rate is the "
        "domain-shift readout (a source whose held-out half surprises "
        "the model trained mostly on everything else).  The model IS "
        "two partial-aggregable count tables; scoring is the postings "
        "join, shuffling on token keys — q153's scale shape with a "
        "train/eval split on top"
    ),
)
def q302(spark, sf_dir):
    from ..operators.dedup_docs import portable_hash60

    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        "source",
        F.split(F.trim(F.lower("text")), r"\s+").alias("ws"),
        (
            portable_hash60(
                F.col("doc_id").cast("string"), "lmsplit"
            ) % _Q302_MOD == 0
        ).alias("held"),
    )
    bigrams = toks.select(
        "doc_id",
        "source",
        "held",
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1),"
                " (x, i) -> struct(x as w1, ws[i + 1] as w2))"
            )
        ).alias("bgr"),
    ).select("doc_id", "source", "held", "bgr.w1", "bgr.w2")
    train = bigrams.filter(~F.col("held"))
    bg = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    ug = train.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    tot = ug.agg(
        F.sum("c1").cast("double").alias("n"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    u2 = ug.select(
        F.col("w1").alias("w2"), F.col("c1").alias("c2")
    )
    held = bigrams.filter(F.col("held"))
    scored = (
        held.join(bg, ["w1", "w2"], "left")
        .join(ug, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (
                -F.log2(
                    F.lit(_Q302_LAM)
                    * F.coalesce(
                        F.col("c12").cast("double") / F.col("c1"),
                        F.lit(0.0),
                    )
                    + F.lit(1 - _Q302_LAM)
                    * (
                        (F.coalesce(F.col("c2"), F.lit(0)) + 0.5)
                        / (F.col("n") + 0.5 * F.col("v"))
                    )
                )
            ).alias("bits"),
            F.when(F.col("c2").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("bits"), 4).alias("bits_per_bigram"),
            F.round(
                F.sum("oov") * 1.0 / F.count(F.lit(1)), 6
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q303 — PMI collocations (top bigram associations)
# ---------------------------------------------------------------------------

_Q303_MIN_C12 = 5
_Q303_TOPK = 20


@register(
    "q303_pmi_collocations",
    f"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        FROM documents WHERE length(trim(text)) > 0
    ), bigrams AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
              FROM toks)
    ), bg AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bigrams GROUP BY w1, w2
    ), u1 AS (
        SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bigrams GROUP BY w1
    ), u2 AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bigrams GROUP BY w2
    ), tot AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM bigrams
    )
    SELECT bg.w1, bg.w2, bg.c12,
           round(log2(bg.c12 * tot.n / (u1.c1 * u2.c2)), 6) AS pmi
    FROM bg
    JOIN u1 ON u1.w1 = bg.w1
    JOIN u2 ON u2.w2 = bg.w2
    CROSS JOIN tot
    WHERE bg.c12 >= {_Q303_MIN_C12}
    ORDER BY pmi DESC, bg.w1, bg.w2
    LIMIT {_Q303_TOPK}
    """,
    doc=(
        "collocation extraction: directional pointwise mutual "
        "information log2(c12·N / (c1·c2)) over corpus bigrams with "
        f"count ≥ {_Q303_MIN_C12}, top {_Q303_TOPK} — the phrase-mining "
        "readout (tokenizer merge candidates, template detection, "
        "multi-word entities).  Three partial-aggregable count tables "
        "+ postings joins on token keys; the top-k is a bounded "
        "TakeOrdered, never a global rank window; PMI rounded to 6 "
        "BEFORE ordering so the ranking is cross-engine-deterministic "
        "(ties broken on the bigram itself)"
    ),
)
def q303(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        F.split(F.trim(F.lower("text")), r"\s+").alias("ws")
    )
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1),"
                " (x, i) -> struct(x as w1, ws[i + 1] as w2))"
            )
        ).alias("bgr")
    ).select("bgr.w1", "bgr.w2")
    bg = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    u1 = bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1")
    )
    u2 = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2")
    )
    tot = bigrams.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        bg.filter(F.col("c12") >= _Q303_MIN_C12)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log2(
                    F.col("c12") * F.col("n")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_Q303_TOPK)
    )


# ---------------------------------------------------------------------------
# q304 — duplicate incidence by length decile
# ---------------------------------------------------------------------------

_Q304_PS = tuple((i + 1) / 10 for i in range(9))


@register(
    "q304_dup_rate_by_length",
    f"""
    WITH docs AS ({_Q299_DOCS_SQL}),
    fp AS (
        SELECT doc_id,
               CAST(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS DOUBLE) AS n_tok,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS f
        FROM docs
    ), fam AS (
        SELECT f, CAST(count(*) AS BIGINT) AS fam_n FROM fp GROUP BY f
    ), cuts AS (
        SELECT quantile_cont(n_tok, {list(_Q304_PS)}) AS c FROM fp
    ), marked AS (
        SELECT fp.doc_id, fp.n_tok, fam.fam_n > 1 AS is_dup,
               len(list_filter(cuts.c, x -> fp.n_tok >= x)) AS decile
        FROM fp JOIN fam ON fam.f = fp.f CROSS JOIN cuts
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS n_dup_docs,
           round(count(*) FILTER (WHERE is_dup) * 1.0 / count(*), 6)
               AS dup_rate
    FROM marked GROUP BY decile ORDER BY decile
    """,
    doc=(
        "exact-duplicate incidence by token-length decile — the audit "
        "that says WHERE a corpus's duplication lives (short docs "
        "duplicate far more often: headers, boilerplate snippets, "
        "empty-ish pages), which decides whether a length floor is "
        "cheaper than a dedup pass.  Deciles via the q289 discipline: "
        "one exact-percentile aggregate broadcast as a 9-value cut "
        "array (never a global ntile window); dup membership is the "
        "q52 fingerprint family size.  The corpus plants q52's copies "
        "so incidence is nonzero by construction"
    ),
)
def q304(spark, sf_dir):
    from ..operators.text import fingerprint_md5

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    docs = d.unionByName(extra)
    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        )
    ).cast("double")
    fp = docs.select(
        "doc_id", n_tok.alias("n_tok"), fingerprint_md5("text").alias("f")
    )
    fam = fp.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("fam_n"))
    cuts = fp.agg(
        F.array(
            *[F.percentile("n_tok", F.lit(p)) for p in _Q304_PS]
        ).alias("c")
    )
    marked = (
        fp.join(fam, "f")
        .crossJoin(F.broadcast(cuts))
        .select(
            (F.col("fam_n") > 1).alias("is_dup"),
            F.expr("size(filter(c, x -> n_tok >= x))").alias("decile"),
        )
    )
    return (
        marked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.round(
                F.sum(F.when(F.col("is_dup"), 1).otherwise(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q305 — stopword-ratio burstiness per source
# ---------------------------------------------------------------------------


@register(
    "q305_stopword_burstiness",
    f"""
    WITH feats AS (
        SELECT source,
               CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                    THEN CAST(len(list_filter(
                             regexp_split_to_array(trim(lower(text)),
                                                   '\\s+'),
                             t -> list_contains({_STOP_EN_SQL}, t)))
                         AS DOUBLE)
                         / len(regexp_split_to_array(trim(text), '\\s+'))
                    ELSE 0.0 END AS r
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(r), 6) AS mean_ratio,
           round(var_samp(r), 6) AS var_ratio,
           round(CASE WHEN avg(r) > 0 THEN var_samp(r) / avg(r)
                      ELSE 0.0 END, 4) AS dispersion
    FROM feats GROUP BY source ORDER BY source
    """,
    doc=(
        "per-source DISPERSION of the per-doc stopword ratio (q50's "
        "feature): natural prose varies doc to doc; machine-generated "
        "or templated sources show abnormally LOW variance (every doc "
        "hits the same ratio) and keyword-stuffed ones abnormally "
        "high — a corpus-level fingerprint a per-doc gate cannot see.  "
        "Index = var/mean (the overdispersion shape); one scan, "
        "mergeable moments, |sources|-bounded output"
    ),
)
def q305(spark, sf_dir):
    from ..operators.text import quality_features

    d = _t(spark, sf_dir, "documents")
    r = quality_features("text")["stopword_ratio"]
    feats = d.select("source", r.alias("r"))
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("r"), 6).alias("mean_ratio"),
            F.round(F.var_samp("r"), 6).alias("var_ratio"),
            F.round(
                F.when(
                    F.avg("r") > 0, F.var_samp("r") / F.avg("r")
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("dispersion"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q306 — char-trigram type/token ratio (compressibility proxy)
# ---------------------------------------------------------------------------


@register(
    "q306_char_trigram_ttr",
    """
    WITH norm AS (
        SELECT doc_id, source,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents
        WHERE length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
              >= 3
    ), grams AS (
        SELECT doc_id, source,
               CAST(length(t) - 2 AS BIGINT) AS total,
               CAST(len(list_distinct(list_transform(
                   generate_series(1, length(t) - 2),
                   i -> substr(t, i, 3)))) AS BIGINT) AS distinct_n
        FROM norm
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(distinct_n AS DOUBLE) / total), 6) AS mean_ttr,
           round(min(CAST(distinct_n AS DOUBLE) / total), 6) AS min_ttr
    FROM grams GROUP BY source ORDER BY source
    """,
    doc=(
        "character-trigram type/token ratio per doc, aggregated per "
        "source — the compressibility proxy (gzip-ratio's statistical "
        "twin without a codec): heavily repeated text (keyword spam, "
        "looping generation) shows a LOW distinct/total trigram ratio "
        "long before a word-level gate notices, and min_ttr surfaces "
        "each source's worst offender.  The trigram array is built "
        "inside one transform over the LET-BOUND normalized string "
        "(the word_shingles discipline — inlining the regex chain into "
        "the lambda re-evaluates it per trigram, O(len²) regex work); "
        "one scan, no explode, no shuffle beyond the source aggregate"
    ),
)
def q306(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        "source",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
        ).alias("t"),
    ).filter(F.length("t") >= 3)
    grams = norm.select(
        "source",
        F.explode(
            F.transform(
                F.array(F.col("t")),
                lambda t: F.struct(
                    (F.length(t) - 2).cast("long").alias("total"),
                    F.size(
                        F.array_distinct(
                            F.transform(
                                F.sequence(F.lit(1), F.length(t) - 2),
                                lambda i: F.substring(t, i, F.lit(3)),
                            )
                        )
                    ).cast("long").alias("distinct_n"),
                ),
            )
        ).alias("g"),
    ).select("source", "g.total", "g.distinct_n")
    ttr = F.col("distinct_n").cast("double") / F.col("total")
    return (
        grams.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg(ttr), 6).alias("mean_ttr"),
            F.round(F.min(ttr), 6).alias("min_ttr"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q307 — event-type transition matrix (first-order Markov over sessions)
# ---------------------------------------------------------------------------


@register(
    "q307_event_transition_matrix",
    """
    WITH ordered AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        FROM ordered WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), tot AS (
        SELECT cur, sum(n) AS t FROM pairs GROUP BY cur
    )
    SELECT p.cur, p.nxt, p.n,
           round(p.n * 1.0 / tot.t, 6) AS p_next
    FROM pairs p JOIN tot ON tot.cur = p.cur
    ORDER BY p.cur, p.nxt
    """,
    doc=(
        "first-order Markov transition matrix over each user's event "
        "stream: P(next event type | current), from ONE lead() window "
        "per user (keyed partition, never a global window) + a "
        "|types|²-bounded count.  The behavioral-model readout session "
        "analytics builds funnels and anomaly baselines from (a "
        "transition that drifts week-over-week is the alert).  At "
        "100 TB the window shuffles once on user_id and every "
        "aggregate after is |types|²-sized"
    ),
)
def q307(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = ordered.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(tot), "cur")
        .select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n") * 1.0 / F.col("t"), 6).alias("p_next"),
        )
        .orderBy("cur", "nxt")
    )


# ---------------------------------------------------------------------------
# q308 — inter-event gap quantiles per event type
# ---------------------------------------------------------------------------

_Q308_PS = (0.5, 0.9, 0.99)


@register(
    "q308_interevent_gap_quantiles",
    f"""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.5) / 1000000, 4) AS p50_sec,
           round(quantile_cont(gap_us, 0.9) / 1000000, 4) AS p90_sec,
           round(quantile_cont(gap_us, 0.99) / 1000000, 4) AS p99_sec
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    doc=(
        "inter-arrival gap quantiles (p50/p90/p99) per event type: the "
        "gap from each user's PREVIOUS event (any type) to this one, "
        "grouped by the arriving type — the latency/engagement readout "
        "that sizes session timeouts (q42's 30-min window) and "
        "watermarks (§2.10's late-data bound) from data instead of "
        "folklore.  Gaps are integer MICROSECONDS (unix_micros/"
        "epoch_us — no float timestamp drift between engines); one "
        "keyed lag() window + exact percentile aggregates"
    ),
)
def q308(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the cast offset (session tz) cancels in
    # the lag difference, so gaps are exact integer microseconds
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    qs = [
        F.round(
            F.percentile("gap_us", F.lit(p)) / 1000000, 4
        ).alias(f"p{int(p * 100)}_sec")
        for p in _Q308_PS
    ]
    return (
        gaps.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"), *qs)
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q309 — language-mix entropy per source
# ---------------------------------------------------------------------------


@register(
    "q309_lang_mix_entropy",
    """
    WITH cnt AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY source, lang
    ), tot AS (
        SELECT source, sum(n) AS t, max(n) AS top_n FROM cnt
        GROUP BY source
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_langs,
           round(-sum((c.n * 1.0 / t.t) * log2(c.n * 1.0 / t.t)), 6)
               AS lang_entropy,
           round(max(t.top_n) * 1.0 / max(t.t), 6) AS top_lang_share
    FROM cnt c JOIN tot t ON t.source = c.source
    GROUP BY c.source
    ORDER BY c.source
    """,
    doc=(
        "language-mix purity per source: Shannon entropy of the lang "
        "distribution plus the majority share — the audit that "
        "separates a monolingual source (entropy ≈ 0) from a crawl "
        "bucket that needs per-lang routing before mixing (q51 labels "
        "docs; THIS says whether a source is a mix at all).  "
        "|sources|×|langs|-bounded counts, everything after is "
        "arithmetic on the bounded frame"
    ),
)
def q309(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    cnt = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cnt.groupBy("source").agg(
        F.sum("n").alias("t"), F.max("n").alias("top_n")
    )
    p = F.col("n") * 1.0 / F.col("t")
    return (
        cnt.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("lang_entropy"),
            F.round(
                F.max("top_n") * 1.0 / F.max("t"), 6
            ).alias("top_lang_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q310 — int8/int4 quantization-error sweep over embeddings
# ---------------------------------------------------------------------------

_Q310_QMAX = (127.0, 7.0)  # int8, int4 symmetric


@register(
    "q310_quant_error_sweep",
    f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), prep AS (
        SELECT vec_id, label, v,
               list_max(list_transform(v, x -> abs(x))) AS amax
        FROM e
    ), sweep AS (
        SELECT label, qmax,
               round(
                 list_sum(list_transform(v,
                     x -> pow(x - round(x / (amax / qmax))
                                  * (amax / qmax), 2)))
                 / list_sum(list_transform(v, x -> x * x)), 9)
                   AS rel_err
        FROM prep CROSS JOIN (
            SELECT CAST(unnest([{", ".join(repr(q) for q in _Q310_QMAX)}])
                        AS DOUBLE) AS qmax
        )
        WHERE amax > 0
    )
    SELECT label, qmax,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(rel_err), 6) AS mean_rel_err,
           round(max(rel_err), 6) AS max_rel_err
    FROM sweep GROUP BY label, qmax ORDER BY label, qmax
    """,
    doc=(
        "symmetric per-vector int8 vs int4 quantization error over the "
        "embedding table, per label: scale = amax/qmax, relative MSE "
        "of the dequantized vector — the storage-sizing readout that "
        "says whether an ANN index can drop to 4-bit codes for THIS "
        "corpus (the q58/q292 PQ family's scalar-quant sibling).  The "
        "scale is computed ONCE as a column and referenced inside the "
        "fold as an attribute (inlining amax re-evaluates the "
        "array_max per element — the lambda tax); per-vector error is "
        "rounded to 9 before the label aggregate so the cross-engine "
        "float-fold order cannot surface"
    ),
)
def q310(spark, sf_dir):
    from ..operators.similarity import as_double

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    prep = e.select(
        "label",
        "v",
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("amax"),
    ).filter(F.col("amax") > 0)
    sweep = prep.select(
        "label",
        F.explode(
            F.array(*[F.lit(q) for q in _Q310_QMAX])
        ).alias("qmax"),
        "v",
        (F.col("amax") / F.col("qmax")).alias("scale"),
    ).select(
        "label",
        "qmax",
        F.round(
            F.aggregate(
                "v",
                F.lit(0.0),
                lambda acc, x: acc
                + F.pow(
                    x - F.round(x / F.col("scale"), 0) * F.col("scale"),
                    F.lit(2.0),
                ),
            )
            / F.aggregate(
                "v", F.lit(0.0), lambda acc, x: acc + x * x
            ),
            9,
        ).alias("rel_err"),
    )
    return (
        sweep.groupBy("label", "qmax")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.avg("rel_err"), 6).alias("mean_rel_err"),
            F.round(F.max("rel_err"), 6).alias("max_rel_err"),
        )
        .orderBy("label", "qmax")
    )


# ---------------------------------------------------------------------------
# q311 — weekly retention cohorts
# ---------------------------------------------------------------------------


@register(
    "q311_retention_cohorts",
    """
    WITH first_seen AS (
        SELECT user_id,
               CAST(min(date_trunc('week', ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ), sizes AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
        FROM first_seen GROUP BY cohort
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               CAST(date_diff('day', f.cohort,
                    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
                   AS week_n
        FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT a.cohort, a.week_n,
           CAST(count(*) AS BIGINT) AS n_active,
           s.cohort_users,
           round(count(*) * 1.0 / s.cohort_users, 6) AS retention
    FROM activity a JOIN sizes s ON s.cohort = a.cohort
    GROUP BY a.cohort, a.week_n, s.cohort_users
    ORDER BY a.cohort, a.week_n
    """,
    doc=(
        "weekly retention triangle: users bucketed into their "
        "first-seen ISO-week cohort, then the fraction of each cohort "
        "active in each later week — the canonical product-analytics "
        "readout (q263's funnel says WHAT users do; this says whether "
        "they come back).  Week arithmetic is date_trunc + an exact "
        "integer day-difference // 7 (week-truncated dates differ by "
        "multiples of 7 — no float time math), so both engines bucket "
        "identically.  Two user-keyed aggregates + one distinct per "
        "(user, week) — shuffles on user_id, output bounded by "
        "|cohorts|² weeks"
    ),
)
def q311(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first_seen = e.groupBy("user_id").agg(
        F.min(wk).cast("date").alias("cohort")
    )
    sizes = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(wk.cast("date"), F.col("cohort"))
                / F.lit(7)
            ).cast("int").alias("week_n"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort", "week_n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_n",
            "n_active",
            "cohort_users",
            F.round(
                F.col("n_active") * 1.0 / F.col("cohort_users"), 6
            ).alias("retention"),
        )
        .orderBy("cohort", "week_n")
    )


# ---------------------------------------------------------------------------
# q312 — hourly-volume anomalies via median absolute deviation
# ---------------------------------------------------------------------------

_Q312_K = 1.4826  # normal-consistency constant
_Q312_CUT = 3.0


@register(
    "q312_hourly_anomaly_mad",
    f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ), med AS (
        SELECT quantile_cont(c, 0.5) AS m FROM hourly
    ), dev AS (
        SELECT h, c, abs(c - med.m) AS d FROM hourly CROSS JOIN med
    ), mad AS (
        SELECT quantile_cont(d, 0.5) AS md FROM dev
    )
    SELECT dev.h AS hour, dev.c AS n_events,
           round(dev.d / ({_Q312_K!r} * mad.md), 4) AS robust_z
    FROM dev CROSS JOIN mad
    WHERE dev.d > {_Q312_CUT!r} * {_Q312_K!r} * mad.md
    ORDER BY hour
    """,
    doc=(
        "robust volume-anomaly detection on the hourly event series: "
        "median + MAD (×1.4826 normal-consistency) instead of "
        "mean/stddev, so the detector's own baseline is immune to the "
        "anomalies it hunts — the ops alert q152's EWMA and q283's "
        "Holt forecast complement with a distribution-free flag.  Two "
        "exact-percentile aggregates broadcast as single-row frames; "
        "the hourly rollup is the only corpus-sized shuffle"
    ),
)
def q312(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    med = hourly.agg(F.percentile("c", F.lit(0.5)).alias("m"))
    dev = hourly.crossJoin(F.broadcast(med)).select(
        "h", "c", F.abs(F.col("c") - F.col("m")).alias("d")
    )
    mad = dev.agg(F.percentile("d", F.lit(0.5)).alias("md"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(
            F.col("d") > F.lit(_Q312_CUT) * F.lit(_Q312_K) * F.col("md")
        )
        .select(
            F.col("h").alias("hour"),
            F.col("c").alias("n_events"),
            F.round(
                F.col("d") / (F.lit(_Q312_K) * F.col("md")), 4
            ).alias("robust_z"),
        )
        .orderBy("hour")
    )


# ---------------------------------------------------------------------------
# q313 — positional token entropy (template-rigidity profile)
# ---------------------------------------------------------------------------

_Q313_POSITIONS = 8


@register(
    "q313_positional_token_entropy",
    f"""
    WITH toks AS (
        SELECT list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '') AS t
        FROM documents WHERE length(trim(text)) > 0
    ), pos AS (
        SELECT i AS position, t[i] AS tok
        FROM toks, unnest(generate_series(1, {_Q313_POSITIONS})) AS u(i)
        WHERE len(t) >= i
    ), cnt AS (
        SELECT position, tok, CAST(count(*) AS BIGINT) AS c
        FROM pos GROUP BY position, tok
    ), tot AS (
        SELECT position, sum(c) AS n FROM cnt GROUP BY position
    )
    SELECT c.position,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(-sum((c.c * 1.0 / t.n) * log2(c.c * 1.0 / t.n)), 6)
               AS entropy
    FROM cnt c JOIN tot t ON t.position = c.position
    GROUP BY c.position
    ORDER BY c.position
    """,
    doc=(
        "token entropy BY POSITION over the first 8 tokens: a rigid "
        "template pins early positions to near-zero entropy (every doc "
        "starts the same way) while natural text stays high from "
        "position one — the rigidity PROFILE behind q287's shared-"
        "prefix detector (q287 finds the templates; this measures how "
        "templated the corpus is overall, one number per position).  "
        "Positional counts are vocab-bounded aggregates; the entropy "
        "fold is |positions|-bounded arithmetic"
    ),
)
def q313(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        ).alias("t")
    )
    pos = toks.select(
        F.posexplode(
            F.slice(F.col("t"), 1, _Q313_POSITIONS)
        ).alias("p0", "tok")
    ).select((F.col("p0") + 1).alias("position"), "tok")
    cnt = pos.groupBy("position", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cnt.groupBy("position").agg(F.sum("c").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    return (
        cnt.join(F.broadcast(tot), "position")
        .groupBy("position")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"),
        )
        .orderBy("position")
    )
