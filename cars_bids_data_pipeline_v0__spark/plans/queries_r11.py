"""Round-11 batch (q285+): corpus-statistics and curation-audit
operators over the documents/embeddings tables.

* **q285 Heaps' law fit** — vocabulary-growth exponent V(n) ≈ K·n^β
  over the corpus read in doc-id order: the standard health check that
  a corpus keeps contributing NEW vocabulary (β for natural text sits
  near 0.5; β → 0 flags a templated/looping corpus).  Cumulative sums
  run through the two-phase distributed prefix sum (never a
  single-partition window); the log-log OLS is a mergeable regr_*
  aggregate, exactly as q233's Zipf fit.
* **q286 DoReMi-style domain reweight** — one multiplicative-weights
  step over sources: unigram cross-entropy of each source against the
  corpus LM as the loss proxy, excess over the best source, and
  w ∝ share·exp(η·excess) renormalized (Xie 2023 DoReMi's update
  shape, deterministic and RNG-free).
* **q287 cross-lingual template prefixes** — normalized 8-token
  prefixes shared across languages: the translation-template /
  boilerplate signal exact-dedup misses because the tails differ.
* **q288 pack-efficiency audit** — per-shard utilization of the
  q97/q100 chunk→pack chain: packs per shard, non-final-pack fill
  rates, wasted-token fraction — the loader-side QA readout.
* **q289 quality-score calibration** — q275's classifier score cut
  into global deciles × the q59 rule gate's verdict: the reliability
  table that says whether the model ORDER agrees with the rules
  (FineWeb-style threshold picking needs exactly this readout).
* **q290 decontaminated eval-holdout split** — deterministic 5%
  eval sample (portable-hash membership), then every train doc
  sharing a 3-gram shingle with the eval set is dropped (q81's
  decontamination turned into the train/eval split it exists for);
  per-source kept/dropped accounting.
* **q291 mixing quality curve** — sources ordered by mean classifier
  score: cumulative tokens and token-weighted quality at each prefix —
  the "how much budget buys how much quality" curve data mixing
  decisions read off.  Windows run over the |sources|-row bounded
  frame (the q109 discipline).

Reference parity: none — LLM-pipeline extensions (SURVEY §2 addenda).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, register
from .queries_ext import _STOP_EN_SQL
from .queries_r10b import _Q275_SCORED_CTES, _Q275_W
from .queries_r2 import _Q97_OVERLAP, _Q97_SIZE, _Q97_STRIDE, _Q100_BUDGET, _Q100_SHARDS

# ---------------------------------------------------------------------------
# q285 — Heaps' law fit
# ---------------------------------------------------------------------------


def _lower_tokens(col: str = "text"):
    return F.filter(
        F.split(F.lower(F.trim(F.col(col))), r"\s+"),
        lambda t: t != "",
    )


_Q285_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
    "x -> x <> '')"
)


@register(
    "q285_heaps_law_fit",
    f"""
    WITH d AS (
        SELECT doc_id, {_Q285_TOKS_SQL} AS toks FROM documents
    ), docs AS (
        SELECT doc_id, len(toks) AS n_toks FROM d
    ), tok AS (
        SELECT doc_id, unnest(toks) AS t FROM d
    ), first AS (
        SELECT t, min(doc_id) AS doc_id FROM tok GROUP BY t
    ), newc AS (
        SELECT doc_id, count(*) AS new_toks FROM first GROUP BY doc_id
    ), pts AS (
        SELECT docs.doc_id, docs.n_toks,
               coalesce(newc.new_toks, 0) AS new_toks
        FROM docs LEFT JOIN newc USING (doc_id)
    ), cum AS (
        SELECT doc_id,
               sum(n_toks) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_n_toks,
               sum(new_toks) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_new_toks
        FROM pts
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(regr_slope(ln(cum_new_toks), ln(cum_n_toks)), 6)
               AS heaps_beta,
           round(regr_intercept(ln(cum_new_toks), ln(cum_n_toks)), 6)
               AS heaps_ln_k
    FROM cum WHERE cum_n_toks > 0 AND cum_new_toks > 0
    """,
    doc=(
        "Heaps'-law vocabulary-growth fit V(n) ≈ K·n^β: per-token "
        "first-occurrence doc (one groupBy-min over the exploded "
        "corpus), new-vocabulary count per doc, inclusive cumulative "
        "token/vocab sums via the two-phase distributed prefix sum "
        "(rankstats.prefix_sums_by_value — one range exchange, no "
        "single-partition window), then log-log OLS as mergeable "
        "regr_* aggregates (the q233 Zipf discipline).  β near 0.5 is "
        "healthy natural text; β collapsing toward 0 flags a "
        "templated corpus.  Scale: two token-keyed shuffles + a "
        "range exchange — everything else is narrow"
    ),
)
def q285(spark, sf_dir):
    from ..operators.rankstats import prefix_sums_by_value

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _lower_tokens().alias("toks")
    )
    docs = d.select("doc_id", F.size("toks").alias("n_toks"))
    tok = d.select("doc_id", F.explode("toks").alias("t"))
    first = tok.groupBy("t").agg(F.min("doc_id").alias("doc_id"))
    newc = first.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("new_toks")
    )
    pts = docs.join(newc, "doc_id", "left").fillna(0, ["new_toks"])
    cum = prefix_sums_by_value(pts, "doc_id", ["n_toks", "new_toks"])
    pts2 = cum.filter(
        (F.col("cum_n_toks") > 0) & (F.col("cum_new_toks") > 0)
    )
    y = F.log(F.col("cum_new_toks").cast("double"))
    x = F.log(F.col("cum_n_toks").cast("double"))
    return pts2.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.regr_slope(y, x), 6).alias("heaps_beta"),
        F.round(F.regr_intercept(y, x), 6).alias("heaps_ln_k"),
    )


# ---------------------------------------------------------------------------
# q286 — DoReMi-style domain reweighting step
# ---------------------------------------------------------------------------

_Q286_ETA = 1.0


@register(
    "q286_doremi_domain_reweight",
    f"""
    WITH tok AS (
        SELECT doc_id, source, unnest({_Q285_TOKS_SQL}) AS t
        FROM documents
    ), tot AS (
        SELECT count(*) AS n FROM tok
    ), freq AS (
        SELECT t, count(*) AS cnt FROM tok GROUP BY t
    ), doc_loss AS (
        SELECT doc_id, source,
               -sum(ln(freq.cnt * 1.0 / tot.n)) / count(*) AS ld
        FROM tok JOIN freq USING (t) CROSS JOIN tot
        GROUP BY doc_id, source
    ), src AS (
        SELECT source, avg(ld) AS loss FROM doc_loss GROUP BY source
    ), share AS (
        SELECT source, count(*) AS n_s FROM tok GROUP BY source
    ), j AS (
        SELECT s.source, s.loss, sh.n_s * 1.0 / tot.n AS u,
               s.loss - min(s.loss) OVER () AS excess
        FROM src s JOIN share sh USING (source) CROSS JOIN tot
    ), w AS (
        SELECT source, u, loss, excess,
               u * exp({_Q286_ETA} * excess) AS w_raw
        FROM j
    )
    SELECT source,
           round(u, 6) AS baseline_share,
           round(loss, 6) AS xent_loss,
           round(excess, 6) AS excess_loss,
           round(w_raw / sum(w_raw) OVER (), 6) AS new_weight
    FROM w ORDER BY source
    """,
    doc=(
        "one DoReMi-style multiplicative-weights step over sources "
        "(Xie 2023's domain-reweighting shape, deterministic loss "
        "proxy): per-source unigram cross-entropy against the corpus "
        "LM (explode + one vocab aggregate + one join), excess over "
        "the best source, w ∝ token-share·exp(η·excess) renormalized. "
        "The windows at the end run over the |sources|-row bounded "
        "frame (q109 discipline).  Scale: one token-keyed shuffle "
        "builds the LM, one join scores — the reweight itself is "
        "|sources| rows of driver-free arithmetic"
    ),
)
def q286(spark, sf_dir):
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id", "source", F.explode(_lower_tokens()).alias("t")
        )
    )
    from ..cache import track_persist

    tok = track_persist(tok)
    n = tok.count()  # bounded: one scalar (the corpus token count)
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    doc_loss = (
        tok.join(freq, "t")
        .groupBy("doc_id", "source")
        .agg(
            (
                -F.sum(F.log(F.col("cnt") * 1.0 / F.lit(n)))
                / F.count(F.lit(1))
            ).alias("ld")
        )
    )
    src = doc_loss.groupBy("source").agg(F.avg("ld").alias("loss"))
    share = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    from pyspark.sql import Window

    # bounded frame (one row per source): pseudo-partition on a
    # column-derived always-zero hash — the q109 discipline (a literal
    # would be constant-folded out of the window partition spec and
    # the plan audit would read a global window)
    bucket = F.pmod(F.xxhash64(F.col("source")), F.lit(1))
    w_all = Window.partitionBy(bucket)
    j = (
        src.join(share, "source")
        .withColumn("u", F.col("n_s") * 1.0 / F.lit(n))
        .withColumn(
            "excess", F.col("loss") - F.min("loss").over(w_all)
        )
    )
    w = j.withColumn(
        "w_raw", F.col("u") * F.exp(F.lit(_Q286_ETA) * F.col("excess"))
    )
    return (
        w.select(
            "source",
            F.round("u", 6).alias("baseline_share"),
            F.round("loss", 6).alias("xent_loss"),
            F.round("excess", 6).alias("excess_loss"),
            F.round(
                F.col("w_raw") / F.sum("w_raw").over(w_all), 6
            ).alias("new_weight"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q287 — cross-lingual template prefixes
# ---------------------------------------------------------------------------


@register(
    "q287_cross_lingual_templates",
    f"""
    WITH p AS (
        SELECT doc_id, lang,
               array_to_string(
                   list_slice({_Q285_TOKS_SQL}, 1, 8), ' ') AS prefix
        FROM documents
    )
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
           min(doc_id) AS first_doc
    FROM p GROUP BY prefix HAVING count(DISTINCT lang) > 1
    ORDER BY prefix
    """,
    doc=(
        "cross-lingual template detection: normalized 8-token "
        "prefixes appearing under MORE than one language — the "
        "translation-template / injected-boilerplate signal full-text "
        "exact dedup cannot see (the tails differ).  One groupBy on "
        "the prefix (a narrow projection feeds it), distinct-language "
        "count as the gate; langs listed sorted for a deterministic "
        "row.  Scale: one prefix-keyed shuffle of ~40-byte keys"
    ),
)
def q287(spark, sf_dir):
    p = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.array_join(F.slice(_lower_tokens(), 1, 8), " ").alias(
            "prefix"
        ),
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.array_join(
                F.sort_array(F.collect_set("lang")), ","
            ).alias("langs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_langs") > 1)
        .orderBy("prefix")
    )


# ---------------------------------------------------------------------------
# q288 — pack-efficiency audit
# ---------------------------------------------------------------------------


@register(
    "q288_pack_efficiency_audit",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS t
        FROM documents
    ), chunks AS (
        SELECT doc_id, t, unnest(
            [i for i in generate_series(
                1, greatest(len(t) - {_Q97_OVERLAP}, 1), {_Q97_STRIDE})]
        ) AS chunk_start
        FROM toks WHERE len(t) > 0
    ), sized AS (
        SELECT doc_id,
               CAST((chunk_start - 1) / {_Q97_STRIDE} AS INT) AS chunk_idx,
               CAST(len(t[chunk_start:chunk_start + {_Q97_SIZE} - 1]) AS INT)
                   AS chunk_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT)
                   % {_Q100_SHARDS} AS shard
        FROM chunks
    ), packed AS (
        SELECT shard,
               CAST(floor(coalesce(sum(chunk_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id, chunk_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_Q100_BUDGET}) AS BIGINT) AS pack_id,
               chunk_tokens
        FROM sized
    ), manifest AS (
        SELECT shard, pack_id,
               CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens
        FROM packed GROUP BY shard, pack_id
    ), lastp AS (
        SELECT shard, max(pack_id) AS last_pack FROM manifest
        GROUP BY shard
    )
    SELECT m.shard,
           CAST(count(*) AS BIGINT) AS n_packs,
           CAST(sum(m.n_tokens) AS BIGINT) AS total_tokens,
           round(avg(CASE WHEN m.pack_id < l.last_pack
                          THEN m.n_tokens * 1.0 / {_Q100_BUDGET} END), 6)
               AS avg_full_util,
           round(min(CASE WHEN m.pack_id < l.last_pack
                          THEN m.n_tokens * 1.0 / {_Q100_BUDGET} END), 6)
               AS min_full_util
    FROM manifest m JOIN lastp l USING (shard)
    GROUP BY m.shard ORDER BY m.shard
    """,
    doc=(
        "loader-side QA of the q97/q100 chunk→pack chain: per shard, "
        "pack count, total tokens, and the fill rate of every "
        "NON-FINAL pack (the final pack is legitimately underfull). "
        "Sequence packing that drifts below ~1.0 average utilization "
        "wastes training compute — this is the number a curator "
        "watches after changing chunk/budget settings.  Oracle "
        "replays the exact chunk/pack math (q100's CTEs) + the "
        "rollup; the engine reuses operators/chunking+packing, so "
        "the hash certifies the OPERATORS"
    ),
)
def q288(spark, sf_dir):
    from ..operators.chunking import chunk_documents
    from ..operators.packing import pack_chunks, pack_manifest

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_size=_Q97_SIZE,
        overlap=_Q97_OVERLAP,
    )
    packed = pack_chunks(
        chunks, budget=_Q100_BUDGET, num_shards=_Q100_SHARDS
    )
    m = pack_manifest(packed).select("shard", "pack_id", "n_tokens")
    lastp = m.groupBy("shard").agg(F.max("pack_id").alias("last_pack"))
    util = F.when(
        F.col("pack_id") < F.col("last_pack"),
        F.col("n_tokens") * 1.0 / F.lit(_Q100_BUDGET),
    )
    return (
        m.join(F.broadcast(lastp), "shard")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg(util), 6).alias("avg_full_util"),
            F.round(F.min(util), 6).alias("min_full_util"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q289 — quality-score calibration deciles
# ---------------------------------------------------------------------------

_Q289_PS = [i / 10.0 for i in range(1, 10)]

# q275's scored CTE rebuilt over raw documents (the shared block in
# queries_r10b keys on doc_id/source; reused verbatim) + the q59 rule
# gate's feature predicates inlined over the same rows.
_Q289_GATE_SQL = f"""
        (text IS NOT NULL
         AND len(regexp_split_to_array(trim(text), '\\s+')) >= 5
         AND (CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END) >= 0.5
         AND (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
              THEN CAST(len(list_filter(
                       regexp_split_to_array(trim(lower(text)), '\\s+'),
                       t -> list_contains({_STOP_EN_SQL}, t)))
                   AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\\s+'))
              ELSE 0.0 END) <= 0.7)
"""


@register(
    "q289_quality_calibration",
    f"""
    WITH {_Q275_SCORED_CTES}, gate AS (
        SELECT doc_id, {_Q289_GATE_SQL} AS rule_pass FROM documents
    ), cuts AS (
        SELECT quantile_cont(z, {_Q289_PS}) AS c FROM scored
    ), bucketed AS (
        SELECT s.doc_id, s.z, g.rule_pass,
               len(list_filter(cuts.c, x -> s.z >= x)) AS decile
        FROM scored s JOIN gate g USING (doc_id) CROSS JOIN cuts
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rule_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rule_pass,
           round(sum(CASE WHEN rule_pass THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS rule_pass_rate,
           round(avg(z), 6) AS avg_z
    FROM bucketed GROUP BY decile ORDER BY decile
    """,
    doc=(
        "reliability table for the q275 classifier against the q59 "
        "rule gate: classifier scores cut into GLOBAL deciles (q271's "
        "cut arithmetic — one 9-value broadcast, no per-row rank "
        "window), per-decile rule-gate pass rate.  A monotone table "
        "says the model ORDER agrees with the rules and a threshold "
        "can be picked per compute budget (the FineWeb-Edu "
        "threshold-sweep readout); inversions localize where model "
        "and rules disagree.  Scale: the q275 scorer's scan + two "
        "combines, one broadcast of the cuts"
    ),
)
def q289(spark, sf_dir):
    from ..operators import text as TXT
    from ..operators.quality_model import linear_score, quality_features

    d = _t(spark, sf_dir, "documents")
    z = linear_score(_Q275_W)
    scored = quality_features(d, "text", "doc_id").select(
        "doc_id", z.alias("z")
    )
    feats = TXT.quality_features("text")
    gate = d.select(
        "doc_id",
        (
            F.col("text").isNotNull()
            & (feats["n_tokens"] >= 5)
            & (feats["alpha_ratio"] >= 0.5)
            & (feats["stopword_ratio"] <= 0.7)
        ).alias("rule_pass"),
    )
    cuts = scored.agg(
        F.array(
            *[F.percentile("z", F.lit(p)) for p in _Q289_PS]
        ).alias("c")
    )
    bucketed = (
        scored.join(gate, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .withColumn("decile", F.expr("size(filter(c, x -> z >= x))"))
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("rule_pass").cast("int"))
            .cast("long")
            .alias("n_rule_pass"),
            F.round(
                F.sum(F.col("rule_pass").cast("int")) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("rule_pass_rate"),
            F.round(F.avg("z"), 6).alias("avg_z"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q290 — decontaminated eval-holdout split
# ---------------------------------------------------------------------------

_Q290_MOD = 20  # 1-in-20 docs → the eval split


@register(
    "q290_eval_holdout_split",
    f"""
    WITH marked AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5('hold' || CAST(doc_id AS VARCHAR)),
                                    1, 15)) AS BIGINT) % {_Q290_MOD} = 0
                   AS is_eval
        FROM documents
    ), toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS words
        FROM documents WHERE length(trim(text)) > 0
    ), sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(words) - 2),
                   i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                   AS shingle
        FROM toks WHERE len(words) >= 3
    ), eval_sh AS (
        SELECT DISTINCT shingle FROM sh
        JOIN marked USING (doc_id) WHERE marked.is_eval
    ), contaminated AS (
        SELECT DISTINCT s.doc_id FROM sh s
        JOIN marked m USING (doc_id)
        JOIN eval_sh e USING (shingle)
        WHERE NOT m.is_eval
    )
    SELECT m.source,
           CAST(sum(CASE WHEN m.is_eval THEN 1 ELSE 0 END) AS BIGINT)
               AS n_eval,
           CAST(sum(CASE WHEN NOT m.is_eval AND c.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_train_kept,
           CAST(sum(CASE WHEN NOT m.is_eval AND c.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_train_dropped
    FROM marked m LEFT JOIN contaminated c USING (doc_id)
    GROUP BY m.source ORDER BY m.source
    """,
    doc=(
        "the train/eval split a curator actually ships: a "
        f"deterministic 1-in-{_Q290_MOD} eval sample (portable md5 "
        "membership — the q19 sampling discipline), then every train "
        "doc sharing ANY word 3-gram with the eval split is dropped "
        "(q81's decontamination as the split guard), per-source "
        "accounting of eval/kept/dropped.  Plan: the shingle table "
        "builds once and feeds both branches through a persist "
        "barrier; the eval shingle set joins un-hinted, so AQE "
        "broadcasts it when it fits and shuffles the semi-join when "
        "an eval split of a 100 TB corpus doesn't.  Either way the "
        "work is train×eval — never train×train"
    ),
)
def q290(spark, sf_dir):
    from ..cache import track
    from ..operators.dedup_docs import portable_hash60

    d = _t(spark, sf_dir, "documents")
    marked = d.select(
        "doc_id",
        "source",
        (
            F.pmod(
                portable_hash60(
                    F.col("doc_id").cast("string"), "hold"
                ),
                F.lit(_Q290_MOD),
            )
            == 0
        ).alias("is_eval"),
    )
    toks = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.split(F.trim(F.lower("text")), r"\s+").alias("words"),
        )
        .filter(F.size("words") >= 3)
    )
    # shingles join as xxhash64 keys, not 40-byte strings — the q140
    # discipline: the query only tests shingle EQUALITY, so an 8-byte
    # key shrinks the persisted table and both joins (collision odds at
    # 64 bits are ~n²/2⁶⁵ — immaterial next to the float tolerances
    # every engine accepts); the ORACLE keeps raw strings, so the hash
    # gate still certifies the semantics
    sh = track(
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 2),
                    lambda i: F.xxhash64(
                        F.concat_ws(
                            " ",
                            F.get("words", i - 1),
                            F.get("words", i),
                            F.get("words", i + 1),
                        )
                    ),
                )
            ).alias("shingle"),
        ).persist()
    )
    eval_sh = (
        sh.join(marked.filter("is_eval"), "doc_id")
        .select("shingle")
        .distinct()
    )
    contaminated = (
        sh.join(marked.filter("NOT is_eval").select("doc_id"), "doc_id")
        # no broadcast HINT: the eval split is ~5% of the corpus, so
        # its shingle set is broadcastable at test scale but not at
        # 100 TB — AQE picks broadcast when the built side fits and a
        # shuffled semi-join when it doesn't
        .join(eval_sh, "shingle")
        .select("doc_id")
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        marked.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.col("is_eval").cast("int"))
            .cast("long")
            .alias("n_eval"),
            F.sum(
                (
                    ~F.col("is_eval")
                    & F.col("is_dropped").isNull()
                ).cast("int")
            )
            .cast("long")
            .alias("n_train_kept"),
            F.sum(
                (
                    ~F.col("is_eval")
                    & F.col("is_dropped").isNotNull()
                ).cast("int")
            )
            .cast("long")
            .alias("n_train_dropped"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q291 — mixing quality curve
# ---------------------------------------------------------------------------


@register(
    "q291_mixing_quality_curve",
    f"""
    WITH {_Q275_SCORED_CTES}, src AS (
        SELECT source,
               CAST(sum(n_toks) AS BIGINT) AS src_tokens,
               round(avg(z), 6) AS src_quality,
               sum(z * n_toks) AS zw
        FROM scored GROUP BY source
    ), tot AS (
        SELECT sum(src_tokens) AS t FROM src
    ), curve AS (
        SELECT source, src_quality, src_tokens,
               sum(src_tokens) OVER (
                   ORDER BY src_quality DESC, source ASC
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens,
               sum(zw) OVER (
                   ORDER BY src_quality DESC, source ASC
                   ROWS UNBOUNDED PRECEDING) AS cum_zw
        FROM src
    )
    SELECT source, src_quality, src_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           round(cum_tokens * 1.0 / tot.t, 6) AS cum_share,
           round(cum_zw / cum_tokens, 6) AS cum_quality
    FROM curve CROSS JOIN tot
    ORDER BY src_quality DESC, source
    """,
    doc=(
        "the data-mixing budget curve: sources ranked by mean q275 "
        "classifier score (rounded BEFORE ordering — the float "
        "discipline), cumulative token count/share and token-weighted "
        "mean quality at each prefix — how much budget buys how much "
        "quality when admitting sources best-first.  The windows run "
        "over the |sources|-row bounded frame (q109's pseudo-"
        "partition discipline on the Spark side).  Scale: the q275 "
        "scorer aggregates per source; the curve itself is |sources| "
        "rows"
    ),
)
def q291(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.quality_model import linear_score, quality_features

    d = _t(spark, sf_dir, "documents")
    z = linear_score(_Q275_W)
    scored = quality_features(d, "text", "doc_id").select(
        F.col("doc_id"),
        F.col("n").cast("long").alias("n_toks"),
        z.alias("z"),
    ).join(d.select("doc_id", "source"), "doc_id")
    src = scored.groupBy("source").agg(
        F.sum("n_toks").cast("long").alias("src_tokens"),
        F.round(F.avg("z"), 6).alias("src_quality"),
        F.sum(F.col("z") * F.col("n_toks")).alias("zw"),
    )
    bucket = F.pmod(F.xxhash64(F.col("source")), F.lit(1))
    w_cum = (
        Window.partitionBy(bucket)
        .orderBy(F.col("src_quality").desc(), F.col("source").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(bucket)
    return (
        src.select(
            "source",
            "src_quality",
            "src_tokens",
            F.sum("src_tokens").over(w_cum).cast("long").alias("cum_tokens"),
            F.round(
                F.sum("src_tokens").over(w_cum)
                * 1.0
                / F.sum("src_tokens").over(w_all),
                6,
            ).alias("cum_share"),
            F.round(
                F.sum("zw").over(w_cum)
                / F.sum("src_tokens").over(w_cum),
                6,
            ).alias("cum_quality"),
        )
        .orderBy(F.col("src_quality").desc(), "source")
    )


# ---------------------------------------------------------------------------
# q292 — residual IVF-PQ ADC top-k (FAISS IVFPQ layout, round-11)
# ---------------------------------------------------------------------------

_Q292_DIM, _Q292_M, _Q292_K = 64, 4, 8
_Q292_NLIST, _Q292_NPROBE, _Q292_TOPK = 4, 2, 5
_Q292_SALT = "q292pq"


def _q292_cents() -> list[list[float]]:
    from ..operators.pq import pq_codebooks_random

    return pq_codebooks_random(
        _Q292_DIM, 1, _Q292_NLIST, salt=_Q292_SALT + "cent"
    )[0]


def _q292_cbs():
    from ..operators.pq import pq_codebooks_random

    return pq_codebooks_random(
        _Q292_DIM, _Q292_M, _Q292_K, salt=_Q292_SALT
    )


def _q292_oracle() -> str:
    """DuckDB re-derives the ENTIRE residual-IVFPQ pipeline from the
    same deterministic floats: cosine cell assignment (struct-sort, tie
    → low id), residual = v − centroid[cell], per-subspace argmin
    codes, and the residual-ADC cosine through the SAME
    `_residual_tables` norm constants (computed once in Python,
    inlined as identical literals in both engines).  Float chains are
    sequenced exactly like the Spark folds (leading 0.0, left-assoc),
    so the hash gate certifies the operator's algebra."""
    from ..operators.pq import _residual_tables

    cents = _q292_cents()
    cbs = _q292_cbs()
    cnorm2, cross = _residual_tables(cents, cbs)
    ds = _Q292_DIM // _Q292_M
    nl, m_, k_ = _Q292_NLIST, _Q292_M, _Q292_K

    def dlist(fl):
        return (
            "CAST(["
            + ", ".join(repr(float(x)) for x in fl)
            + "] AS DOUBLE[])"
        )

    # per-cell negative cosine columns (the assignment keys)
    nc_cols = ",\n               ".join(
        f"-(list_dot_product(v, {dlist(cents[j])})"
        f" / (sqrt(list_dot_product(v, v))"
        f" * sqrt(list_dot_product({dlist(cents[j])}, {dlist(cents[j])}))))"
        f" AS nc{j}"
        for j in range(nl)
    )
    sort_list = (
        "["
        + ", ".join(f"{{'n': nc{j}, 'i': {j}}}" for j in range(nl))
        + "]"
    )

    def cent_case(cell_expr: str) -> str:
        whens = " ".join(
            f"WHEN {j} THEN {dlist(cents[j])}" for j in range(nl)
        )
        return f"(CASE {cell_expr} {whens} END)"

    # residual subvectors of the corpus side
    sub_cols = ", ".join(
        f"r[{mi * ds + 1}:{(mi + 1) * ds}] AS s{mi}" for mi in range(m_)
    )
    diff_cols = ",\n               ".join(
        f"[s{mi}[i] - ({dlist(cbs[mi][ki])})[i]"
        f" for i in generate_series(1, {ds})] AS f_{mi}_{ki}"
        for mi in range(m_)
        for ki in range(k_)
    )
    d2_cols = ",\n               ".join(
        f"list_dot_product(f_{mi}_{ki}, f_{mi}_{ki}) AS d_{mi}_{ki}"
        for mi in range(m_)
        for ki in range(k_)
    )

    def code_col(mi):
        dsl = "[" + ", ".join(f"d_{mi}_{ki}" for ki in range(k_)) + "]"
        return f"list_position({dsl}, list_min({dsl})) - 1 AS c{mi}"

    code_cols = ",\n               ".join(code_col(mi) for mi in range(m_))

    def cb_case(mi, code_expr):
        whens = " ".join(
            f"WHEN {ki} THEN {dlist(cbs[mi][ki])}" for ki in range(k_)
        )
        return f"(CASE {code_expr} {whens} END)"

    # numerator: qcdot + (0.0 + Σ_m qtab[m][code_m]) — the Spark fold's
    # exact sequencing
    num_terms = " + ".join(
        f"list_dot_product(q.qv[{mi * ds + 1}:{(mi + 1) * ds}],"
        f" {cb_case(mi, f'c.c{mi}')})"
        for mi in range(m_)
    )

    def cross_case(mi):
        whens = " ".join(
            f"WHEN {j} THEN {dlist(cross[j][mi])}" for j in range(nl)
        )
        return f"(CASE c.cell {whens} END)[c.c{mi} + 1]"

    rnorm_terms = " + ".join(cross_case(mi) for mi in range(m_))
    cn_case = (
        "(CASE c.cell "
        + " ".join(f"WHEN {j} THEN {cnorm2[j]!r}" for j in range(nl))
        + " END)"
    )
    qc_case_terms = " ".join(
        f"WHEN {j} THEN list_dot_product(qv, {dlist(cents[j])})"
        for j in range(nl)
    )

    return f"""
    WITH base AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), celld AS (
        SELECT vec_id, v,
               {nc_cols}
        FROM base
    ), cells AS (
        SELECT vec_id, v,
               list_sort({sort_list})[1].i AS cell
        FROM celld
    ), res AS (
        SELECT vec_id, cell,
               [v[i] - {cent_case("cell")}[i]
                for i in generate_series(1, {_Q292_DIM})] AS r
        FROM cells
    ), subs AS (
        SELECT vec_id, cell, {sub_cols} FROM res
    ), diffs AS (
        SELECT vec_id, cell,
               {diff_cols}
        FROM subs
    ), d2 AS (
        SELECT vec_id, cell,
               {d2_cols}
        FROM diffs
    ), codes AS (
        SELECT vec_id, cell,
               {code_cols}
        FROM d2
    ), qprobe AS (
        SELECT vec_id AS q_id, v AS qv,
               unnest(list_transform(
                   list_sort({sort_list})[1:{_Q292_NPROBE}],
                   s -> s.i)) AS cell
        FROM celld WHERE vec_id % 97 = 0
    ), qside AS (
        SELECT q_id, qv, cell,
               (CASE cell {qc_case_terms} END) AS qcdot,
               sqrt(list_dot_product(qv, qv)) AS qnorm
        FROM qprobe
    ), scored AS (
        SELECT q.q_id, c.vec_id,
               round((q.qcdot + (CAST(0.0 AS DOUBLE) + {num_terms}))
                     / (q.qnorm
                        * sqrt({cn_case}
                               + (CAST(0.0 AS DOUBLE) + {rnorm_terms}))),
                     6) AS adc_sim
        FROM qside q JOIN codes c ON c.cell = q.cell
    )
    SELECT q_id, vec_id, adc_sim,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT q_id, vec_id, adc_sim,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY adc_sim DESC, vec_id ASC) AS rank
        FROM scored
    ) WHERE rank <= {_Q292_TOPK}
    ORDER BY q_id, rank
    """


@register(
    "q292_ivf_pq_residual_topk",
    _q292_oracle(),
    doc=(
        "residual IVF-PQ ADC top-k — the FAISS IVFPQ layout "
        "(operators/pq.py::ivf_pq_topk(residual=True)): cosine "
        "nearest-centroid cells, codes quantizing vec − "
        "centroid[cell] (residuals cluster near the origin, so the "
        "same codebook budget reconstructs far more densely — "
        "reconstruction-error and recall gains pinned in "
        "tests/test_pq_residual.py), scoring through driver-side "
        "cross/norm tables so every corpus row still costs M array "
        "lookups.  The oracle re-derives assignment, residual "
        "encoding and the full norm algebra from the same "
        "deterministic floats.  Scale: one corpus scan encodes; the "
        "probe join moves nprobe/nlist of the code table; codes are a "
        "pure function of the vector so streaming appends agree with "
        "batch bit-for-bit"
    ),
)
def q292(spark, sf_dir):
    from ..operators.pq import ivf_pq_topk

    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
    )
    return (
        ivf_pq_topk(
            queries,
            e,
            _q292_cbs(),
            k=_Q292_TOPK,
            nlist=_Q292_NLIST,
            nprobe=_Q292_NPROBE,
            centroids=_q292_cents(),
            residual=True,
        )
        .select(
            "q_id", "vec_id", "adc_sim", F.col("rank").cast("int").alias("rank")
        )
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# q293 — language-ID confusion matrix (the eval harness for q51)
# ---------------------------------------------------------------------------


@register(
    "q293_lang_id_confusion",
    None,  # placeholder, replaced below via late import of _LANG_SQL
    doc="",  # set below
)
def q293(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators import text as TXT

    d = _t(spark, sf_dir, "documents")
    guessed = d.select(
        F.col("lang").alias("labeled_lang"),
        TXT.lang_id("text").alias("lang_guess"),
    )
    cells = guessed.groupBy("labeled_lang", "lang_guess").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    bucket = F.pmod(F.xxhash64(F.col("labeled_lang")), F.lit(1))
    w_label = Window.partitionBy("labeled_lang")
    w_all = Window.partitionBy(bucket)
    return (
        cells.select(
            "labeled_lang",
            "lang_guess",
            "n_docs",
            F.round(
                F.col("n_docs") * 1.0 / F.sum("n_docs").over(w_label), 6
            ).alias("row_frac"),
            F.round(
                F.sum(
                    F.when(
                        F.col("labeled_lang") == F.col("lang_guess"),
                        F.col("n_docs"),
                    ).otherwise(F.lit(0))
                ).over(w_all)
                * 1.0
                / F.sum("n_docs").over(w_all),
                6,
            ).alias("overall_accuracy"),
        )
        .orderBy("labeled_lang", "lang_guess")
    )


def _q293_finalize():
    """Compose the oracle on q51's shared _LANG_SQL block (late import
    avoids a circular module-load order dependency)."""
    from .queries import REGISTRY
    from .queries_ext import _LANG_SQL

    spec = REGISTRY["q293_lang_id_confusion"]
    oracle = f"""
    WITH guessed AS ({_LANG_SQL}), cells AS (
        SELECT labeled_lang, lang_guess,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM guessed GROUP BY labeled_lang, lang_guess
    )
    SELECT labeled_lang, lang_guess, n_docs,
           round(n_docs * 1.0 / sum(n_docs) OVER (
               PARTITION BY labeled_lang), 6) AS row_frac,
           round(sum(CASE WHEN labeled_lang = lang_guess
                          THEN n_docs ELSE 0 END) OVER ()
                 * 1.0 / sum(n_docs) OVER (), 6) AS overall_accuracy
    FROM cells ORDER BY labeled_lang, lang_guess
    """
    doc = (
        "language-ID confusion matrix — the eval harness for the q51 "
        "heuristic: per (labeled, guessed) cell count, within-label "
        "fraction, and overall accuracy, all over the |langs|²-bounded "
        "cell frame (windows follow the q109 pseudo-partition "
        "discipline).  A curator reads this before trusting lang-based "
        "mixture weights.  Scale: one groupBy of ≤|langs|² cells ends "
        "the data-sized work"
    )
    REGISTRY["q293_lang_id_confusion"] = type(spec)(
        spec.builder, oracle, doc
    )


_q293_finalize()


# ---------------------------------------------------------------------------
# q294 — embedding-norm outlier audit
# ---------------------------------------------------------------------------


@register(
    "q294_embedding_norm_outliers",
    """
    WITH norms AS (
        SELECT vec_id, label,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[])))
                   AS nrm
        FROM embeddings
    ), stats AS (
        SELECT avg(nrm) AS mu,
               stddev_samp(nrm) AS sd,
               count(*) AS n
        FROM norms
    )
    SELECT vec_id, label,
           round(nrm, 6) AS nrm,
           round((nrm - mu) / sd, 4) AS z
    FROM norms CROSS JOIN stats
    WHERE abs((nrm - mu) / sd) > 2.0
    ORDER BY vec_id
    """,
    doc=(
        "embedding QA: L2-norm z-score outliers (|z| > 2) — the cheap "
        "detector for truncated/corrupt/wrong-model vectors before "
        "they poison ANN indexes or semantic dedup (un-normalized "
        "norms vary smoothly; a failed encode shows up as a norm "
        "spike or near-zero).  One scan computes norms, one 3-value "
        "aggregate broadcasts back — embarrassingly parallel at any "
        "scale.  Spark's stddev_samp and DuckDB's are the same "
        "merge-able moments formula; z rounded to 4 before the "
        "driver hash"
    ),
)
def q294(spark, sf_dir):
    from ..operators.similarity import as_double, l2_norm

    e = _t(spark, sf_dir, "embeddings")
    norms = e.select(
        "vec_id",
        "label",
        l2_norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    stats = norms.agg(
        F.avg("nrm").alias("mu"),
        F.stddev_samp("nrm").alias("sd"),
    )
    return (
        norms.crossJoin(F.broadcast(stats))
        .withColumn("z", F.round((F.col("nrm") - F.col("mu")) / F.col("sd"), 4))
        .filter(F.abs((F.col("nrm") - F.col("mu")) / F.col("sd")) > 2.0)
        .select(
            "vec_id", "label", F.round("nrm", 6).alias("nrm"), "z"
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# q295 — LSH band-sweep S-curve (the b×r tuning readout)
# ---------------------------------------------------------------------------

_Q295_K = 16
_Q295_CONFIGS = (2, 4, 8, 16)  # band counts; rows/band = K/bands


def _q295_oracle() -> str:
    from .queries_r2 import _Q90_MH

    def detected(nb: int) -> str:
        r = _Q295_K // nb
        bands = []
        for b in range(nb):
            comps = " AND ".join(
                f"sa.mh{b * r + k} = sb.mh{b * r + k}" for k in range(r)
            )
            bands.append(f"({comps})")
        return "(" + " OR ".join(bands) + ")"

    unioned = "\n        UNION ALL\n".join(
        f"""SELECT {nb} AS bands, jband,
               CASE WHEN {detected(nb)} THEN 1 ELSE 0 END AS det
        FROM pairs JOIN sig sa ON sa.id = id_a
                   JOIN sig sb ON sb.id = id_b"""
        for nb in _Q295_CONFIGS
    )
    return f"""
    WITH sh AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM (
            SELECT doc_id,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM documents
        )
    ), inv AS (
        SELECT id, unnest(s) AS shingle FROM sh
    ), sig AS (
        SELECT id,
               {_Q90_MH}
        FROM inv GROUP BY id
    ), cap AS (
        SELECT greatest(4, CAST(ceil(0.01 * count(*)) AS INT)) AS c
        FROM documents
    ), hot AS (
        SELECT shingle FROM inv GROUP BY shingle
        HAVING count(*) > (SELECT c FROM cap)
    ), kept AS (
        SELECT id, shingle FROM inv
        WHERE shingle NOT IN (SELECT shingle FROM hot)
    ), cand AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM kept x JOIN kept y USING (shingle)
        WHERE x.id < y.id
    ), pairs AS (
        SELECT id_a, id_b,
               least(4, CAST(floor(
                   round(len(list_intersect(sha.s, shb.s)) * 1.0
                         / len(list_distinct(list_concat(sha.s, shb.s))),
                         6) * 5) AS INT)) AS jband
        FROM cand
        JOIN sh sha ON sha.id = id_a
        JOIN sh shb ON shb.id = id_b
    ), swept AS (
        {unioned}
    )
    SELECT bands, jband,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(det) AS BIGINT) AS n_detected,
           round(sum(det) * 1.0 / count(*), 6) AS detect_rate,
           (SELECT CAST(count(*) AS BIGINT) FROM hot)
               AS hot_shingles_dropped
    FROM swept GROUP BY bands, jband
    ORDER BY bands, jband
    """


@register(
    "q295_lsh_band_sweep",
    _q295_oracle(),
    doc=(
        "the LSH S-curve, measured: for every band layout b×r over the "
        f"{_Q295_K}-component MinHash signature "
        f"(b ∈ {list(_Q295_CONFIGS)}), the fraction of "
        "shingle-sharing pairs DETECTED as candidates, bucketed by "
        "exact Jaccard (5 bands of 0.2) — the 1-(1-j^r)^b curve as "
        "data, which is how b and r are actually chosen before a "
        "production dedup run (more bands → catches lower-j pairs → "
        "more verify work; this table shows the trade).  Detection is "
        "a per-pair expression over the shared signature columns — "
        "the sweep re-uses ONE signature table and never re-bands the "
        "corpus; the shingle table is persisted once and feeds "
        "signatures, the pair index and the exact verify.  Portable "
        "md5 hashes make every stage DuckDB-reproducible.  The pair "
        "index carries q53's df-cap (relative: shingles in > "
        "max(4, 1% of docs) documents are dropped before the self-"
        "join, dropped count reported per row) so a viral 3-gram can "
        "never explode the candidate join at corpus scale; the sweep "
        "itself adds only per-pair flag math"
    ),
)
def q295(spark, sf_dir):
    import math

    from ..cache import track_persist
    from ..operators.dedup_docs import _drop_hot_shingles, minhash_signatures, shingle_table

    d = _t(spark, sf_dir, "documents")
    sh = track_persist(shingle_table(d, "text", "doc_id", 3))
    sigs = minhash_signatures(
        d, num_hashes=_Q295_K, shingles=sh, portable=True
    )
    # df-capped candidate index (round-11 VERDICT What's wrong #2):
    # inv⋈inv is O(df²) rows per shingle — a stopword 3-gram shared by
    # 1% of a 100 TB corpus makes the uncapped join a job-killer.  The
    # S-curve is an estimation readout, so the production shape is a
    # capped sample of hot-shingle pairs: shingles in more than
    # max(4, ⌈1% of corpus⌉) docs are dropped from the PAIR INDEX only
    # (signatures and the exact-Jaccard verify still use full shingle
    # sets), and the drop is accounted in every output row
    # (hot_shingles_dropped) — same discipline as q53's df_cap
    # (dedup_docs.py::_drop_hot_shingles), relative cap so the fraction
    # of corpus a shingle may touch is scale-invariant.  Join keys are
    # xxhash64(shingle) (8-byte shuffle, q140/q290 precedent); the
    # oracle joins raw strings.  ACCEPTED COLLISION RISK (round-12
    # ADVICE): unlike q140/q290, the hashed key here feeds an
    # oracle-compared count (n_pairs) — a 64-bit collision could merge
    # two shingles' df counts or fabricate a candidate pair.  The
    # exposure is ~d²/2^65 per shingle pair (<<1e-9 at any bench SF),
    # and a fabricated candidate still has its EXACT Jaccard recomputed
    # from full shingle sets below, so only the (already heuristic)
    # df-cap boundary could shift.  Documented as accepted rather than
    # re-verified against raw strings, which would re-shuffle the full
    # string shingles and defeat the 8-byte-key point.
    cap = max(4, math.ceil(0.01 * d.count()))
    inv = sh.select("id", F.explode("sh").alias("__s")).select(
        "id", F.xxhash64("__s").alias("shingle")
    )
    # NOTE: track_persist persists — no inner .persist() (the
    # double-persist cache.py::track warns about, round-12 ADVICE)
    hot = track_persist(
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > cap)
        .select("shingle")
    )
    n_hot = hot.count()
    kept = inv.join(F.broadcast(hot), "shingle", "left_anti")
    cand = (
        kept.alias("x")
        .hint("shuffle_hash")
        .join(kept.alias("y"), "shingle")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")
        )
        .distinct()
    )
    sha = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.least(
                F.lit(4),
                F.floor(
                    F.round(
                        F.size(F.array_intersect("sh_a", "sh_b")) * 1.0
                        / F.size(F.array_union("sh_a", "sh_b")),
                        6,
                    )
                    * 5
                ).cast("int"),
            ).alias("jband"),
        )
    )
    sa = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh{k}").alias(f"a{k}") for k in range(_Q295_K)],
    )
    sb = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh{k}").alias(f"b{k}") for k in range(_Q295_K)],
    )
    joined = pairs.join(sa, "id_a").join(sb, "id_b")

    def detected(nb: int):
        r = _Q295_K // nb
        expr = None
        for b in range(nb):
            band = None
            for k in range(r):
                c = F.col(f"a{b * r + k}") == F.col(f"b{b * r + k}")
                band = c if band is None else band & c
            expr = band if expr is None else expr | band
        return expr

    swept = joined.select(
        "jband",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nb).alias("bands"),
                        detected(nb).cast("int").alias("det"),
                    )
                    for nb in _Q295_CONFIGS
                ]
            )
        ).alias("cfg"),
    ).select("jband", "cfg.bands", "cfg.det")
    return (
        swept.groupBy("bands", "jband")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("det").cast("long").alias("n_detected"),
            F.round(
                F.sum("det") * 1.0 / F.count(F.lit(1)), 6
            ).alias("detect_rate"),
        )
        .withColumn(
            "hot_shingles_dropped", F.lit(n_hot).cast("long")
        )
        .orderBy("bands", "jband")
    )


# ---------------------------------------------------------------------------
# q296 — vocabulary coverage curve (tokenizer sizing readout)
# ---------------------------------------------------------------------------

_Q296_KS = (100, 1000, 10000)


@register(
    "q296_vocab_coverage_curve",
    f"""
    WITH tok AS (
        SELECT unnest({_Q285_TOKS_SQL}) AS t FROM documents
    ), freq AS (
        SELECT t, count(*) AS cnt FROM tok GROUP BY t
    ), tot AS (
        SELECT sum(cnt) AS n, count(*) AS v FROM freq
    ), ranked AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, t ASC) AS rnk
        FROM freq
    ), cum AS (
        SELECT rnk, sum(cnt) OVER (ORDER BY rnk
                   ROWS UNBOUNDED PRECEDING) AS cum_cnt
        FROM ranked
    )
    SELECT k.k AS vocab_size,
           CAST(tot.v AS BIGINT) AS distinct_tokens,
           round(coalesce(
               (SELECT max(cum_cnt) FROM cum WHERE rnk <= k.k),
               0) * 1.0 / tot.n, 6) AS coverage
    FROM (SELECT unnest({list(_Q296_KS)}) AS k) k CROSS JOIN tot
    ORDER BY vocab_size
    """,
    doc=(
        "vocabulary coverage curve — the tokenizer-sizing readout: the "
        "fraction of all token INSTANCES covered by the k most "
        "frequent types, for k ∈ "
        f"{list(_Q296_KS)} (how BPE vocab budgets and UNK rates are "
        "actually estimated before a q266-style train).  Ranks are "
        "assigned on the top-k survivors only (TakeOrdered + the "
        "bounded single-range assigner — no global rank window over "
        "the full vocabulary); coverage sums are exact integers until "
        "the final division.  Scale: one token-keyed aggregate, then "
        "k-bounded work"
    ),
)
def q296(spark, sf_dir):
    from ..operators.keys import with_surrogate_key

    tok = _t(spark, sf_dir, "documents").select(
        F.explode(_lower_tokens()).alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    totals = freq.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v")
    )
    kmax = max(_Q296_KS)
    top = freq.orderBy(F.col("cnt").desc(), F.col("t").asc()).limit(kmax)
    ranked = with_surrogate_key(
        top.withColumn("neg_cnt", -F.col("cnt")),
        ["neg_cnt", "t"],
        id_col="rnk",
        num_partitions=1,
    )
    per_k = ranked.select(
        "cnt",
        F.explode(
            F.array(*[F.lit(k) for k in _Q296_KS])
        ).alias("vocab_size"),
    ).filter(F.col("rnk") <= F.col("vocab_size"))
    cov = per_k.groupBy("vocab_size").agg(
        F.sum("cnt").alias("cum_cnt")
    )
    ks = _t(spark, sf_dir, "documents").sparkSession.createDataFrame(
        [(k,) for k in _Q296_KS], "vocab_size int"
    )
    return (
        ks.join(cov, "vocab_size", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "vocab_size",
            F.col("v").cast("long").alias("distinct_tokens"),
            F.round(
                F.coalesce(F.col("cum_cnt"), F.lit(0)) * 1.0
                / F.col("n"),
                6,
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


# ---------------------------------------------------------------------------
# q297 — rule-gate vs model-gate agreement (Cohen's kappa)
# ---------------------------------------------------------------------------


@register(
    "q297_gate_agreement_kappa",
    f"""
    WITH {_Q275_SCORED_CTES}, gate AS (
        SELECT doc_id, {_Q289_GATE_SQL} AS rule_pass FROM documents
    ), both_v AS (
        SELECT g.rule_pass, s.z > 0 AS model_pass
        FROM gate g JOIN scored s USING (doc_id)
    ), cnt AS (
        SELECT count(*) AS n,
               sum(CASE WHEN rule_pass AND model_pass THEN 1 ELSE 0 END) AS tp,
               sum(CASE WHEN rule_pass AND NOT model_pass THEN 1 ELSE 0 END) AS fn,
               sum(CASE WHEN NOT rule_pass AND model_pass THEN 1 ELSE 0 END) AS fp,
               sum(CASE WHEN NOT rule_pass AND NOT model_pass THEN 1 ELSE 0 END) AS tn
        FROM both_v
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(tp AS BIGINT) AS both_pass,
           CAST(tn AS BIGINT) AS both_cut,
           CAST(fn AS BIGINT) AS rule_only,
           CAST(fp AS BIGINT) AS model_only,
           round((tp + tn) * 1.0 / n, 6) AS observed_agreement,
           round(
               ((tp + tn) * 1.0 / n
                - ((tp + fn) * 1.0 / n * ((tp + fp) * 1.0 / n)
                   + (tn + fp) * 1.0 / n * ((tn + fn) * 1.0 / n)))
               / (1.0
                  - ((tp + fn) * 1.0 / n * ((tp + fp) * 1.0 / n)
                     + (tn + fp) * 1.0 / n * ((tn + fn) * 1.0 / n))),
               6) AS cohens_kappa
    FROM cnt
    """,
    doc=(
        "Cohen's kappa between the q59 rule gate and the q275 model "
        "gate — the single-number agreement readout next to q289's "
        "per-decile calibration: kappa near 0 says the classifier "
        "adds an independent signal, near 1 says it re-implements the "
        "rules and one of the two is redundant; the 2×2 cell counts "
        "localize the disagreement.  One scan through the shared "
        "scorer CTEs + one 5-value aggregate; the kappa float chain "
        "is written identically in both engines over exact integer "
        "cells"
    ),
)
def q297(spark, sf_dir):
    from ..operators import text as TXT
    from ..operators.quality_model import linear_score, quality_features

    d = _t(spark, sf_dir, "documents")
    z = linear_score(_Q275_W)
    scored = quality_features(d, "text", "doc_id").select(
        "doc_id", (z > 0).alias("model_pass")
    )
    feats = TXT.quality_features("text")
    gate = d.select(
        "doc_id",
        (
            F.col("text").isNotNull()
            & (feats["n_tokens"] >= 5)
            & (feats["alpha_ratio"] >= 0.5)
            & (feats["stopword_ratio"] <= 0.7)
        ).alias("rule_pass"),
    )
    b = gate.join(scored, "doc_id")
    cnt = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("rule_pass") & F.col("model_pass")).cast("int")).alias("tp"),
        F.sum((F.col("rule_pass") & ~F.col("model_pass")).cast("int")).alias("fn"),
        F.sum((~F.col("rule_pass") & F.col("model_pass")).cast("int")).alias("fp"),
        F.sum((~F.col("rule_pass") & ~F.col("model_pass")).cast("int")).alias("tn"),
    )
    n, tp, fn, fp, tn = (F.col(c) for c in ("n", "tp", "fn", "fp", "tn"))
    po = (tp + tn) * 1.0 / n
    pe = (
        (tp + fn) * 1.0 / n * ((tp + fp) * 1.0 / n)
        + (tn + fp) * 1.0 / n * ((tn + fn) * 1.0 / n)
    )
    return cnt.select(
        n.cast("long").alias("n_docs"),
        tp.cast("long").alias("both_pass"),
        tn.cast("long").alias("both_cut"),
        fn.cast("long").alias("rule_only"),
        fp.cast("long").alias("model_only"),
        F.round(po, 6).alias("observed_agreement"),
        F.round((po - pe) / (1.0 - pe), 6).alias("cohens_kappa"),
    )


# ---------------------------------------------------------------------------
# q298 — duplicate-family size histogram
# ---------------------------------------------------------------------------


from .queries_ext import _DUPED_SQL as _Q298_DUPED  # noqa: E402


@register(
    "q298_dup_family_histogram",
    f"""
    WITH fam AS (
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS h,
               count(*) AS family_size
        FROM ({_Q298_DUPED}) GROUP BY h
    )
    SELECT CAST(family_size AS INT) AS family_size,
           CAST(count(*) AS BIGINT) AS n_families,
           CAST(count(*) * family_size AS BIGINT) AS n_docs,
           CAST(count(*) * (family_size - 1) AS BIGINT) AS n_redundant
    FROM fam GROUP BY family_size
    ORDER BY family_size
    """,
    doc=(
        "exact-duplicate family-size histogram — the dedup REPORT next "
        "to q52's survivor list: how many normalized-content families "
        "exist at each multiplicity, how many docs they hold, and how "
        "many are redundant (family_size − 1 each) — the number a "
        "curator quotes as 'dedup would remove N%'.  Two aggregates, "
        "both partial-merging; the second groups |distinct sizes| "
        "rows.  Normalization matches q52/q59 (lower + whitespace "
        "collapse + md5)"
    ),
)
def q298(spark, sf_dir):
    from .queries_ext import _duped_docs

    d = _duped_docs(spark, sf_dir)
    fam = d.groupBy(
        F.md5(
            F.trim(
                F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
            )
        ).alias("h")
    ).agg(F.count(F.lit(1)).alias("family_size"))
    return (
        fam.groupBy("family_size")
        .agg(F.count(F.lit(1)).alias("nf"))
        .select(
            F.col("family_size").cast("int").alias("family_size"),
            F.col("nf").cast("long").alias("n_families"),
            (F.col("nf") * F.col("family_size"))
            .cast("long")
            .alias("n_docs"),
            (F.col("nf") * (F.col("family_size") - 1))
            .cast("long")
            .alias("n_redundant"),
        )
        .orderBy("family_size")
    )
