"""Round-4 query batch (q163-q174): corpus screening, sketch algebra,
dataset governance, and sampling surfaces — blocklist screening, KMV
source-overlap, incremental cross-corpus dedup, curriculum bins, dataset
card, label-quality kappa, ExactSubstr pairs, mixture budget solver, RFM
segmentation, embedding-dim correlation, FK-integrity audit, and
weighted sampling without replacement.

Registered into the shared REGISTRY (plans/queries.py) like every other
batch; oracle discipline identical — alias parity, ROUND on doubles,
deterministic token semantics shared with q29/q50.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..cache import track
from ..operators.text import blocklist_stats
from .queries import _t, register

# The word-list gate every web-corpus pipeline runs before the (1000×
# costlier) ML toxicity classifiers.  The synthetic corpus is benign word
# soup, so the "bad words" here are ordinary tokens chosen to give the
# screen real selectivity at every SF.
_BLOCKLIST = ["slow", "spill", "skew", "leak"]


@register(
    "q163_blocklist_screen",
    """
    WITH toks AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
    ), scored AS (
        SELECT doc_id, source,
               CAST(len(list_filter(t,
                    x -> list_contains(['slow','spill','skew','leak'], x)))
                    AS BIGINT) AS n_blocked,
               round(len(list_filter(t,
                    x -> list_contains(['slow','spill','skew','leak'], x)))
                     / CAST(greatest(len(t), 1) AS DOUBLE), 6)
                   AS blocked_frac
        FROM toks
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_blocked >= 3 OR blocked_frac > 0.08
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
           CAST(sum(n_blocked) AS BIGINT) AS total_blocked,
           round(avg(blocked_frac), 6) AS avg_blocked_frac
    FROM scored
    GROUP BY source
    """,
    doc=(
        "word-blocklist screening (the C4-style 'bad words' gate): "
        "per-doc blocked-token counts/fractions from one codegen'd "
        "projection (list literal + array_contains, zero Python), rolled "
        "up per source with the quarantine rule n_blocked >= 3 OR "
        "blocked_frac > 0.08.  At 100 TB the scan is the whole cost — "
        "the rollup shuffles |sources| tiny rows"
    ),
)
def q163(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_blocked, frac = blocklist_stats("text", _BLOCKLIST)
    scored = d.select(
        "source",
        n_blocked.alias("n_blocked"),
        frac.alias("blocked_frac"),
    )
    quarantine = (F.col("n_blocked") >= 3) | (F.col("blocked_frac") > 0.08)
    return scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(quarantine, 1).otherwise(0))
        .cast("long")
        .alias("n_quarantined"),
        F.sum("n_blocked").cast("long").alias("total_blocked"),
        F.round(F.avg("blocked_frac"), 6).alias("avg_blocked_frac"),
    )


# ---------------------------------------------------------------------------
# q164 — KMV sketch ALGEBRA: union/intersection/Jaccard estimates between
# sources, verified against exact set sizes (extends q128's single-set KMV)
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_HEX = 13  # 52 bits: exactly representable in a double in both engines
_KMV_SRCS = ("src0", "src1", "src2", "src3")


@register(
    "q164_kmv_source_overlap",
    f"""
    WITH w AS (
        SELECT source, regexp_split_to_array(trim(lower(text)), '\\s+') AS words
        FROM documents
        WHERE length(trim(text)) > 0
          AND source IN ('src0','src1','src2','src3')
    ), b AS (
        SELECT DISTINCT source,
               unnest(list_transform(generate_series(1, len(words) - 1),
                                     i -> words[i] || ' ' || words[i + 1]))
                   AS bg
        FROM w WHERE len(words) >= 2
    ), hv AS (
        SELECT source, bg,
               ('0x' || substr(md5(bg), 1, {_KMV_HEX}))::BIGINT AS h
        FROM b
    ), prs AS (
        SELECT x.source AS src_a, y.source AS src_b
        FROM (SELECT DISTINCT source FROM hv) x
        JOIN (SELECT DISTINCT source FROM hv) y ON x.source < y.source
    ), exact_inter AS (
        SELECT t1.source AS src_a, t2.source AS src_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM b t1 JOIN b t2 ON t1.bg = t2.bg AND t1.source < t2.source
        GROUP BY 1, 2
    ), sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1
    ), merged AS (
        SELECT p.src_a, p.src_b, h.h, h.bg,
               row_number() OVER (
                   PARTITION BY p.src_a, p.src_b ORDER BY h.h, h.bg) AS rn
        FROM prs p
        JOIN (SELECT DISTINCT src_a, src_b, h, bg FROM (
                 SELECT p2.src_a, p2.src_b, h.h, h.bg
                 FROM prs p2 JOIN hv h
                   ON h.source IN (p2.src_a, p2.src_b)) ) h
          ON h.src_a = p.src_a AND h.src_b = p.src_b
    ), topk AS (
        SELECT * FROM merged WHERE rn <= {_KMV_K}
    ), scored AS (
        SELECT t.src_a, t.src_b,
               CAST(count(*) AS BIGINT) AS k_seen,
               max(t.h) AS kth,
               CAST(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM b ba
                        WHERE ba.source = t.src_a AND ba.bg = t.bg)
                        AND EXISTS (
                        SELECT 1 FROM b bb
                        WHERE bb.source = t.src_b AND bb.bg = t.bg)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        FROM topk t GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b,
           sa.n + sb.n - ei.exact_inter AS exact_union,
           ei.exact_inter,
           CASE WHEN s.k_seen < {_KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                ELSE round(({_KMV_K} - 1) * power(16.0, {_KMV_HEX})
                           / s.kth, 2) END AS est_union,
           round(s.n_both / CAST(s.k_seen AS DOUBLE), 6) AS jaccard_est
    FROM scored s
    JOIN exact_inter ei ON ei.src_a = s.src_a AND ei.src_b = s.src_b
    JOIN sizes sa ON sa.source = s.src_a
    JOIN sizes sb ON sb.source = s.src_b
    """,
    doc=(
        "KMV sketch ALGEBRA between source vocabularies (the segment- "
        "overlap question every dataset-mixing decision asks): per-source "
        "k-minimum-values sketches of the distinct bigram space merge by "
        "keeping the k smallest of the union (est_union = (k-1)/kth), and "
        "the fraction of merged-sketch members present in BOTH sides "
        "estimates Jaccard — est_intersection = jaccard_est × est_union "
        "follows by algebra, so it is not a separate column.  md5-52-bit "
        "hashes make every sketch value engine-neutral: the oracle "
        "verifies kth hashes and membership counts exactly, alongside "
        "the exact union/intersection ground truth.  At 100 TB only "
        "k×|sources| scalars ever merge — the same reason q128's "
        "per-segment sketches beat recount-on-every-rollup"
    ),
)
def q164(spark, sf_dir):
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .filter(F.col("source").isin(*_KMV_SRCS))
        .select(
            "source",
            F.split(F.trim(F.lower("text")), r"\s+").alias("words"),
        )
        .filter(F.size("words") >= 2)
    )
    b = (
        d.select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - 1),
                    lambda i: F.concat_ws(
                        " ", F.get("words", i - 1), F.get("words", i)
                    ),
                )
            ).alias("bg"),
        )
        .distinct()
        .persist()
    )
    b = track(b)
    hv = b.withColumn(
        "h",
        F.conv(F.substring(F.md5("bg"), 1, _KMV_HEX), 16, 10).cast("long"),
    )
    srcs = b.select("source").distinct()
    prs = (
        srcs.alias("x")
        .join(srcs.alias("y"), F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
    )
    merged = (
        F.broadcast(prs)
        .join(
            hv,
            (F.col("source") == F.col("src_a"))
            | (F.col("source") == F.col("src_b")),
        )
        .select("src_a", "src_b", "h", "bg")
        .distinct()
    )
    wk = Window.partitionBy("src_a", "src_b").orderBy("h", "bg")
    # persisted: topk (≤ C(4,2)·k rows) feeds tk, in_a/in_b AND the final
    # flagged join — without it the prs×hv distinct + window re-executes
    # per consumer
    topk = (
        merged.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KMV_K)
        .persist()
    )
    topk = track(topk)
    # membership flags: broadcast the k-BOUNDED sketch rows (≤ C(4,2)·k)
    # against the big vocabulary table — never the other way around (the
    # vocabulary is unbounded at corpus scale)
    tk = topk.select("src_a", "src_b", "bg")
    bm = b.select(
        F.col("source").alias("__src"), F.col("bg").alias("__bbg")
    )
    in_a = (
        bm.join(
            F.broadcast(tk),
            (F.col("__src") == F.col("src_a"))
            & (F.col("__bbg") == F.col("bg")),
        )
        .select("src_a", "src_b", "bg")
        .withColumn("__a", F.lit(1))
    )
    in_b = (
        bm.join(
            F.broadcast(tk),
            (F.col("__src") == F.col("src_b"))
            & (F.col("__bbg") == F.col("bg")),
        )
        .select("src_a", "src_b", "bg")
        .withColumn("__b", F.lit(1))
    )
    flagged = topk.join(
        F.broadcast(in_a), ["src_a", "src_b", "bg"], "left"
    ).join(F.broadcast(in_b), ["src_a", "src_b", "bg"], "left")
    scored = flagged.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("k_seen"),
        F.max("h").alias("kth"),
        F.sum(
            F.when(F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_both"),
    )
    exact_inter = (
        b.alias("t1")
        .join(
            b.alias("t2"),
            (F.col("t1.bg") == F.col("t2.bg"))
            & (F.col("t1.source") < F.col("t2.source")),
        )
        .groupBy(
            F.col("t1.source").alias("src_a"),
            F.col("t2.source").alias("src_b"),
        )
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    sizes = b.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    return (
        scored.join(exact_inter, ["src_a", "src_b"])
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"),
                                     F.col("n").alias("na"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"),
                                     F.col("n").alias("nb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            (F.col("na") + F.col("nb") - F.col("exact_inter")).alias(
                "exact_union"
            ),
            "exact_inter",
            F.when(
                F.col("k_seen") < _KMV_K, F.col("k_seen").cast("double")
            )
            .otherwise(
                F.round(
                    F.lit(float(_KMV_K - 1)) * F.pow(F.lit(16.0), _KMV_HEX)
                    / F.col("kth"),
                    2,
                )
            )
            .alias("est_union"),
            F.round(
                F.col("n_both") / F.col("k_seen").cast("double"), 6
            ).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# q165 — incremental cross-corpus dedup (batch form of the steady-state
# ingestion problem: dedupe the new crawl AGAINST the corpus, never
# corpus × corpus)
# ---------------------------------------------------------------------------


@register(
    "q165_dedup_incoming_batch",
    """
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0
    ), incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
    ), nfp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM incoming
    ), cfp AS (
        SELECT DISTINCT
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM corpus
    ), stage1 AS (
        SELECT i.doc_id, i.text FROM incoming i
        JOIN nfp ON nfp.doc_id = i.doc_id
        WHERE NOT EXISTS (SELECT 1 FROM cfp WHERE cfp.fp = nfp.fp)
    ), shn AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM (SELECT doc_id, regexp_split_to_array(
                  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                  '\\s+') AS t FROM stage1)
    ), sho AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM (SELECT doc_id, regexp_split_to_array(
                  trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                  '\\s+') AS t FROM corpus)
    ), invn AS (SELECT id, len(s) AS sz, unnest(s) AS shingle FROM shn),
       invo AS (SELECT id, len(s) AS sz, unnest(s) AS shingle FROM sho),
    dup AS (
        SELECT DISTINCT a.id
        FROM (
            SELECT a.id, a.sz AS sa, b.sz AS sb, count(*) AS inter
            FROM invn a JOIN invo b USING (shingle)
            GROUP BY 1, 2, 3
        ) a
        WHERE inter / CAST(sa + sb - inter AS DOUBLE) >= 0.8
    )
    SELECT s.doc_id, length(s.text) AS n_chars
    FROM stage1 s
    WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.id = s.doc_id)
    """,
    doc=(
        "steady-state ingestion dedup: the incoming slice (doc_id % 4 = "
        "0) is deduped AGAINST the existing corpus — exact fingerprint "
        "anti-join, then a near-dup anti-join whose inverted-index join "
        "only ever pairs incoming × corpus (cost O(|new|·overlap), "
        "independent of |corpus|²; all-pairs re-dedup would re-pay the "
        "old×old work on every crawl).  The streaming twin maintains the "
        "fingerprint store incrementally"
    ),
)
def q165(spark, sf_dir):
    from ..operators.dedup_docs import dedup_incoming

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    incoming = d.filter(F.col("doc_id") % 4 == 0)
    out = dedup_incoming(incoming, corpus, threshold=0.8)
    return out.select(
        "doc_id", F.length("text").cast("int").alias("n_chars")
    )


# ---------------------------------------------------------------------------
# q166 — curriculum quality bins (quartile cut-points of the composite
# quality score → per-bin doc counts / token budgets, the table a
# quality-ordered training curriculum or mixing schedule reads)
# ---------------------------------------------------------------------------


@register(
    "q166_curriculum_quality_bins",
    """
    WITH feats AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         / CAST(length(text) AS DOUBLE)
                    ELSE 0.0 END AS alpha_ratio,
               CASE WHEN length(text) > 0
                    THEN length(regexp_replace(text,
                                               '[^\\.,;:!\\?''"]', '', 'g'))
                         / CAST(length(text) AS DOUBLE)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                    THEN CAST(len(list_filter(
                             regexp_split_to_array(trim(lower(text)), '\\s+'),
                             t -> list_contains(
                                 ['the','a','of','and','is','to','in'], t)))
                         AS DOUBLE)
                         / len(regexp_split_to_array(trim(text), '\\s+'))
                    ELSE 0.0 END AS stopword_ratio
        FROM documents
    ), q AS (
        SELECT doc_id, n_tokens,
               round(0.3 * alpha_ratio
                     + 0.3 * least(stopword_ratio * 5.0, 1.0)
                     + 0.3 * least(n_tokens / 100.0, 1.0)
                     + 0.1 * (1.0 - least(punct_ratio * 10.0, 1.0)),
                     6) AS quality
        FROM feats
    ), cuts AS (
        SELECT quantile_cont(quality, [0.25, 0.5, 0.75]) AS qs FROM q
    )
    SELECT CAST(1 + len(list_filter(qs, c -> c < quality)) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(quality), 6) AS avg_quality,
           round(min(quality), 6) AS lo,
           round(max(quality), 6) AS hi
    FROM q CROSS JOIN cuts
    GROUP BY 1
    """,
    doc=(
        "curriculum / mixing-schedule table: composite quality score "
        "(q50's features with q59's fixed weights) bucketed by exact "
        "quartile cut-points from ONE partial-merging aggregate (the "
        "q111 discipline — cut-points broadcast back as a 1-row frame, "
        "bucket = count of cut-points strictly below; never a global "
        "NTILE), with per-bin doc counts and whitespace-token budgets — "
        "what a quality-ascending curriculum or a mix-by-quality sampler "
        "consumes.  Scan-dominated at 100 TB; the rollup is 4 rows"
    ),
)
def q166(spark, sf_dir):
    from ..operators.text import quality_features, quality_score

    d = _t(spark, sf_dir, "documents")
    feats = quality_features("text")
    q = d.select(
        "doc_id",
        feats["n_tokens"].cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )
    cuts = q.agg(
        F.percentile(
            "quality", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("qs")
    )
    bin_col = (
        1 + F.size(F.filter(F.col("qs"), lambda c: c < F.col("quality")))
    ).cast("int")
    return (
        q.join(F.broadcast(cuts))
        .select(bin_col.alias("bin"), "n_tokens", "quality")
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.round(F.min("quality"), 6).alias("lo"),
            F.round(F.max("quality"), 6).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# q167 — dataset card: the per-slice stats manifest every corpus release
# ships (counts, token budgets, length distribution, dup exposure)
# ---------------------------------------------------------------------------


@register(
    "q167_dataset_card",
    """
    WITH base AS (
        SELECT doc_id, lang, source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               length(text) AS n_chars,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    ), dup AS (
        SELECT fp, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY fp
    )
    SELECT b.lang, b.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(b.n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(b.n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(b.n_tokens) AS BIGINT) AS max_tokens,
           round(avg(b.n_tokens), 4) AS avg_tokens,
           CAST(sum(b.n_chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN d.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_dup_docs
    FROM base b JOIN dup d ON d.fp = b.fp
    GROUP BY 1, 2
    """,
    doc=(
        "dataset card (the release-manifest table: what goes in the "
        "README of every corpus drop): per (lang, source) slice — doc "
        "counts, whitespace-token budgets, length range/mean, char "
        "volume, and exact-duplicate exposure (docs whose normalized "
        "fingerprint appears more than once corpus-wide).  One scan + "
        "one fingerprint aggregate + one slice rollup; every stage "
        "partial-aggregates, so 100 TB reduces map-side"
    ),
)
def q167(spark, sf_dir):
    from ..operators.text import fingerprint_md5, token_count

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        fingerprint_md5("text").alias("fp"),
    )
    dup = base.groupBy("fp").agg(F.count("*").cast("long").alias("n"))
    return (
        base.join(dup, "fp")
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exact_dup_docs"),
        )
    )


# ---------------------------------------------------------------------------
# q168 — label / centroid-prediction agreement (Cohen's kappa): the label-
# quality audit run before trusting a labeled embedding set
# ---------------------------------------------------------------------------


@register(
    "q168_label_centroid_kappa",
    """
    WITH ev AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), comp AS (
        SELECT label, u.pos, avg(u.x) AS m
        FROM ev, LATERAL (SELECT unnest(v) AS x,
                                 generate_subscripts(v, 1) AS pos) u
        GROUP BY label, u.pos
    ), cent AS (
        SELECT label AS clabel,
               list_transform(
                   list_sort(list({'pos': pos, 'm': m})),
                   s -> round(s.m, 6)) AS cv
        FROM comp GROUP BY label
    ), scored AS (
        SELECT e.vec_id, e.label, c.clabel,
               round(list_dot_product(e.v, c.cv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
        FROM ev e CROSS JOIN cent c
    ), pred AS (
        SELECT vec_id, label, clabel AS pred FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, clabel ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    ), mt AS (SELECT label AS c, CAST(count(*) AS BIGINT) AS n_true
              FROM pred GROUP BY 1),
       mp AS (SELECT pred AS c, CAST(count(*) AS BIGINT) AS n_pred
              FROM pred GROUP BY 1),
       tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_agree
        FROM pred
    ), pe AS (
        SELECT sum(coalesce(mt.n_true, 0) * coalesce(mp.n_pred, 0)) AS s
        FROM mt FULL JOIN mp ON mt.c = mp.c
    )
    SELECT tot.n AS n_vectors, tot.n_agree,
           round(tot.n_agree / CAST(tot.n AS DOUBLE), 6) AS observed,
           round(pe.s / CAST(tot.n * tot.n AS DOUBLE), 6) AS expected,
           round((tot.n_agree / CAST(tot.n AS DOUBLE)
                  - pe.s / CAST(tot.n * tot.n AS DOUBLE))
                 / (1.0 - pe.s / CAST(tot.n * tot.n AS DOUBLE)), 6)
               AS kappa
    FROM tot CROSS JOIN pe
    """,
    doc=(
        "label-quality audit via chance-corrected agreement: per-class "
        "mean centroids (components ROUNDED to 6 so the distributed avg "
        "and a serial engine agree bit-for-bit), nearest-centroid "
        "prediction by rounded cosine with label tiebreak, then Cohen's "
        "kappa between given labels and predictions — kappa ≈ 0 means "
        "the labels carry no geometric signal, the pre-training sanity "
        "check for any labeled embedding set.  Complements q146 (which "
        "flags individual suspect rows; this scores the labeling as a "
        "whole).  The crossJoin is |vectors| × |classes| with the "
        "class-centroid side broadcast — linear in the corpus"
    ),
)
def q168(spark, sf_dir):
    from ..operators.similarity import as_double, cosine

    e = _t(spark, sf_dir, "embeddings")
    ev = e.select("vec_id", "label", as_double("embedding").alias("v"))
    comp = (
        ev.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
    )
    cent = comp.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: F.round(s["m"], 6),
        ).alias("cv")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("clabel").asc()
    )
    pred = (
        ev.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "clabel",
            F.round(cosine(F.col("v"), F.col("cv")), 6).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("clabel").alias("pred"))
    )
    mt = pred.groupBy(F.col("label").alias("c")).agg(
        F.count("*").cast("long").alias("n_true")
    )
    mp = pred.groupBy(F.col("pred").alias("c")).agg(
        F.count("*").cast("long").alias("n_pred")
    )
    tot = pred.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("label") == F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    pe = (
        mt.join(mp, "c", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("n_true"), F.lit(0))
                * F.coalesce(F.col("n_pred"), F.lit(0))
            ).alias("s")
        )
    )
    n = F.col("n").cast("double")
    observed = F.col("n_agree") / n
    expected = F.col("s") / (n * n)
    return (
        tot.crossJoin(F.broadcast(pe))
        .select(
            F.col("n").alias("n_vectors"),
            "n_agree",
            F.round(observed, 6).alias("observed"),
            F.round(expected, 6).alias("expected"),
            F.round((observed - expected) / (1.0 - expected), 6).alias(
                "kappa"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q169 — exact-substring duplication pairs (the ExactSubstr shape from
# "Deduplicating Training Data Makes Language Models Better": docs sharing
# long verbatim runs, which Jaccard under-weights)
# ---------------------------------------------------------------------------


@register(
    "q169_exact_substring_pairs",
    """
    WITH sh AS (
        SELECT doc_id AS id,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 19, 1)),
                   i -> list_aggregate(list_slice(t, i, i + 19),
                                       'string_agg', ' '))) AS s
        FROM (
            SELECT doc_id,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM documents
        )
    ), inv AS (
        SELECT id, unnest(s) AS g FROM sh
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(count(*) AS BIGINT) AS n_shared_20grams
    FROM inv a JOIN inv b USING (g)
    WHERE a.id < b.id
    GROUP BY 1, 2
    """,
    doc=(
        "verbatim-run duplication pairs: documents sharing at least one "
        "exact 20-token window, with the count of shared distinct "
        "20-grams — the ExactSubstr complement to shingle Jaccard "
        "(a long quoted passage inside an otherwise-different doc "
        "scores near zero on Jaccard but is exactly what copyright / "
        "memorization screens must catch).  Same inverted-index shape "
        "as q53 with n=20: a 20-gram is so selective that the index "
        "join only ever matches genuinely copied runs, so the pair "
        "space stays tiny at any corpus size (hot-window df_cap "
        "available via the same guard as q53 if boilerplate runs long)"
    ),
)
def q169(spark, sf_dir):
    from ..operators.dedup_docs import fan_out, word_shingles

    d = _t(spark, sf_dir, "documents")
    sh = fan_out(d).select(
        F.col("doc_id").alias("id"), word_shingles("text", 20).alias("s")
    )
    # persisted: the self-join reads the index twice and Catalyst does
    # not reuse non-identical exchanges (the q53 lesson — measured 4×)
    inv = track(sh.select("id", F.explode("s").alias("__g")).select(
        "id", F.xxhash64("__g").alias("g")
    ).persist())
    return (
        inv.alias("a")
        .hint("shuffle_hash")
        .join(inv.alias("b"), on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_shared_20grams"))
    )


# ---------------------------------------------------------------------------
# q170 — training-mixture token-budget solver: the config table every
# mixture schedule is built from
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = [
    ("src0", 0.4), ("src1", 0.3), ("src2", 0.2), ("src3", 0.1),
]
_MIX_BUDGET = 100_000  # target training tokens across the mixture


@register(
    "q170_mixture_budget_solver",
    f"""
    WITH avail AS (
        SELECT source,
               CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                    AS BIGINT) AS available_tokens
        FROM documents
        WHERE source IN ('src0','src1','src2','src3')
        GROUP BY source
    ), w(source, target_weight) AS (
        VALUES ('src0', 0.4), ('src1', 0.3), ('src2', 0.2), ('src3', 0.1)
    )
    SELECT a.source, a.available_tokens,
           CAST(w.target_weight AS DOUBLE) AS target_weight,
           CAST(round(w.target_weight * {_MIX_BUDGET}, 0) AS BIGINT)
               AS desired_tokens,
           round(least(1.0, w.target_weight * {_MIX_BUDGET}
                            / a.available_tokens), 6) AS sampling_rate,
           round(w.target_weight * {_MIX_BUDGET}
                 / a.available_tokens, 6) AS repeat_epochs,
           CAST(round(least(1.0, w.target_weight * {_MIX_BUDGET}
                                 / a.available_tokens)
                      * a.available_tokens, 0) AS BIGINT)
               AS expected_tokens_no_repeat
    FROM avail a JOIN w ON w.source = a.source
    """,
    doc=(
        "dataset-mixture budget solver: per-source available whitespace "
        "tokens vs target mixture weights over a global token budget — "
        "sampling rate (capped at 1.0), repeat epochs when a source is "
        "smaller than its slice wants (rate > 1 means upsampling), and "
        "the no-repeat token yield.  This is the config table a "
        "temperature/weighted sampler (q98/q137) consumes; one "
        "partial-aggregating scan plus a 4-row broadcast join"
    ),
)
def q170(spark, sf_dir):
    from ..operators.text import token_count

    d = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin(*[s for s, _ in _MIX_WEIGHTS])
    )
    avail = d.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("available_tokens")
    )
    w = d.sparkSession.createDataFrame(
        _MIX_WEIGHTS, "source string, target_weight double"
    )
    desired = F.col("target_weight") * F.lit(float(_MIX_BUDGET))
    ratio = desired / F.col("available_tokens")
    rate = F.least(F.lit(1.0), ratio)
    return avail.join(F.broadcast(w), "source").select(
        "source",
        "available_tokens",
        "target_weight",
        F.round(desired, 0).cast("long").alias("desired_tokens"),
        F.round(rate, 6).alias("sampling_rate"),
        F.round(ratio, 6).alias("repeat_epochs"),
        F.round(rate * F.col("available_tokens"), 0)
        .cast("long")
        .alias("expected_tokens_no_repeat"),
    )


# ---------------------------------------------------------------------------
# q171 — RFM customer segmentation (recency / frequency / monetary tercile
# scores via broadcast cut-points — the q111/q166 discipline, never NTILE)
# ---------------------------------------------------------------------------


@register(
    "q171_rfm_segmentation",
    """
    WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
    rfm AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate), anchor.maxd)
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders, anchor GROUP BY o_custkey, anchor.maxd
    ), cuts AS (
        SELECT quantile_cont(recency_days, [1.0/3, 2.0/3]) AS rq,
               quantile_cont(frequency,  [1.0/3, 2.0/3]) AS fq,
               quantile_cont(monetary,   [1.0/3, 2.0/3]) AS mq
        FROM rfm
    ), scored AS (
        SELECT o_custkey,
               CAST(3 - len(list_filter(cuts.rq, c -> c < recency_days))
                    AS INT) AS r_score,
               CAST(1 + len(list_filter(cuts.fq, c -> c < frequency))
                    AS INT) AS f_score,
               CAST(1 + len(list_filter(cuts.mq, c -> c < monetary))
                    AS INT) AS m_score,
               monetary
        FROM rfm CROSS JOIN cuts
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(monetary), 2) AS segment_revenue
    FROM scored GROUP BY 1, 2, 3
    """,
    doc=(
        "RFM segmentation (the marketing-analytics staple): per-customer "
        "recency (days since last order vs corpus max date), frequency, "
        "monetary — each scored 1-3 by tercile cut-points from one "
        "partial-merging quantile aggregate broadcast back (q111/q166 "
        "discipline; recency score inverted so 3 = most recent; never a "
        "global NTILE), rolled up to segment sizes and revenue.  The "
        "only shuffles are the per-customer aggregate and the 27-row "
        "rollup"
    ),
)
def q171(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        o.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("maxd"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count("*").cast("long").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    cuts = rfm.agg(
        F.percentile(
            "recency_days", F.array(F.lit(1.0 / 3), F.lit(2.0 / 3))
        ).alias("rq"),
        F.percentile(
            "frequency", F.array(F.lit(1.0 / 3), F.lit(2.0 / 3))
        ).alias("fq"),
        F.percentile(
            "monetary", F.array(F.lit(1.0 / 3), F.lit(2.0 / 3))
        ).alias("mq"),
    )
    below = lambda arr, v: F.size(
        F.filter(F.col(arr), lambda c: c < F.col(v))
    )
    return (
        rfm.crossJoin(F.broadcast(cuts))
        .select(
            (3 - below("rq", "recency_days")).cast("int").alias("r_score"),
            (1 + below("fq", "frequency")).cast("int").alias("f_score"),
            (1 + below("mq", "monetary")).cast("int").alias("m_score"),
            "monetary",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("segment_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q172 — embedding dimension correlation (PCA-prep / feature-redundancy):
# top correlated dim pairs from one pair-moment aggregation
# ---------------------------------------------------------------------------

_COV_DIM = 64


@register(
    "q172_embedding_dim_correlation",
    """
    WITH u AS (
        SELECT vec_id, s.pos - 1 AS i, CAST(s.x AS DOUBLE) AS x
        FROM embeddings,
             LATERAL (SELECT unnest(embedding) AS x,
                             generate_subscripts(embedding, 1) AS pos) s
    ), m AS (
        SELECT i, avg(x) AS mi, avg(x * x) AS mii,
               CAST(count(*) AS BIGINT) AS n
        FROM u GROUP BY i
    ), pm AS (
        SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS mij
        FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i < b.i
        GROUP BY 1, 2
    ), scored AS (
        SELECT pm.i, pm.j,
               round(pm.mij - ma.mi * mb.mi, 6) AS cov,
               round((pm.mij - ma.mi * mb.mi)
                     / sqrt((ma.mii - ma.mi * ma.mi)
                            * (mb.mii - mb.mi * mb.mi)), 6) AS corr
        FROM pm JOIN m ma ON ma.i = pm.i JOIN m mb ON mb.i = pm.j
    )
    SELECT i, j, cov, corr FROM scored
    ORDER BY abs(corr) DESC, i ASC, j ASC
    LIMIT 20
    """,
    doc=(
        "feature-redundancy audit over the embedding space (the PCA-prep "
        "question — which dimensions carry duplicated signal): population "
        "covariance/correlation for all dim pairs from per-dim moments "
        "plus ONE pair-product aggregation, top-20 by |corr| via "
        "orderBy+limit.  Per-row pair products explode to dim·(dim-1)/2 "
        "rows but partial aggregation collapses them to one (i,j) cell "
        "per partition map-side, so the shuffle is 2016 rows regardless "
        "of corpus size — the covariance never touches a driver loop"
    ),
)
def q172(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    # element access on the RAW attribute array (O(1) per get) — casting
    # via transform() first would re-inline the whole cast array per
    # element inside the nested lambdas (the CollapseProject trap)
    # outer index stops at DIM-2: F.sequence(start, stop) flips to a
    # DESCENDING range when start > stop, so i = DIM-1 would fabricate a
    # (DIM-1, DIM-1) self-pair with corr 1.0 (caught by the oracle diff)
    idx = F.sequence(F.lit(0), F.lit(_COV_DIM - 2))
    pair_structs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i + 1, F.lit(_COV_DIM - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.get(F.col("embedding"), i).cast("double")
                        * F.get(F.col("embedding"), j).cast("double")
                    ).alias("xy"),
                ),
            ),
        )
    )
    pm = (
        e.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .agg(F.avg("p.xy").alias("mij"))
    )
    m = (
        e.select(F.posexplode("embedding").alias("pos", "__x"))
        .select("pos", F.col("__x").cast("double").alias("x"))
        .groupBy(F.col("pos").alias("i"))
        .agg(F.avg("x").alias("mi"), F.avg(F.col("x") * F.col("x")).alias("mii"))
    )
    ma = m.select(F.col("i").alias("__ai"), F.col("mi").alias("ma_mi"),
                  F.col("mii").alias("ma_mii"))
    mb = m.select(F.col("i").alias("__bi"), F.col("mi").alias("mb_mi"),
                  F.col("mii").alias("mb_mii"))
    cov = F.col("mij") - F.col("ma_mi") * F.col("mb_mi")
    corr = cov / F.sqrt(
        (F.col("ma_mii") - F.col("ma_mi") * F.col("ma_mi"))
        * (F.col("mb_mii") - F.col("mb_mi") * F.col("mb_mi"))
    )
    return (
        pm.join(F.broadcast(ma), F.col("i") == F.col("__ai"))
        .join(F.broadcast(mb), F.col("j") == F.col("__bi"))
        .select(
            "i", "j",
            F.round(cov, 6).alias("cov"),
            F.round(corr, 6).alias("corr"),
        )
        .orderBy(F.abs(F.col("corr")).desc(), F.col("i").asc(), F.col("j").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q173 — referential-integrity audit (the FK-orphan report every warehouse
# loads before trusting a join)
# ---------------------------------------------------------------------------


@register(
    "q173_fk_integrity_audit",
    """
    WITH checks AS (
        SELECT 'orders.o_custkey->customer' AS fk,
               CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM orders o
                     WHERE o.o_custkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT count(*) FROM orders
                     WHERE o_custkey IS NULL) AS BIGINT) AS n_null_keys
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               CAST((SELECT count(*) FROM lineitem) AS BIGINT),
               CAST((SELECT count(*) FROM lineitem l
                     WHERE l.l_orderkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM lineitem
                     WHERE l_orderkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               CAST((SELECT count(*) FROM customer) AS BIGINT),
               CAST((SELECT count(*) FROM customer c
                     WHERE c.c_nationkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM customer
                     WHERE c_nationkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'supplier.s_nationkey->nation',
               CAST((SELECT count(*) FROM supplier) AS BIGINT),
               CAST((SELECT count(*) FROM supplier s
                     WHERE s.s_nationkey IS NOT NULL
                       AND NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = s.s_nationkey))
                    AS BIGINT),
               CAST((SELECT count(*) FROM supplier
                     WHERE s_nationkey IS NULL) AS BIGINT)
    )
    SELECT fk, n_rows, n_orphans, n_null_keys,
           round(n_orphans / CAST(n_rows AS DOUBLE), 6) AS orphan_frac
    FROM checks
    """,
    doc=(
        "referential-integrity audit: orphan and null-key counts for "
        "every declared FK edge (orders→customer, lineitem→orders, "
        "customer→nation, supplier→nation) — the report run before "
        "trusting inner joins, since an inner join silently DROPS orphan "
        "rows.  Each check is ONE lazy aggregation over a left join "
        "marking parent hits (Catalyst picks broadcast vs shuffle by the "
        "parent's actual size — never a forced broadcast of an unbounded "
        "key set), and the four single-row frames union to the report; "
        "nothing executes until the caller acts"
    ),
)
def q173(spark, sf_dir):
    def check(fk, child, key, parent, pkey):
        hits = (
            parent.select(F.col(pkey).alias(key))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        return (
            child.select(key)
            .join(hits, key, "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.when(
                        F.col(key).isNotNull() & F.col("__hit").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_orphans"),
                F.sum(F.when(F.col(key).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null_keys"),
            )
            .select(F.lit(fk).alias("fk"), "*")
        )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    out = (
        check("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
        .unionByName(
            check("lineitem.l_orderkey->orders", li, "l_orderkey", o,
                  "o_orderkey")
        )
        .unionByName(
            check("customer.c_nationkey->nation", c, "c_nationkey", n,
                  "n_nationkey")
        )
        .unionByName(
            check("supplier.s_nationkey->nation", s, "s_nationkey", n,
                  "n_nationkey")
        )
    )
    return out.withColumn(
        "orphan_frac",
        F.round(F.col("n_orphans") / F.col("n_rows").cast("double"), 6),
    )


# ---------------------------------------------------------------------------
# q174 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
# the distributed one-pass complement of q105's systematic grid sampler
# ---------------------------------------------------------------------------

_ES_K = 100
_ES_HEX = 13  # 52-bit hash-uniform, exactly representable in a double


@register(
    "q174_weighted_sample_without_replacement",
    f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               round(pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                         1, {_ES_HEX}))::BIGINT
                         / power(16.0, {_ES_HEX}),
                         1.0 / n_chars), 9) AS es_key
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, es_key FROM keyed
    ORDER BY es_key DESC, doc_id ASC LIMIT {_ES_K}
    """,
    doc=(
        "Efraimidis–Spirakis A-Res weighted sampling without replacement "
        "(weight = n_chars): each row keys itself u^(1/w) with u a 52-bit "
        "md5 hash-uniform of its id — no RNG state, reproducible on any "
        "engine — and the sample is the top-k by key, taken with "
        "orderBy+limit (TakeOrderedAndProject: per-partition top-k, tiny "
        "combine, single pass, no global window).  Keys are ROUNDED to 9 "
        "before ranking with an id tiebreak (the q54 discipline) so a "
        "1-ulp libm pow() difference can't flip the boundary.  "
        "Complements q105's integer grid sampler: A-Res is the form that "
        "streams and merges (keep the k largest keys per partition)"
    ),
)
def q174(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, _ES_HEX),
        16, 10,
    ).cast("double") / F.pow(F.lit(16.0), _ES_HEX)
    key = F.round(
        F.pow(u, 1.0 / F.col("n_chars").cast("double")), 9
    )
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(_ES_K)
    )


# ---------------------------------------------------------------------------
# q175 — identity resolution (identity-graph stitching): users linked by
# RARE shared tokens unify into identity clusters via connected components
# ---------------------------------------------------------------------------

_IDR_MAX_USERS_PER_TOKEN = 3  # tokens shared this widely still count as
                              # identity evidence; busier tokens are ambient


@register(
    "q175_identity_resolution",
    f"""
    WITH RECURSIVE uk AS (
        SELECT DISTINCT user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                   % 60 AS k
        FROM events WHERE user_id IS NOT NULL
    ), rare AS (
        SELECT k FROM uk GROUP BY k
        HAVING count(*) BETWEEN 2 AND {_IDR_MAX_USERS_PER_TOKEN}
    ), pairs AS (
        SELECT DISTINCT a.user_id AS id_a, b.user_id AS id_b
        FROM uk a JOIN uk b ON a.k = b.k AND a.user_id < b.user_id
        WHERE a.k IN (SELECT k FROM rare)
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    ), comp AS (
        SELECT src AS user_id, min(dst) AS component
        FROM reach GROUP BY src
    ), all_users AS (
        SELECT DISTINCT user_id FROM uk
    ), assigned AS (
        SELECT u.user_id, coalesce(c.component, u.user_id) AS identity
        FROM all_users u LEFT JOIN comp c ON c.user_id = u.user_id
    ), ev AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    )
    SELECT a.identity,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(ev.n_events) AS BIGINT) AS n_events
    FROM assigned a JOIN ev ON ev.user_id = a.user_id
    GROUP BY a.identity
    HAVING count(*) > 1
    """,
    doc=(
        "identity-graph stitching (the cross-device resolution every "
        "analytics/ads stack runs): users sharing a RARE device token "
        "(synthesized deterministically as an md5 bucket of the user id "
        "— the test tables carry no real device ids, so the linkage "
        "signal is manufactured the way this registry manufactures all "
        "its dirt; a token on ≤3 distinct users is identity evidence, "
        "busier tokens are ambient and ignored) become "
        "edges, connected components unify them into identities, and "
        "multi-user identities report their merged user/event volumes.  "
        "The rare-token cap bounds edge fan-out exactly like q53's "
        "df_cap bounds shingles (a token shared by k users is k² edges); "
        "components run on the label-propagation operator with the "
        "large-star escape hatch documented (graph.py).  Oracled via "
        "the q92-style recursive-CTE closure"
    ),
)
def q175(spark, sf_dir):
    from ..operators.graph import connected_components

    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    uk = e.select(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 4),
                16, 10,
            ).cast("long")
            % 60
        ).alias("k"),
    ).distinct()
    rare = (
        uk.groupBy("k")
        .agg(F.count("*").alias("__n"))
        .filter(
            (F.col("__n") >= 2) & (F.col("__n") <= _IDR_MAX_USERS_PER_TOKEN)
        )
        .select("k")
    )
    linked = uk.join(F.broadcast(rare), "k")
    pairs = (
        linked.alias("a")
        .join(linked.alias("b"), on="k")
        .filter(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("id_a"),
            F.col("b.user_id").alias("id_b"),
        )
        .distinct()
    )
    comp = connected_components(pairs)
    assigned = (
        uk.select("user_id")
        .distinct()
        .join(
            comp.select(F.col("id").alias("user_id"), "component"), 
            "user_id",
            "left",
        )
        .select(
            "user_id",
            F.coalesce(F.col("component"), F.col("user_id")).alias(
                "identity"
            ),
        )
    )
    ev = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events")
    )
    return (
        assigned.join(ev, "user_id")
        .groupBy("identity")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .filter(F.col("n_users") > 1)
    )


# ---------------------------------------------------------------------------
# q176 — Theil index with between/within decomposition (the inequality
# measure that DECOMPOSES — complements q159's Gini scalar)
# ---------------------------------------------------------------------------


@register(
    "q176_theil_decomposition",
    """
    WITH cust AS (
        SELECT c.c_nationkey AS nation, o.o_custkey,
               sum(o.o_totalprice) AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
               avg(x) AS mu
        FROM cust
    ), overall AS (
        SELECT round(sum((x / tot.sx) * ln(x / tot.mu)), 6) AS t_total
        FROM cust CROSS JOIN tot
    ), grp AS (
        SELECT nation, CAST(count(*) AS BIGINT) AS ng, sum(x) AS sg,
               avg(x) AS mug
        FROM cust GROUP BY nation
    ), within AS (
        SELECT round(sum((c.x / t.sx) * ln(c.x / g.mug)), 6) AS t_within
        FROM cust c
        JOIN grp g ON g.nation = c.nation
        CROSS JOIN tot t
    ), between_g AS (
        SELECT round(sum((g.sg / t.sx) * ln(g.mug / t.mu)), 6) AS t_between
        FROM grp g CROSS JOIN tot t
    )
    SELECT o.t_total, w.t_within, b.t_between,
           round(o.t_total - (w.t_within + b.t_between), 6) AS residual
    FROM overall o CROSS JOIN within w CROSS JOIN between_g b
    """,
    doc=(
        "Theil-T inequality of per-customer revenue with the "
        "between/within-nation decomposition — the property Gini lacks: "
        "T_total = T_within + T_between exactly (residual emitted and "
        "expected ≈ 0, a built-in self-check both engines must agree "
        "on).  Answers 'is revenue concentration driven by differences "
        "BETWEEN markets or WITHIN them'.  Every term is a "
        "partial-aggregable sum over the |customers|-bounded aggregate; "
        "the per-group means arrive by broadcast join, no window anywhere"
    ),
)
def q176(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cust = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o["o_custkey"] == c["c_custkey"],
        )
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
        .persist()
    )
    cust = track(cust)
    tot = cust.agg(
        F.sum("x").alias("sx"), F.avg("x").alias("mu")
    )
    grp = cust.groupBy("nation").agg(
        F.sum("x").alias("sg"), F.avg("x").alias("mug")
    )
    t_total = (
        cust.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum((F.col("x") / F.col("sx")) * F.log(F.col("x") / F.col("mu"))),
                6,
            ).alias("t_total")
        )
    )
    t_within = (
        cust.join(F.broadcast(grp), "nation")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    (F.col("x") / F.col("sx")) * F.log(F.col("x") / F.col("mug"))
                ),
                6,
            ).alias("t_within")
        )
    )
    t_between = (
        grp.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.sum(
                    (F.col("sg") / F.col("sx")) * F.log(F.col("mug") / F.col("mu"))
                ),
                6,
            ).alias("t_between")
        )
    )
    return (
        t_total.crossJoin(F.broadcast(t_within))
        .crossJoin(F.broadcast(t_between))
        .select(
            "t_total",
            "t_within",
            "t_between",
            F.round(
                F.col("t_total") - (F.col("t_within") + F.col("t_between")),
                6,
            ).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# q177 — Herfindahl-Hirschman market concentration per nation
# ---------------------------------------------------------------------------


@register(
    "q177_hhi_concentration",
    """
    WITH rev AS (
        SELECT s.s_nationkey AS nation, l.l_suppkey,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS r
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT nation, sum(r) AS tr,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY nation
    )
    SELECT r.nation, t.n_suppliers,
           round(sum(pow(r.r / t.tr * 100, 2)), 4) AS hhi,
           round(max(r.r / t.tr), 6) AS top_share
    FROM rev r JOIN tot t ON t.nation = r.nation
    GROUP BY r.nation, t.n_suppliers
    """,
    doc=(
        "Herfindahl-Hirschman Index of supplier revenue concentration "
        "per nation (the antitrust/market-structure standard: sum of "
        "squared percentage shares; > 2500 = highly concentrated), with "
        "the largest single share alongside.  Shares need each "
        "supplier's revenue against its nation total — one broadcast "
        "join of the |nations|-bounded totals, every aggregate "
        "partial-merging"
    ),
)
def q177(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == s["s_suppkey"],
        )
        .groupBy(F.col("s_nationkey").alias("nation"), "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("r")
        )
        .persist()
    )
    rev = track(rev)
    tot = rev.groupBy("nation").agg(
        F.sum("r").alias("tr"),
        F.count("*").cast("long").alias("n_suppliers"),
    )
    share = F.col("r") / F.col("tr")
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation", "n_suppliers")
        .agg(
            F.round(F.sum(F.pow(share * 100, 2)), 4).alias("hhi"),
            F.round(F.max(share), 6).alias("top_share"),
        )
    )


# ---------------------------------------------------------------------------
# q178 — grouped ordinary least squares via co-moments (distributed
# regression without any ML library: slope/intercept/R² per group)
# ---------------------------------------------------------------------------


@register(
    "q178_discount_quantity_ols",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(covar_samp(l_discount, l_quantity)
                 / var_samp(l_discount), 6) AS slope,
           round(avg(l_quantity)
                 - covar_samp(l_discount, l_quantity) / var_samp(l_discount)
                   * avg(l_discount), 6) AS intercept,
           round(pow(corr(l_discount, l_quantity), 2), 6) AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "grouped simple linear regression (does discount move quantity?) "
        "from nothing but co-moment aggregates: slope = cov/var, "
        "intercept = ȳ − slope·x̄, R² = corr² — every term is a "
        "partial-aggregable sum of x, y, xy, x², y², so at 100 TB the "
        "regression reduces map-side to five scalars per group, the "
        "same shape as q156's correlation.  The pattern generalizes to "
        "any per-segment trend fit without MLlib round-trips"
    ),
)
def q178(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    slope = F.covar_samp("l_discount", "l_quantity") / F.var_samp(
        "l_discount"
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(
            F.avg("l_quantity") - slope * F.avg("l_discount"), 6
        ).alias("intercept"),
        F.round(
            F.pow(F.corr("l_discount", "l_quantity"), 2), 6
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# q179 — cohort LTV revenue matrix (q70's retention counts extended to the
# revenue-by-age table growth teams actually budget against)
# ---------------------------------------------------------------------------


@register(
    "q179_cohort_ltv_matrix",
    """
    WITH firsts AS (
        SELECT o_custkey,
               date_trunc('month', min(o_orderdate)) AS cohort_month
        FROM orders GROUP BY o_custkey
    ), aged AS (
        SELECT f.cohort_month,
               (extract(year FROM o.o_orderdate)
                - extract(year FROM f.cohort_month)) * 12
               + (extract(month FROM o.o_orderdate)
                  - extract(month FROM f.cohort_month)) AS age_months,
               o.o_totalprice, o.o_custkey
        FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    ), cohort_sizes AS (
        SELECT cohort_month, CAST(count(*) AS BIGINT) AS cohort_n
        FROM firsts GROUP BY cohort_month
    )
    SELECT CAST(a.cohort_month AS DATE) AS cohort_month,
           CAST(a.age_months AS INT) AS age_months,
           s.cohort_n,
           CAST(count(DISTINCT a.o_custkey) AS BIGINT) AS active_customers,
           round(sum(a.o_totalprice), 2) AS revenue,
           round(CAST(round(sum(a.o_totalprice), 2) / s.cohort_n
                      AS DECIMAL(28, 8)), 4)::DOUBLE
               AS revenue_per_cohort_member
    FROM aged a JOIN cohort_sizes s ON s.cohort_month = a.cohort_month
    GROUP BY 1, 2, 3
    """,
    doc=(
        "cohort lifetime-value matrix: each customer's orders bucketed by "
        "(first-order cohort month × months since first order), with "
        "active-customer counts and revenue normalized per ORIGINAL "
        "cohort member — the LTV curve table that growth/finance teams "
        "budget against (cumulate revenue_per_cohort_member along "
        "age_months for the classic LTV curve).  One per-customer "
        "first-order aggregate joined back to the fact (at 100 TB the "
        "firsts frame is customer-bounded and the join keys on custkey — "
        "the same shuffle the fact already has), then one rollup"
    ),
)
def q179(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    aged = o.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        ).alias("age_months"),
        "o_totalprice",
        "o_custkey",
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count("*").cast("long").alias("cohort_n")
    )
    return (
        aged.join(F.broadcast(sizes), "cohort_month")
        .groupBy(
            F.col("cohort_month").cast("date").alias("cohort_month"),
            F.col("age_months").cast("int").alias("age_months"),
            "cohort_n",
        )
        .agg(
            F.count_distinct("o_custkey").cast("long").alias(
                "active_customers"
            ),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            # two-stage round (8 then 4): a 2-dp revenue over an
            # integer divisor is an exact <=6-digit rational, but its
            # DOUBLE sits a hair below the .xxx5 boundary — Spark's
            # round works on the shortest repr while DuckDB rounds the
            # exact value, so a single round(.., 4) disagrees there.
            # Pinning 8 digits first reconstructs the rational in both
            # engines; the final round then agrees.
            F.round(
                F.round(
                    F.round(F.sum("o_totalprice"), 2) / F.col("cohort_n"),
                    8,
                ),
                4,
            ).alias("revenue_per_cohort_member"),
        )
    )
