"""Fourth extension batch (round 3): mergeable distinct sketches, corpus
entropy scoring, C4-style boilerplate detection, containment dedup.

Scale notes (100 TB):
* q128 is the KMV (k-minimum-values) distinct sketch — unlike
  approx_count_distinct's HLL (engine-private hash → rows-only checks,
  q73), KMV over md5 is ENGINE-NEUTRAL, so the sketch itself is
  value-verified against the oracle.  Sketches merge by keeping the k
  smallest of a union → partial-aggregable, one narrow shuffle, constant
  state per group: the shape that matters when counting distincts per
  group over 100 TB.
* q129 scores per-doc token entropy with a two-level aggregate (H = log2 n −
  Σc·log2 c / n) — no per-doc dictionaries leave the executors, no UDF.
* q130 is template scrubbing: boilerplate = shingles present in >25% of a
  SOURCE's docs.  Frequency tables stay per-group (never a global
  dictionary), the group-size side is broadcast.
* q131 catches what Jaccard can't: sub-document duplication (containment
  |A∩B|/|A|), same inverted-index single-shuffle plan as q53.
* q132 is the Count-Min frequency sketch (md5 rows → engine-neutral like
  q128): cell-wise-additive partial sketches, d×w cells per partition on
  the wire — never a token dictionary.
* q133 is mutual-nearest-neighbor mining (the bitext/translation-pair
  shape): argmax cosine each way + an equi-join on the agreeing pairs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# q128 — KMV distinct sketch (mergeable, engine-neutral, oracled)
# ---------------------------------------------------------------------------

_KMV_K = 32
_KMV_HEX = 13  # 13 hex chars = 52 bits: exactly representable in a double


@register(
    "q128_kmv_distinct_sketch",
    f"""
    WITH d AS (
        SELECT DISTINCT o_orderpriority, o_custkey FROM orders
    ), u AS (
        SELECT o_orderpriority, o_custkey,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, {_KMV_HEX}))::BIGINT
                   AS hv
        FROM d
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderpriority ORDER BY hv, o_custkey) AS rn
        FROM u
    ), sk AS (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS k_seen,
               max(hv) AS kth_hash
        FROM ranked WHERE rn <= {_KMV_K} GROUP BY 1
    ), exact AS (
        SELECT o_orderpriority,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        FROM orders GROUP BY 1
    )
    SELECT s.o_orderpriority, exact_distinct, kth_hash,
           CASE WHEN k_seen < {_KMV_K} THEN CAST(k_seen AS DOUBLE)
                ELSE round(({_KMV_K} - 1) * power(16.0, {_KMV_HEX})
                           / kth_hash, 2) END AS est_distinct
    FROM sk s JOIN exact USING (o_orderpriority)
    """,
    doc=(
        "KMV distinct-count sketch per order priority: k smallest md5 "
        "values of the key, estimate (k-1)/kth-normalized-min.  md5 makes "
        "the sketch engine-neutral, so the oracle verifies the SKETCH "
        "VALUES (kth hash included), not just the estimate; 13 hex chars "
        "= 52 bits keeps every hash exactly representable in a double in "
        "both engines.  Sketches are mergeable (keep k smallest of a "
        "union) — the distributed shape HLL gives you, with cross-engine "
        "determinism"
    ),
)
def q128(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = o.select("o_orderpriority", "o_custkey").distinct().withColumn(
        "hv",
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, _KMV_HEX),
            16, 10,
        ).cast("long"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("hv", "o_custkey")
    sk = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("k_seen"),
            F.max("hv").alias("kth_hash"),
        )
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    return (
        sk.join(exact, on="o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_distinct",
            "kth_hash",
            F.when(
                F.col("k_seen") < _KMV_K, F.col("k_seen").cast("double")
            )
            .otherwise(
                F.round(
                    F.lit(float(_KMV_K - 1)) * F.pow(F.lit(16.0), _KMV_HEX)
                    / F.col("kth_hash"),
                    2,
                )
            )
            .alias("est_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# q129 — per-document token entropy (repetition/quality signal)
# ---------------------------------------------------------------------------


@register(
    "q129_token_entropy",
    """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\s+')) AS tok
        FROM documents
    ), counts AS (
        SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_unique,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy_bits
    FROM counts GROUP BY doc_id
    """,
    doc=(
        "per-doc unigram (token) Shannon entropy — the standard "
        "repetition-quality signal in corpus filtering (low entropy = "
        "degenerate/repeated text).  H = log2 n − Σ c·log2 c / n needs "
        "only a two-level aggregate: no per-doc dictionary ever "
        "materializes, no window, no UDF — two shuffles at any corpus "
        "size"
    ),
)
def q129(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                r"\s+",
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_unique"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            4,
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q130 — boilerplate shingle exposure (C4-style template scrubbing)
# ---------------------------------------------------------------------------


@register(
    "q130_boilerplate_exposure",
    """
    WITH sh AS (
        SELECT doc_id, source AS grp,
               list_distinct(list_transform(
                   generate_series(1, greatest(len(t) - 2, 1)),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s
        FROM (
            SELECT doc_id, source,
                   regexp_split_to_array(
                       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                       '\\s+') AS t
            FROM documents
        )
    ), inv AS (
        SELECT doc_id, grp, unnest(s) AS shingle FROM sh
    ), gs AS (
        SELECT grp, count(DISTINCT doc_id) AS n_docs FROM inv GROUP BY 1
    ), freq AS (
        SELECT grp, shingle, count(*) AS dfreq FROM inv GROUP BY 1, 2
    ), boiler AS (
        SELECT grp, shingle FROM freq JOIN gs USING (grp)
        WHERE n_docs >= 2 AND dfreq > n_docs * 0.25
    )
    SELECT i.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(coalesce(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 END), 0)
                AS BIGINT) AS n_boiler,
           round(coalesce(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 END), 0)
                 / count(*), 6) AS boiler_ratio
    FROM inv i LEFT JOIN boiler b USING (grp, shingle)
    GROUP BY i.doc_id
    """,
    doc=(
        "C4-style template scrubbing signal: a doc's fraction of word "
        "3-grams that occur in >25% of its SOURCE's documents "
        "(operators.dedup_docs.boilerplate_ngram_stats).  Frequency "
        "tables are per-source (no global dictionary at 100 TB); the "
        "group-size side is broadcast"
    ),
)
def q130(spark, sf_dir):
    from ..operators.dedup_docs import boilerplate_ngram_stats

    d = _t(spark, sf_dir, "documents")
    return boilerplate_ngram_stats(
        d, group_col="source", n=3, doc_frac=0.25
    )


# ---------------------------------------------------------------------------
# q131 — containment (asymmetric near-dup: sub-document duplication)
# ---------------------------------------------------------------------------


@register(
    "q131_containment_pairs",
    """
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
        SELECT id, len(s) AS sz, unnest(s) AS shingle FROM sh
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(count(*) / any_value(a.sz), 6) AS containment
    FROM inv a JOIN inv b USING (shingle)
    WHERE a.id <> b.id
    GROUP BY 1, 2
    HAVING round(count(*) / any_value(a.sz), 6) >= 0.6
    """,
    doc=(
        "directed near-containment pairs |A∩B|/|A| ≥ 0.6 "
        "(operators.dedup_docs.containment_pairs): catches sub-document "
        "duplication that Jaccard scores near zero.  Inverted-index "
        "plan — one shuffle on hashed shingles, sizes ride in the index "
        "rows, both directions emitted"
    ),
)
def q131(spark, sf_dir):
    from ..operators.dedup_docs import containment_pairs

    d = _t(spark, sf_dir, "documents")
    return containment_pairs(d, n=3, threshold=0.6)


# ---------------------------------------------------------------------------
# q132 — Count-Min sketch heavy hitters (mergeable, engine-neutral, oracled)
# ---------------------------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 256    # buckets per row
_CMS_TOP = 20


def _cms_bucket_sql(i: int, tok_expr: str) -> str:
    return (
        f"('0x' || substr(md5('cms{i}:' || {tok_expr}), 1, 8))::BIGINT "
        f"% {_CMS_W}"
    )


@register(
    "q132_cms_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   '\\s+')) AS tok
        FROM documents
    ), entries AS (
        SELECT i, bucket, CAST(count(*) AS BIGINT) AS c
        FROM (
            {" UNION ALL ".join(
                f"SELECT {i} AS i, {_cms_bucket_sql(i, 'tok')} AS bucket FROM toks"
                for i in range(_CMS_D))}
        ) GROUP BY 1, 2
    ), top AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt
        FROM toks GROUP BY tok
        ORDER BY true_cnt DESC, tok ASC LIMIT {_CMS_TOP}
    ), probes AS (
        {" UNION ALL ".join(
            f"SELECT tok, true_cnt, {i} AS i, "
            f"{_cms_bucket_sql(i, 'tok')} AS bucket FROM top"
            for i in range(_CMS_D))}
    )
    SELECT tok, any_value(true_cnt) AS true_cnt, min(c) AS cms_est
    FROM probes JOIN entries USING (i, bucket)
    GROUP BY tok
    """,
    doc=(
        "Count-Min sketch over corpus tokens: d=4 md5-derived hash rows × "
        "w=256 buckets, heavy-hitter estimates = min over rows.  md5 makes "
        "the SKETCH engine-neutral (DuckDB recomputes identical buckets "
        "and counts — the estimates are value-verified, unlike HLL's "
        "engine-private hashes).  CMS is partial-aggregable: per-partition "
        "sketches add cell-wise, so a 100 TB frequency pass shuffles d×w "
        "cells per partition, never a token dictionary.  Estimates are "
        "provably ≥ true counts (checked in tests) within ε·N with prob "
        "1-δ (ε=e/w, δ=e^-d)"
    ),
)
def q132(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                r"\s+",
            )
        ).alias("tok")
    )

    def bucket(i: int) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{i}:"), F.col("tok"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % _CMS_W
        )

    entries = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"), bucket(i).alias("bucket")
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("ib")
        )
        .select("ib.i", "ib.bucket")
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("tok").asc())
        .limit(_CMS_TOP)
    )
    probes = top.select(
        "tok",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), bucket(i).alias("bucket"))
                    for i in range(_CMS_D)
                ]
            )
        ).alias("ib"),
    ).select("tok", "true_cnt", "ib.i", "ib.bucket")
    return (
        probes.join(F.broadcast(entries), on=["i", "bucket"])
        .groupBy("tok")
        .agg(
            F.first("true_cnt").alias("true_cnt"),
            F.min("c").alias("cms_est"),
        )
    )


# ---------------------------------------------------------------------------
# q133 — mutual nearest neighbors (bitext-mining shape)
# ---------------------------------------------------------------------------


@register(
    "q133_mutual_nearest_neighbors",
    """
    WITH src AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 2 = 0
    ), tgt AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id % 2 = 1
    ), scored AS (
        SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
               round(list_dot_product(s.v, t.v)
                     / (sqrt(list_dot_product(s.v, s.v))
                        * sqrt(list_dot_product(t.v, t.v))), 6) AS cosine_sim
        FROM src s, tgt t
    ), fwd AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY src_id ORDER BY cosine_sim DESC, tgt_id ASC) AS rn
            FROM scored) WHERE rn = 1
    ), bwd AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY tgt_id ORDER BY cosine_sim DESC, src_id ASC) AS rn
            FROM scored) WHERE rn = 1
    )
    SELECT f.src_id, f.tgt_id, f.cosine_sim
    FROM fwd f JOIN bwd b ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id
    """,
    doc=(
        "mutual nearest neighbors between two embedding sets (the "
        "bitext-mining / translation-pair shape): a pair survives only if "
        "each side is the other's argmax cosine.  Exact brute-force here "
        "(oracle-checkable); at corpus scale the per-side argmax comes "
        "from the ANN operators (ivf_topk/lsh_topk k=1) and the mutual "
        "join is unchanged — the composition, not the scorer, is what "
        "this query pins"
    ),
)
def q133(spark, sf_dir):
    from ..operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    src = e.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    tgt = e.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    fwd = cosine_topk(
        src.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")),
        tgt, k=1,
    ).select(
        F.col("q_id").alias("src_id"),
        F.col("vec_id").alias("tgt_id"),
        "cosine_sim",
    )
    bwd = cosine_topk(
        tgt.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")),
        src, k=1,
    ).select(
        F.col("vec_id").alias("src_id"),
        F.col("q_id").alias("tgt_id"),
    )
    return fwd.join(bwd, on=["src_id", "tgt_id"])
