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
* q129 scores每-doc token entropy with a two-level aggregate (H = log2 n −
  Σc·log2 c / n) — no per-doc dictionaries leave the executors, no UDF.
* q130 is template scrubbing: boilerplate = shingles present in >25% of a
  SOURCE's docs.  Frequency tables stay per-group (never a global
  dictionary), the group-size side is broadcast.
* q131 catches what Jaccard can't: sub-document duplication (containment
  |A∩B|/|A|), same inverted-index single-shuffle plan as q53.
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
