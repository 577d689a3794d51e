"""Extension queries: text analysis, dedup, similarity search over the
``documents`` and ``embeddings`` tables (BASELINE.json north_star ops).

Registered into the same REGISTRY as the core queries.  LSH-based variants
have no SQL oracle (engine-specific hash functions; probabilistic recall) —
the driver records rows-only checks for those, and `tests/test_extensions.py`
pins their semantics against the exact operators instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup_docs as DD
from ..operators import similarity as SIM
from ..operators import text as TXT
from .queries import _t, register

# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_STOP_EN_SQL = "['the','a','of','and','is','to','in']"


@register(
    "q50_text_stats",
    f"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS DOUBLE) / length(text)
                ELSE 0.0 END AS alpha_ratio,
           CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                THEN CAST(len(list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> list_contains({_STOP_EN_SQL}, t)))
                     AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+'))
                ELSE 0.0 END AS stopword_ratio
    FROM documents
    """,
    doc="token counting + quality features (native expressions, no UDF)",
)
def q50(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    feats = TXT.quality_features("text")
    return d.select(
        "doc_id",
        feats["n_tokens"].cast("long").alias("n_tokens"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


_MARKER_HITS_SQL = {
    lang: (
        f"len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
        f"t -> list_contains([{', '.join(repr(m) for m in ms)}], t)))"
    )
    for lang, ms in TXT.LANG_MARKERS.items()
}

_LANG_SQL = f"""
    SELECT doc_id, lang AS labeled_lang,
        CASE WHEN m = 0 THEN 'und'
             WHEN en = m THEN 'en'
             WHEN es = m THEN 'es'
             WHEN fr = m THEN 'fr'
             WHEN de = m THEN 'de'
             ELSE 'zh' END AS lang_guess
    FROM (
        SELECT doc_id, lang,
               {_MARKER_HITS_SQL['en']} AS en,
               {_MARKER_HITS_SQL['es']} AS es,
               {_MARKER_HITS_SQL['fr']} AS fr,
               {_MARKER_HITS_SQL['de']} AS de,
               {_MARKER_HITS_SQL['zh']} AS zh,
               greatest({_MARKER_HITS_SQL['en']}, {_MARKER_HITS_SQL['es']},
                        {_MARKER_HITS_SQL['fr']}, {_MARKER_HITS_SQL['de']},
                        {_MARKER_HITS_SQL['zh']}) AS m
        FROM documents
    )
"""


@register(
    "q51_lang_id",
    _LANG_SQL,
    doc="stopword-heuristic language identification (argmax with "
        "first-wins tie-break)",
)
def q51(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TXT.lang_id("text").alias("lang_guess"),
    )


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

# the corpus is all-distinct, so plant duplicates deterministically:
# re-add every 10th document under a shifted id (both engines, same rule)
_DUPED_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _duped_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return d.unionByName(extra)


@register(
    "q52_exact_dup_groups",
    f"""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           count(*) AS n_dups,
           min(doc_id) AS keep_id
    FROM ({_DUPED_SQL})
    GROUP BY 1
    HAVING count(*) > 1
    """,
    doc="exact dedup: md5-of-normalized-text groups (one hash shuffle)",
)
def q52(spark, sf_dir):
    return DD.exact_dup_groups(_duped_docs(spark, sf_dir))


@register(
    "q53_ngram_jaccard_pairs",
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
        SELECT id, unnest(s) AS shingle FROM sh
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM inv a JOIN inv b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(CAST(inter AS DOUBLE)
                 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN (SELECT id, len(s) AS sz FROM sh) sa ON sa.id = id_a
    JOIN (SELECT id, len(s) AS sz FROM sh) sb ON sb.id = id_b
    WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= 0.25
    """,
    doc="exact n-gram Jaccard near-dup pairs via inverted shingle index — "
        "the verify stage of the LSH path",
)
def q53(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(d, n=3, threshold=0.25)


@register(
    "q56_minhash_lsh_near_dup",
    None,  # engine-specific hashes + probabilistic recall → rows-only
    doc="MinHash+LSH banded near-dup (the 100 TB path): signature scan → "
        "band-bucket join → exact-Jaccard verify; subset of q53 by "
        "construction (tested in tests/test_extensions.py)",
)
def q56(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_dedup(d, n=3, num_hashes=32, bands=16, threshold=0.25)


@register(
    "q57_simhash_near_dup",
    None,  # xxhash64-based signature → rows-only
    doc="SimHash 64-bit signatures + block-permutation hamming lookup",
)
def q57(spark, sf_dir):
    return DD.simhash_near_dup_pairs(
        _duped_docs(spark, sf_dir), max_hamming=3, blocks=4
    )


# ---------------------------------------------------------------------------
# corpus preprocessing (plans/corpus.py)
# ---------------------------------------------------------------------------

_FEATS_SQL = f"""
    SELECT doc_id, text,
           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS DOUBLE) / length(text)
                ELSE 0.0 END AS alpha_ratio,
           CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) > 0
                THEN CAST(len(list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         t -> list_contains({_STOP_EN_SQL}, t)))
                     AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+'))
                ELSE 0.0 END AS stopword_ratio
    FROM ({_DUPED_SQL})
"""


@register(
    "q59_corpus_quality_gate",
    f"""
    WITH feats AS ({_FEATS_SQL}),
    gated AS (
        SELECT doc_id, text FROM feats
        WHERE text IS NOT NULL AND n_tokens >= 5
          AND alpha_ratio >= 0.5 AND stopword_ratio <= 0.7
    )
    SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
            PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
            ORDER BY doc_id ASC) AS rn
        FROM gated
    ) WHERE rn = 1
    """,
    doc="training-corpus preprocessing prefix: quality gate (token count, "
        "alpha ratio, stopword ratio) → exact dedup keeping min doc_id — "
        "the SQL-expressible prefix of plans/corpus.py::preprocess_corpus",
)
def q59(spark, sf_dir):
    from .corpus import preprocess_corpus

    return preprocess_corpus(
        _duped_docs(spark, sf_dir),
        min_tokens=5, min_alpha_ratio=0.5, max_stopword_ratio=0.7,
        near_dup_threshold=None,
    ).select("doc_id")


@register(
    "q60_near_dup_clusters",
    None,  # iterative connected components → rows-only; semantics pinned
           # by tests/test_corpus.py (chain merging, representative choice)
    doc="MinHash-LSH verified pairs → connected components (iterative "
        "min-label propagation) → (id, component) duplicate clusters",
)
def q60(spark, sf_dir):
    from .corpus import near_dup_clusters

    return near_dup_clusters(_duped_docs(spark, sf_dir), threshold=0.5)


@register(
    "q19_deterministic_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) < 64
    """,
    doc="deterministic hash sampling (~25%): membership is a pure function "
        "of the id — reproducible under re-runs and repartitioning, unlike "
        "RNG sampling; xxhash64 variant is the non-portable fast path",
)
def q19(spark, sf_dir):
    from ..operators.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    return deterministic_sample(d, "doc_id", 0.25).select("doc_id", "lang")


@register(
    "q45_train_val_test_split",
    """
    SELECT CASE
             WHEN b < 205 THEN 'train'
             WHEN b < 230 THEN 'val'
             ELSE 'test'
           END AS split,
           count(*) AS n_docs,
           min(doc_id) AS min_id
    FROM (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS b
        FROM documents
    )
    GROUP BY 1
    """,
    doc="train/val/test split (80/10/10) by hash-bucket range — disjoint, "
        "exhaustive, leak-free across pipeline re-runs",
)
def q45(spark, sf_dir):
    from ..operators.sampling import train_val_test_split

    d = _t(spark, sf_dir, "documents")
    return (
        train_val_test_split(d, "doc_id", train=0.8, val=0.1)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_id"))
    )


@register(
    "q61_doc_embedding_profile",
    """
    SELECT d.lang,
           count(*) AS n_docs,
           round(sum(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                           CAST(e.embedding AS DOUBLE[])))), 3)
               AS total_norm,
           CAST(sum(len(regexp_split_to_array(trim(d.text), '\\s+'))) AS BIGINT)
               AS total_tokens
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
    doc="cross-modal profile: text table ⋈ embedding table on doc id, "
        "vector-norm + token aggregates per language — the join shape of a "
        "multimodal training-data pipeline",
)
def q61(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    v = SIM.as_double(F.col("embedding"))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum(F.sqrt(SIM.dot(v, v))), 3).alias("total_norm"),
            F.sum(TXT.token_count("text").cast("long")).alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@register(
    "q54_cosine_topk",
    """
    WITH q AS (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT q.q_id, c.vec_id,
               round(list_dot_product(qv, CAST(c.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[])))),
                     6) AS cosine_sim
        FROM embeddings c, q
    )
    SELECT q_id, vec_id, cosine_sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
    doc="exact brute-force cosine top-k (broadcast queries × corpus scan) — "
        "the ANN correctness baseline",
)
def q54(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return SIM.cosine_topk(q, e, k=10)


@register(
    "q58_ivf_topk",
    """
    WITH q AS (
        SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id >= 5 AND vec_id < 10
    ), scored AS (
        SELECT q.q_id, c.vec_id,
               round(list_dot_product(qv, CAST(c.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[])))),
                     6) AS cosine_sim
        FROM embeddings c, q
    )
    SELECT q_id, vec_id, cosine_sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 8
    """,
    doc="IVF-flat ANN (k-means cells + probe join + exact re-rank) run at "
        "nprobe = nlist, which is exact by construction — the oracle checks "
        "the whole IVF plumbing; recall at nprobe < nlist is pinned in "
        "tests/test_extensions.py",
)
def q58(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return SIM.ivf_topk(q, e, k=8, nlist=8, nprobe=8, iters=1)


@register(
    "q55_embedding_near_dup",
    None,  # hyperplane-LSH blocking → rows-only (recall tested vs exact)
    doc="embedding-cosine near-dup pairs via random-hyperplane LSH blocking "
        "+ exact verify; near-dups planted deterministically (corpus max "
        "natural cosine ≈ 0.51)",
)
def q55(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # plant: every 20th vector re-added, slightly perturbed (cos ≈ 0.9997)
    perturbed = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x.cast("double") * (1.0 + 0.005 * ((i % 7) - 3.0))).cast(
                "float"
            ),
        ).alias("embedding"),
    )
    return SIM.embedding_near_dup_pairs(
        e.unionByName(perturbed), dim=64, threshold=0.99
    )
