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
* q134 market-basket lift: the pair blow-up is per-basket quadratic in
  basket size, never corpus size; marginals broadcast.
* q135 runs SCD2 (build + point-in-time interval join) under the value
  oracle end-to-end.
* q136 PageRank: the iterative join+aggregate shape, rank vectors only
  ever shuffled by key — intermediate rounding pins cross-engine floats.
* q137 temperature-scaled mixing (rates ∝ n^α/n, md5 membership): the
  pretraining data-mixing staple, RNG-free and reproducible.
* q138 hard-negative mining: label-aware top-k similarity with the
  inequality fused into the broadcast join.
* q139 cluster survivorship by best payload (argmax length per
  component) — the window runs over the clustered subset only.
* q140 cross-source contamination matrix: directed shingle containment
  per source pair over source-DISTINCT shingle sets (vocab-bounded).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..cache import track, track_persist
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


# ---------------------------------------------------------------------------
# q134 — market-basket co-occurrence with lift
# ---------------------------------------------------------------------------


@register(
    "q134_market_basket_lift",
    """
    WITH b AS (
        SELECT DISTINCT l.l_orderkey AS orderkey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), n_orders AS (
        SELECT count(DISTINCT orderkey) AS n FROM b
    ), brand_cnt AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS n_b FROM b GROUP BY 1
    ), pairs AS (
        SELECT x.brand AS brand_a, y.brand AS brand_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM b x JOIN b y USING (orderkey)
        WHERE x.brand < y.brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * n / (ca.n_b * cb.n_b), 6) AS lift
    FROM pairs
    JOIN brand_cnt ca ON ca.brand = brand_a
    JOIN brand_cnt cb ON cb.brand = brand_b
    CROSS JOIN n_orders
    ORDER BY n_ab DESC, brand_a, brand_b LIMIT 30
    """,
    doc=(
        "market-basket analysis: brand co-occurrence within an order, "
        "scored by lift = P(ab)/(P(a)P(b)).  The self-join shuffles on "
        "orderkey (baskets are small, so the pair blow-up is per-basket "
        "quadratic in BASKET size, never corpus size); brand marginals "
        "and the order count broadcast"
    ),
)
def q134(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("orderkey"),
                F.col("p_brand").alias("brand"))
        .distinct()
    )
    n = b.select("orderkey").distinct().count()
    brand_cnt = b.groupBy("brand").agg(F.count("*").alias("n_b"))
    pairs = (
        b.alias("x")
        .join(b.alias("y"), on="orderkey")
        .filter(F.col("x.brand") < F.col("y.brand"))
        .groupBy(
            F.col("x.brand").alias("brand_a"),
            F.col("y.brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    ca = brand_cnt.select(F.col("brand").alias("brand_a"),
                          F.col("n_b").alias("na"))
    cb = brand_cnt.select(F.col("brand").alias("brand_b"),
                          F.col("n_b").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), on="brand_a")
        .join(F.broadcast(cb), on="brand_b")
        .select(
            "brand_a", "brand_b", "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.lit(n)
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "brand_a", "brand_b")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# q135 — SCD2 build + point-in-time join, fully oracled
# ---------------------------------------------------------------------------


@register(
    "q135_scd2_point_in_time",
    """
    WITH log AS (
        SELECT o_custkey AS k, o_orderpriority AS v,
               o_orderdate AS ts, o_orderkey AS tie
        FROM orders
    ), runs AS (
        SELECT * FROM (
            SELECT k, v, ts, tie,
                   lag(v) OVER (PARTITION BY k ORDER BY ts, tie) AS prev,
                   row_number() OVER (PARTITION BY k ORDER BY ts, tie) AS rn
            FROM log)
        WHERE rn = 1 OR v IS DISTINCT FROM prev
    ), dim AS (
        SELECT k, v AS priority, ts AS valid_from,
               lead(ts) OVER (PARTITION BY k ORDER BY ts, tie) AS valid_to
        FROM runs
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           d.priority AS priority_at_order
    FROM orders o JOIN dim d
      ON d.k = o.o_custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    WHERE o.o_orderkey % 13 = 0
    """,
    doc=(
        "SCD2 under the value-hash gate end-to-end: collapse the order "
        "log into [valid_from, valid_to) priority history per customer "
        "(operators.scd2.scd2_snapshot — lag-change detection + lead "
        "close-off, tie-total ordering) then point-in-time join a probe "
        "set against the intervals.  Zero-length intervals from same-day "
        "ties resolve identically in both engines (strict upper bound)"
    ),
)
def q135(spark, sf_dir):
    from ..operators.scd2 import scd2_snapshot

    o = _t(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderpriority").alias("v"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tie"),
    )
    dim = scd2_snapshot(log, key="k", tracked="v",
                        order_col="ts", tie_col="tie")
    probes = o.filter(F.col("o_orderkey") % 13 == 0)
    return (
        probes.join(
            dim,
            (dim.k == probes.o_custkey)
            & (dim.valid_from <= probes.o_orderdate)
            & (dim.valid_to.isNull()
               | (probes.o_orderdate < dim.valid_to)),
        )
        .select(
            "o_orderkey", "o_custkey", "o_orderdate",
            F.col("v").alias("priority_at_order"),
        )
    )


# ---------------------------------------------------------------------------
# q136 — PageRank, 3 synchronized iterations (iterative linear algebra)
# ---------------------------------------------------------------------------

_PR_D = 0.85
_PR_ITERS = 3
_PR_TOP = 20


def _q136_oracle() -> str:
    it = """
        SELECT e.dst AS node,
               round((1 - {d}) / n.n + {d} * sum(r.r / dg.deg), 9) AS r
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN deg dg ON dg.node = e.src
        CROSS JOIN nn n
        GROUP BY e.dst, n.n
    """
    iters = "".join(
        f", r{i + 1} AS ({it.format(d=_PR_D, prev=f'r{i}')})"
        for i in range(_PR_ITERS)
    )
    return f"""
    WITH raw AS (
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS a,
               's' || CAST(l_suppkey AS VARCHAR) AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e0 AS (
        SELECT DISTINCT a, b FROM raw
    ), edges AS (
        SELECT a AS src, b AS dst FROM e0
        UNION ALL
        SELECT b, a FROM e0
    ), deg AS (
        SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1
    ), nn AS (
        SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM edges
    ), r0 AS (
        SELECT src AS node, 1.0 / n.n AS r
        FROM (SELECT DISTINCT src FROM edges) CROSS JOIN nn n
    ){iters}
    SELECT node, round(r, 5) AS rank
    FROM r{_PR_ITERS}
    ORDER BY round(r, 5) DESC, node LIMIT {_PR_TOP}
    """


@register(
    "q136_pagerank3",
    _q136_oracle(),
    doc=(
        "PageRank over the customer↔supplier purchase graph "
        "(orders⋈lineitem), 3 synchronized iterations, d=0.85 "
        "(symmetrized edges → no dangling-mass term).  Each iteration = "
        "join(ranks, edges) + groupBy(dst) sum — the canonical "
        "iterative-linear-algebra shape on DataFrames; the oracle "
        "unrolls the same three iterations as CTEs.  Per-iteration "
        "intermediate ranks round to 9 decimals so cross-engine "
        "float-sum ordering cannot drift; output at 5"
    ),
)
def q136(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    edges = track(e0.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).persist())
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = edges.select("src").distinct()
    n = float(nodes.count())
    r = nodes.select("src", (F.lit(1.0) / F.lit(n)).alias("r"))
    for _ in range(_PR_ITERS):
        r = (
            edges.join(r, on="src")
            .join(deg, on="src")
            .groupBy(F.col("dst").alias("src"))
            .agg(
                F.round(
                    F.lit((1 - _PR_D) / n)
                    + F.lit(_PR_D) * F.sum(F.col("r") / F.col("deg")),
                    9,
                ).alias("r")
            )
        )
    return (
        r.select(F.col("src").alias("node"), F.round("r", 5).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(_PR_TOP)
    )


# ---------------------------------------------------------------------------
# q137 — temperature-scaled mixture sampling (LLM data-mixing staple)
# ---------------------------------------------------------------------------

_Q137_ALPHA = 0.5
_Q137_BUDGET = 200


@register(
    "q137_temperature_mixing",
    f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_s
        FROM documents GROUP BY 1
    ), tot AS (
        SELECT sum(power(n_s, {_Q137_ALPHA})) AS z FROM counts
    ), rates AS (
        SELECT source,
               round(least(1.0,
                   {_Q137_BUDGET} * power(n_s, {_Q137_ALPHA}) / t.z / n_s),
                   6) AS rate
        FROM counts CROSS JOIN tot t
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::BIGINT
          / 65536.0 < r.rate
    """,
    doc=(
        "temperature-scaled data mixing (the LLM-pretraining staple): "
        "per-source sampling rates ∝ n^α / n (α=0.5 flattens the source "
        "distribution), membership a pure md5 function of the doc id — "
        "RNG-free, reproducible, and per-row work independent of source "
        "count.  Rates round to 6 decimals before the threshold compare "
        "so a 1-ulp cross-engine drift in the α-power sum cannot flip a "
        "membership"
    ),
)
def q137(spark, sf_dir):
    from ..operators.sampling import md5_unit

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_s").cast("double"), _Q137_ALPHA)).alias("z")
    )
    rates = counts.crossJoin(tot).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(_Q137_BUDGET))
                * F.pow(F.col("n_s").cast("double"), _Q137_ALPHA)
                / F.col("z")
                / F.col("n_s"),
            ),
            6,
        ).alias("rate"),
    )
    return (
        d.join(F.broadcast(rates), on="source")
        .filter(md5_unit("doc_id") < F.col("rate"))
        .select("doc_id", "source")
    )


# ---------------------------------------------------------------------------
# q138 — hard-negative mining (label-aware top-k similarity)
# ---------------------------------------------------------------------------


@register(
    "q138_hard_negative_mining",
    """
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), q AS (
        SELECT vec_id AS q_id, label AS q_label, v AS qv
        FROM e WHERE vec_id < 8
    ), scored AS (
        SELECT q.q_id, c.vec_id,
               round(list_dot_product(qv, c.v)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine_sim
        FROM q JOIN e c ON c.label <> q.q_label
    )
    SELECT q_id, vec_id, cosine_sim, rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cosine_sim DESC, vec_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
    doc=(
        "hard-negative mining for contrastive training: per query, the "
        "top-5 most-similar vectors with a DIFFERENT label — the "
        "highest-value negatives.  Broadcast queries × one corpus scan "
        "with the label inequality fused into the join (no post-filter "
        "pass); the ANN operators swap in for the scorer at corpus scale"
    ),
)
def q138(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..operators.similarity import as_double, cosine

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
    )
    scored = (
        e.join(F.broadcast(q), e.label != q.q_label)
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


# ---------------------------------------------------------------------------
# q139 — near-dup cluster survivorship by best payload (not min-id)
# ---------------------------------------------------------------------------


@register(
    "q139_cluster_best_survivor",
    """
    WITH RECURSIVE sh AS (
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
    ), raw_pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        FROM inv a JOIN inv b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT id_a, id_b
        FROM raw_pairs
        JOIN (SELECT id, len(s) AS sz FROM sh) sa ON sa.id = id_a
        JOIN (SELECT id, len(s) AS sz FROM sh) sb ON sb.id = id_b
        WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.25
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
        SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    ), comp AS (
        SELECT src AS id, min(dst) AS component FROM reach GROUP BY src
    )
    SELECT c.component,
           CAST(count(*) AS BIGINT) AS n_members,
           any_value(s.keep) AS survivor_id
    FROM comp c
    JOIN (
        SELECT component, id AS keep FROM (
            SELECT c2.component, c2.id,
                   row_number() OVER (
                       PARTITION BY c2.component
                       ORDER BY length(d.text) DESC, c2.id ASC) AS rn
            FROM comp c2 JOIN documents d ON d.doc_id = c2.id
        ) WHERE rn = 1
    ) s USING (component)
    GROUP BY c.component
    """,
    doc=(
        "near-dup cluster survivorship by BEST PAYLOAD: min-id survivors "
        "(dedup_by_components' default) throw away the most complete "
        "copy; production dedup keeps the longest/highest-quality member "
        "per cluster.  Clusters via the q92 components machinery, "
        "survivor = argmax(text length, tie → min id) — one window over "
        "the (small) clustered subset, never the corpus"
    ),
)
def q139(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..operators import dedup_docs as DD
    from ..operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(d, n=3, threshold=0.25)
    comp = connected_components(pairs)
    members = comp.join(
        d.select(F.col("doc_id").alias("id"), F.length("text").alias("len")),
        on="id",
    )
    w = W.partitionBy("component").orderBy(F.col("len").desc(), F.col("id"))
    best = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", F.col("id").alias("survivor_id"))
    )
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .join(best, on="component")
        .select("component", "n_members", "survivor_id")
    )


# ---------------------------------------------------------------------------
# q140 — cross-source contamination matrix
# ---------------------------------------------------------------------------


@register(
    "q140_source_overlap_matrix",
    """
    WITH src_sh AS (
        SELECT DISTINCT source, shingle FROM (
            SELECT source,
                   unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(t) - 2, 1)),
                       i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS shingle
            FROM (
                SELECT source,
                       regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                           '\\s+') AS t
                FROM documents
            )
        )
    ), sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_sh
        FROM src_sh GROUP BY 1
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_common,
           round(CAST(count(*) AS DOUBLE) / any_value(sa.n_sh), 6)
               AS containment_a_in_b
    FROM src_sh a
    JOIN src_sh b ON a.shingle = b.shingle AND a.source <> b.source
    JOIN sizes sa ON sa.source = a.source
    GROUP BY a.source, b.source
    """,
    doc=(
        "cross-source contamination matrix: directed shingle containment "
        "|sh(A) ∩ sh(B)| / |sh(A)| per source pair — the corpus-level "
        "audit run before mixing sources into a training set (high "
        "containment = one source republishes another → double-counted "
        "text).  Source-distinct shingle sets keep the join input "
        "|sources|·|vocab|-bounded, never corpus-length-bounded"
    ),
)
def q140(spark, sf_dir):
    from ..operators.dedup_docs import word_shingles

    d = _t(spark, sf_dir, "documents")
    # explode-fusion barrier (ARCHITECTURE.md round-9): materialize the
    # shingle ARRAY before exploding — fused explode(word_shingles(text))
    # re-evaluates the whole shingle builder per output row
    sh_arr = track_persist(d.select("source", word_shingles("text", 3).alias("sh")))
    src_sh = track(
        # shuffle/join on the 64-bit shingle hash, never the 3-word
        # string (the q53 inverted-index discipline) — counts only need
        # equality, and collisions are ~|vocab|²/2⁶⁴
        sh_arr.select("source", F.explode("sh").alias("__s"))
        .select("source", F.xxhash64("__s").alias("shingle"))
        .distinct()
        # persisted: feeds both sides of the self-join AND the size agg —
        # without it the shingle explode+distinct shuffle runs 3×
        .persist()
    )
    sizes = src_sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    return (
        src_sh.alias("a")
        .join(
            src_sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_common"))
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                     F.col("n_sh"))),
            on="source_a",
        )
        .select(
            "source_a", "source_b", "n_common",
            F.round(F.col("n_common").cast("double") / F.col("n_sh"), 6)
                .alias("containment_a_in_b"),
        )
    )
