"""Round-10 second batch (q275+): the model-quality / statistics side of
the curation pipeline.

* **q275 pretrained linear quality classifier** — the fastText-style
  scorer every modern web pipeline (CCNet, DCLM, FineWeb-Edu) applies
  after the rule gates: interpretable per-doc features feed a FIXED
  (pretrained) linear model and a sigmoid.  Scoring is embarrassingly
  parallel — weights are literals in the plan, features come from ONE
  explode + two all-integer aggregations, so the score math is exact
  rational arithmetic until the final sigmoid.

* **q276 Poisson bootstrap** — THE distributed bootstrap: classical
  resampling draws n rows with replacement (a global operation — cannot
  shard), but the multinomial factorizes to independent Poisson(1) row
  weights as n→∞, so every row computes its B replicate weights locally
  and the replicate statistics are plain weighted aggregates.  RNG-free
  here: the weight is the Poisson(1) inverse CDF of a portable
  md5-uniform of (order, replicate), so any engine reproduces the same
  resample bit-for-bit.

* **q277 greedy k-center selection** — farthest-point traversal over
  the embedding table: the diversity-selection / coreset primitive
  (Sener & Savarese 2018's core-set active learning; also the classic
  2-approximation to the k-center objective).  Inherently sequential in
  k (center s+1 depends on centers 1..s), so each step is one bounded
  argmax aggregate back to the driver (the centroid-fetch .collect()
  class, q266's BPE precedent) while ALL distance work stays
  distributed; the k-step loop never rescans more than one projection
  of the corpus per step.

Reference parity: none — LLM-pipeline extensions (SURVEY §2 addenda).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .queries import _t, register

# ---------------------------------------------------------------------------
# q275 — pretrained linear quality classifier (fastText-style)
# ---------------------------------------------------------------------------

# The fixed "pretrained" model lives in operators/quality_model (the
# release capstone's model-gate stage); the oracle literals below are
# the SAME dict so the hash gate certifies the operator's weights.
# Feature ranges on the synthetic corpus: ttr 0.28-1.0, top_frac
# 0.05-0.30, mean_word_len 3.7-5.3, stop_frac 0-0.22, ln(n_toks)
# 2.3-4.6 — the intercept centers z near 0 so the decision is
# non-degenerate.
from ..operators.quality_model import (  # noqa: E402
    DEFAULT_STOPWORDS as _Q275_STOPWORDS,
    DEFAULT_WEIGHTS as _Q275_W,
)

_Q275_B = _Q275_W["intercept"]
_Q275_W_TTR = _Q275_W["ttr"]
_Q275_W_TOP = _Q275_W["top_frac"]
_Q275_W_LEN = _Q275_W["mean_word_len"]
_Q275_W_STOP = _Q275_W["stop_frac"]
_Q275_W_LOGN = _Q275_W["log_n_toks"]


# the scored CTE block shared by q275/q278/q279 (one definition — the
# hash gate certifies the same math every query composes on)
_Q275_SCORED_CTES = f"""tok AS (
        SELECT doc_id, source,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
    ), cnts AS (
        SELECT doc_id, source, tok, count(*) AS cnt
        FROM tok GROUP BY doc_id, source, tok
    ), feats AS (
        SELECT doc_id, source,
               sum(cnt) AS n, count(*) AS d, max(cnt) AS top,
               sum(len(tok) * cnt) AS chars,
               sum(CASE WHEN tok IN {_Q275_STOPWORDS!r} THEN cnt
                        ELSE 0 END) AS stop
        FROM cnts GROUP BY doc_id, source
    ), scored AS (
        SELECT doc_id, source, CAST(n AS BIGINT) AS n_toks,
               {_Q275_B} + {_Q275_W_TTR} * (d * 1.0 / n)
                 + {_Q275_W_TOP} * (top * 1.0 / n)
                 + {_Q275_W_LEN} * (chars * 1.0 / n)
                 + {_Q275_W_STOP} * (stop * 1.0 / n)
                 + {_Q275_W_LOGN} * ln(n) AS z
        FROM feats
    )"""


@register(
    "q275_quality_classifier",
    f"""
    WITH {_Q275_SCORED_CTES}
    SELECT doc_id, source, n_toks,
           round(1.0 / (1.0 + exp(-z)), 4) AS score,
           z > 0 AS kept
    FROM scored ORDER BY doc_id
    """,
    doc=(
        "pretrained linear quality classifier (the fastText-style scorer "
        "CCNet/DCLM/FineWeb apply after rule gates): per-doc type-token "
        "ratio, top-token dominance, mean word length, stopword fraction "
        "and log-length feed FIXED literal weights and a sigmoid.  "
        "Features come from one explode + two all-integer aggregations "
        "(map-side combining both times, keyed by doc id — never a "
        "per-doc collect_list), so everything before the final sigmoid "
        "is exact integer ratios and the score is reproducible across "
        "engines; the decision is the SIGN of the raw linear score, "
        "immune to rounding.  Scoring is embarrassingly parallel — at "
        "100 TB this is one scan, two combines, zero joins"
    ),
)
def q275(spark, sf_dir):
    # delegates to operators/quality_model (the release capstone's model
    # gate); the z float chain there is built with the oracle's exact
    # literal/associativity shape so the hash gate certifies the
    # OPERATOR, not a query-local copy
    from ..operators.quality_model import linear_score, quality_features

    d = _t(spark, sf_dir, "documents")
    z = linear_score(_Q275_W)
    scored = quality_features(d, "text", "doc_id").select(
        "doc_id",
        F.col("n").cast("long").alias("n_toks"),
        F.round(1.0 / (1.0 + F.exp(-z)), 4).alias("score"),
        (z > 0).alias("kept"),
    )
    return (
        d.select("doc_id", "source")
        .join(scored, "doc_id")
        .select("doc_id", "source", "n_toks", "score", "kept")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q276 — Poisson bootstrap CI (the distributed bootstrap)
# ---------------------------------------------------------------------------

_Q276_B = 25  # bootstrap replicates
_Q276_HASH_SPACE = float(1 << 60)
# Poisson(1) CDF ladder for the inverse-CDF draw; computed once in
# Python and embedded as the SAME repr-literals in both engines.  k is
# capped at 6 (P(k>6) ~ 8e-5 — negligible bootstrap distortion, exact
# determinism either way since both engines share the cap).
_Q276_CDF = [
    math.exp(-1) * sum(1.0 / math.factorial(i) for i in range(k + 1))
    for k in range(6)
]


def _q276_k_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_Q276_CDF)
    )
    return f"CASE{branches} ELSE 6 END"


def _q276_k_spark(u):
    expr = F.lit(6)
    for k, c in reversed(list(enumerate(_Q276_CDF))):
        expr = F.when(u < F.lit(c), F.lit(k)).otherwise(expr)
    return expr


@register(
    "q276_poisson_bootstrap_ci",
    f"""
    WITH base AS (
        SELECT c.c_mktsegment AS segment, o.o_orderkey,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), expanded AS (
        SELECT segment, cents, b,
               (CAST(('0x' || substr(md5('boot:' || CAST(o_orderkey AS VARCHAR)
                      || ':' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
                + 1.0) / {_Q276_HASH_SPACE + 2.0!r} AS u
        FROM base CROSS JOIN (
            SELECT unnest(generate_series(0, {_Q276_B - 1})) AS b
        )
    ), weighted AS (
        SELECT segment, b, cents, {_q276_k_sql('u')} AS k FROM expanded
    ), rep AS (
        SELECT segment, b,
               CAST(sum(k * cents) AS DOUBLE) / sum(k) / 100.0 AS rep_mean
        FROM weighted GROUP BY segment, b
    ), point AS (
        SELECT segment, count(*) AS n_orders,
               CAST(sum(cents) AS DOUBLE) / count(*) / 100.0 AS mean_price
        FROM base GROUP BY segment
    )
    SELECT p.segment, p.n_orders,
           round(p.mean_price, 4) AS mean_price,
           round(quantile_cont(r.rep_mean, 0.025), 4) AS boot_lo,
           round(quantile_cont(r.rep_mean, 0.975), 4) AS boot_hi
    FROM rep r JOIN point p USING (segment)
    GROUP BY p.segment, p.n_orders, p.mean_price
    ORDER BY p.segment
    """,
    doc=(
        "Poisson bootstrap 95% CI of mean order value per market segment "
        "— THE distributed bootstrap (classical resampling draws n rows "
        "with replacement, a global op that cannot shard; the "
        "multinomial factorizes to independent Poisson(1) row weights "
        "as n grows, so every row computes its B=25 replicate weights "
        "LOCALLY and replicate statistics are plain weighted "
        "aggregates).  RNG-free: the weight is the Poisson(1) inverse "
        "CDF of a portable md5-uniform of (order, replicate), so the "
        "resample is bit-reproducible in any engine.  All replicate "
        "sums are exact integer cents — the only floats are two final "
        "divisions and the percentile interpolation (both engines "
        "share the (n-1)p rule, q249 precedent).  At 100 TB: one "
        "broadcast dim join, one B-fold flatMap, two partial-merging "
        "aggregates — no shuffle grows beyond |segments|x B rows"
    ),
)
def q276(spark, sf_dir):
    from ..operators.dedup_docs import portable_hash60

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "segment",
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    expanded = base.select(
        "segment",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_Q276_B - 1))).alias("b"),
        "o_orderkey",
    ).select(
        "segment",
        "cents",
        "b",
        (
            (
                portable_hash60(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("b").cast("string"),
                    ),
                    "boot:",
                )
                + F.lit(1.0)
            )
            / F.lit(_Q276_HASH_SPACE + 2.0)
        ).alias("u"),
    )
    weighted = expanded.select(
        "segment", "b", "cents", _q276_k_spark(F.col("u")).alias("k")
    )
    rep = weighted.groupBy("segment", "b").agg(
        (
            F.sum(F.col("k") * F.col("cents")).cast("double")
            / F.sum("k")
            / 100.0
        ).alias("rep_mean")
    )
    point = base.groupBy("segment").agg(
        F.count("*").alias("n_orders"),
        (F.sum("cents").cast("double") / F.count("*") / 100.0).alias(
            "mean_price"
        ),
    )
    return (
        rep.join(F.broadcast(point), "segment")
        .groupBy("segment", "n_orders", "mean_price")
        .agg(
            F.expr("percentile(rep_mean, 0.025D)").alias("lo"),
            F.expr("percentile(rep_mean, 0.975D)").alias("hi"),
        )
        .select(
            "segment",
            "n_orders",
            F.round("mean_price", 4).alias("mean_price"),
            F.round("lo", 4).alias("boot_lo"),
            F.round("hi", 4).alias("boot_hi"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q277 — greedy k-center diversity selection (farthest-point traversal)
# ---------------------------------------------------------------------------

_Q277_K = 8


def _q277_oracle() -> str:
    """Unrolled farthest-point traversal (q266's unrolled-CTE pattern):
    c1 = min vec_id; d_s = per-point min squared distance to centers
    1..s; c_{s+1} = argmax(d_s) with vec_id tiebreak.  The squared
    distance is the identity <v,v> - 2<v,c> + <c,c> — the SAME algebraic
    shape the Spark side evaluates, so the float chains agree."""

    def dist(v: str, c: str) -> str:
        return (
            f"list_dot_product({v}, {v}) - 2 * list_dot_product({v}, {c})"
            f" + list_dot_product({c}, {c})"
        )

    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"d1 AS (SELECT e.vec_id, e.v, {dist('e.v', 'c1.v')} AS md"
        " FROM e CROSS JOIN c1)",
    ]
    for s in range(2, _Q277_K + 1):
        prev = f"d{s - 1}"
        parts.append(
            f"c{s} AS (SELECT vec_id, v, md FROM {prev}"
            " ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if s < _Q277_K:
            parts.append(
                f"d{s} AS (SELECT p.vec_id, p.v,"
                f" least(p.md, {dist('p.v', f'c{s}.v')}) AS md"
                f" FROM {prev} p CROSS JOIN c{s})"
            )
    selects = [
        "SELECT 1 AS step, vec_id, CAST(NULL AS DOUBLE) AS radius FROM c1"
    ] + [
        f"SELECT {s} AS step, vec_id, round(sqrt(md), 4) AS radius FROM c{s}"
        for s in range(2, _Q277_K + 1)
    ]
    return (
        ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
        + "\n    ORDER BY step"
    )


@register(
    "q277_kcenter_selection",
    _q277_oracle(),
    doc=(
        "greedy k-center diversity selection (farthest-point traversal, "
        "the 2-approximate k-center / core-set primitive of Sener 2018): "
        "seed = lowest vec_id, then 7 rounds of 'the point farthest "
        "from every chosen center', emitting each round's covering "
        "radius — the diminishing-returns curve that sizes a diverse "
        "fine-tuning subset.  The loop is inherently sequential in k, "
        "so each round is ONE bounded argmax aggregate "
        "(min(struct(-dist, id, vec)) — the centroid-fetch .collect() "
        "class, q266 precedent) while all distance math stays "
        "distributed: per round one narrow projection computes "
        "least-of-s squared distances via the <v,v> - 2<v,c> + <c,c> "
        "identity with centers as plan literals (never a join).  At "
        "100 TB: k corpus scans of one projection each, zero shuffles, "
        "driver traffic = k rows.  DuckDB twin: the same traversal "
        "unrolled as 8 CTE stages (q266's pattern)"
    ),
)
def q277(spark, sf_dir):
    # delegates to operators/similarity.kcenter_traverse (shared with
    # q281's assignment readout)
    from ..operators import similarity as SIM

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double(F.col("embedding")).alias("v")
    )
    centers = SIM.kcenter_traverse(e, _Q277_K)
    # round in-plan (Spark HALF_UP == DuckDB round; Python round() is
    # banker's and would diverge on boundary values)
    return (
        spark.createDataFrame(
            [(s, vid, d) for s, vid, d, _ in centers],
            "step int, vec_id long, sq_dist double",
        )
        .select(
            "step",
            "vec_id",
            F.round(F.sqrt("sq_dist"), 4).alias("radius"),
        )
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# q278 — curriculum schedule (quality-ordered equal-token phases)
# ---------------------------------------------------------------------------

# Curriculum learning's data side (Bengio 2009 applied to corpus
# curation): order the corpus by the q275 model score (cleanest first)
# and cut it into training phases of a fixed TOKEN budget — the
# manifest a staged training run consumes.  Phase boundaries come from
# the inclusive token prefix sum in score order.
_Q278_PHASE_TOKENS = 6_000


@register(
    "q278_curriculum_schedule",
    f"""
    WITH {_Q275_SCORED_CTES}, s2 AS (
        SELECT doc_id, n_toks,
               round(1.0 / (1.0 + exp(-z)), 4) AS score
        FROM scored
    ), cum AS (
        SELECT doc_id, n_toks, score,
               sum(n_toks) OVER (
                   ORDER BY score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_toks
        FROM s2
    )
    SELECT CAST(floor((cum_toks - 1) / {_Q278_PHASE_TOKENS}) + 1 AS INT)
               AS phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS phase_tokens,
           max(score) AS score_hi,
           min(score) AS score_lo
    FROM cum GROUP BY 1 ORDER BY phase
    """,
    doc=(
        "curriculum schedule: the corpus ordered by the q275 model "
        "score (cleanest first) and cut into training phases of "
        f"{_Q278_PHASE_TOKENS} tokens each — the manifest a staged "
        "training run consumes (Bengio 2009's curriculum applied to "
        "corpus curation).  Phase assignment is the inclusive token "
        "prefix sum in (rounded score DESC, doc id) order, computed "
        "with the two-phase distributed prefix sum "
        "(rankstats.prefix_sums_by_value — one range exchange, never a "
        "single-partition window; the q270 discipline).  Scores are "
        "rounded to 4 decimals BEFORE ordering so the total order is "
        "cross-engine-stable; phase math is all-integer after one "
        "exact float division"
    ),
)
def q278(spark, sf_dir):
    from ..operators.quality_model import linear_score, quality_features
    from ..operators.rankstats import prefix_sums_by_value

    d = _t(spark, sf_dir, "documents")
    z = linear_score(_Q275_W)
    s2 = quality_features(d, "text", "doc_id").select(
        "doc_id",
        F.col("n").cast("long").alias("n_toks"),
        F.round(1.0 / (1.0 + F.exp(-z)), 4).alias("score"),
    )
    ordered = s2.withColumn(
        "__ord",
        F.struct(
            (-F.col("score")).alias("ns"), F.col("doc_id").alias("i")
        ),
    )
    cum = prefix_sums_by_value(ordered, "__ord", ["n_toks"])
    return (
        cum.select(
            (
                F.floor(
                    (F.col("cum_n_toks") - 1) / F.lit(_Q278_PHASE_TOKENS)
                )
                + 1
            )
            .cast("int")
            .alias("phase"),
            "n_toks",
            "score",
        )
        .groupBy("phase")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("phase_tokens"),
            F.max("score").alias("score_hi"),
            F.min("score").alias("score_lo"),
        )
        .orderBy("phase")
    )


# ---------------------------------------------------------------------------
# q279 — Wilson lower bound on the per-source kept rate
# ---------------------------------------------------------------------------

# The proportion-ranking primitive (how you rank sources by a pass rate
# without small-sample lies): the Wilson score interval's lower bound
# at 95% — a source with 3/3 kept ranks BELOW one with 180/200.
_Q279_Z = 1.96
_Q279_Z2 = _Q279_Z * _Q279_Z


@register(
    "q279_source_kept_wilson",
    f"""
    WITH {_Q275_SCORED_CTES}, agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE z > 0) AS BIGINT) AS n_kept
        FROM scored GROUP BY source
    ), p AS (
        SELECT source, n_docs, n_kept,
               n_kept * 1.0 / n_docs AS ph
        FROM agg
    )
    SELECT source, n_docs, n_kept,
           round(ph, 6) AS kept_rate,
           round((ph + {_Q279_Z2!r} / (2 * n_docs)
                  - {_Q279_Z!r} * sqrt((ph * (1 - ph)
                        + {_Q279_Z2!r} / (4 * n_docs)) / n_docs))
                 / (1 + {_Q279_Z2!r} / n_docs), 6) AS wilson_lb
    FROM p ORDER BY source
    """,
    doc=(
        "Wilson 95% lower bound on each source's classifier pass rate — "
        "the proportion-ranking primitive (a 3/3 source must rank below "
        "a 180/200 source; a raw rate cannot say that).  One integer "
        "aggregate per source on top of the q275 scored table; the "
        "bound is a closed-form float chain written with the identical "
        "literal shape in both engines.  |sources|-bounded output — "
        "the source-health dashboard row at any corpus scale"
    ),
)
def q279(spark, sf_dir):
    from ..operators.quality_model import linear_score, quality_features

    d = _t(spark, sf_dir, "documents")
    z = linear_score(_Q275_W)
    scored = quality_features(d, "text", "doc_id").select(
        "doc_id", (z > 0).alias("kept")
    )
    agg = (
        d.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
        )
    )
    ph = F.col("n_kept") * 1.0 / F.col("n_docs")
    nd = F.col("n_docs")
    wilson = (
        ph
        + F.lit(_Q279_Z2) / (2 * nd)
        - F.lit(_Q279_Z)
        * F.sqrt((ph * (1 - ph) + F.lit(_Q279_Z2) / (4 * nd)) / nd)
    ) / (1 + F.lit(_Q279_Z2) / nd)
    return agg.select(
        "source",
        "n_docs",
        "n_kept",
        F.round(ph, 6).alias("kept_rate"),
        F.round(wilson, 6).alias("wilson_lb"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q280 — MinHash estimation error (sketch-accuracy eval harness)
# ---------------------------------------------------------------------------

_Q280_K = 16
_Q280_BANDS = 4


def _q280_oracle() -> str:
    from .queries_r2 import _Q90_BAND_CASE, _Q90_MH

    matches = " + ".join(
        f"(CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END)"
        for k in range(_Q280_K)
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
    ), banded AS (
        SELECT id, bt.band,
               CASE bt.band
                 {_Q90_BAND_CASE}
               END AS bucket
        FROM sig, (SELECT unnest(range({_Q280_BANDS})) AS band) bt
    ), cands AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM banded x JOIN banded y USING (band, bucket)
        WHERE x.id < y.id
    ), pairs AS (
        SELECT id_a, id_b,
               round(CAST(len(list_intersect(sha.s, shb.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(sha.s, shb.s))), 6)
                   AS jaccard,
               ({matches}) * 1.0 / {_Q280_K} AS est
        FROM cands
        JOIN sh sha ON sha.id = id_a
        JOIN sh shb ON shb.id = id_b
        JOIN sig sa ON sa.id = id_a
        JOIN sig sb ON sb.id = id_b
    )
    SELECT id_a, id_b, jaccard, est,
           round(abs(jaccard - est), 6) AS abs_err
    FROM pairs ORDER BY id_a, id_b
    """


@register(
    "q280_minhash_estimation_error",
    _q280_oracle(),
    doc=(
        "sketch-accuracy eval harness for the MinHash signature: over "
        "every LSH candidate pair, the signature's Jaccard ESTIMATE "
        "(matching components / K) against the exact shingle-set "
        "Jaccard, with the absolute error — the readout that sizes K "
        "and the band layout before a production dedup run (q56's "
        "xxhash64 path uses the same geometry).  The corpus is "
        "shingled ONCE (persisted table feeds signatures, banding and "
        "the exact verify); estimates are exact multiples of 1/K so "
        "the comparison is float-stable cross-engine.  Portable "
        "md5-derived hashes make every stage DuckDB-reproducible "
        "(q90's discipline, k=16/4 bands)"
    ),
)
def q280(spark, sf_dir):
    from ..cache import track_persist
    from ..operators.dedup_docs import (
        minhash_lsh_candidates,
        minhash_signatures,
        shingle_table,
    )

    d = _t(spark, sf_dir, "documents")
    sh = track_persist(shingle_table(d, "text", "doc_id", 3))
    sigs = minhash_signatures(
        d, num_hashes=_Q280_K, shingles=sh, portable=True
    )
    cands = minhash_lsh_candidates(
        d,
        num_hashes=_Q280_K,
        bands=_Q280_BANDS,
        shingles=sh,
        portable=True,
    )
    sa = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh{k}").alias(f"a{k}") for k in range(_Q280_K)],
    )
    sb = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh{k}").alias(f"b{k}") for k in range(_Q280_K)],
    )
    sha = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    matches = None
    for k in range(_Q280_K):
        term = F.when(F.col(f"a{k}") == F.col(f"b{k}"), 1).otherwise(0)
        matches = term if matches is None else matches + term
    return (
        cands.join(sha, "id_a")
        .join(shb, "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
            (matches * 1.0 / _Q280_K).alias("est"),
        )
        .select(
            "id_a",
            "id_b",
            "jaccard",
            "est",
            F.round(F.abs(F.col("jaccard") - F.col("est")), 6).alias(
                "abs_err"
            ),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q281 — k-center assignment (the clustering readout of q277)
# ---------------------------------------------------------------------------


def _q281_oracle() -> str:
    """q277's unrolled traversal + the VORONOI ASSIGNMENT: every point
    to its nearest center (struct-min over the 8 literal centers, step
    breaks exact-dup ties), per-cell population and covering radius."""

    def dist(v: str, c: str) -> str:
        return (
            f"list_dot_product({v}, {v}) - 2 * list_dot_product({v}, {c})"
            f" + list_dot_product({c}, {c})"
        )

    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1)",
        f"d1 AS (SELECT e.vec_id, e.v, {dist('e.v', 'c1.v')} AS md"
        " FROM e CROSS JOIN c1)",
    ]
    for s in range(2, _Q277_K + 1):
        prev = f"d{s - 1}"
        parts.append(
            f"c{s} AS (SELECT vec_id, v, md FROM {prev}"
            " ORDER BY md DESC, vec_id LIMIT 1)"
        )
        if s < _Q277_K:
            parts.append(
                f"d{s} AS (SELECT p.vec_id, p.v,"
                f" least(p.md, {dist('p.v', f'c{s}.v')}) AS md"
                f" FROM {prev} p CROSS JOIN c{s})"
            )
    structs = ",\n               ".join(
        f"{{'d': {dist('p.v', f'c{s}.v')}, 's': {s}}}"
        for s in range(1, _Q277_K + 1)
    )
    crosses = " ".join(f"CROSS JOIN c{s}" for s in range(1, _Q277_K + 1))
    centers = "\n        UNION ALL ".join(
        f"SELECT {s} AS s, vec_id FROM c{s}"
        for s in range(1, _Q277_K + 1)
    )
    # DuckDB's least() is numeric/varchar-only — list_min over a
    # struct list gives the same field-order-lexicographic minimum
    parts.append(
        f"asg AS (SELECT p.vec_id,\n"
        f"           list_min([{structs}]) AS m\n"
        f"        FROM e p {crosses})"
    )
    parts.append(f"ctr AS ({centers})")
    return (
        ",\n    ".join(parts)
        + """
    SELECT ctr.s AS step, ctr.vec_id AS center_id,
           CAST(count(*) AS BIGINT) AS n_points,
           round(sqrt(max(struct_extract(a.m, 'd'))), 4) AS cell_radius
    FROM asg a JOIN ctr ON ctr.s = struct_extract(a.m, 's')
    GROUP BY ctr.s, ctr.vec_id
    ORDER BY step
    """
    )


@register(
    "q281_kcenter_assignment",
    _q281_oracle(),
    doc=(
        "k-center Voronoi assignment — the clustering readout of q277's "
        "traversal: every embedding assigned to its nearest of the 8 "
        "selected centers (struct-min over literal centers, center step "
        "breaks exact-duplicate ties), reporting per-cell population "
        "and covering radius — the balance/coverage audit that decides "
        "whether the core-set k was enough.  Assignment is one narrow "
        "projection (centers are plan literals — never a join against "
        "a center table) + one |k|-bounded aggregate; at 100 TB the "
        "cost is a single corpus scan after the k bounded traversal "
        "rounds.  DuckDB twin: the same traversal + a least()-of-"
        "structs assignment (struct comparison is field-order "
        "lexicographic in both engines)"
    ),
)
def q281(spark, sf_dir):
    from ..operators import similarity as SIM

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.as_double(F.col("embedding")).alias("v")
    )
    centers = SIM.kcenter_traverse(e, _Q277_K)

    def dist_to(center: list[float]):
        c = F.array(*[F.lit(float(x)) for x in center])
        return (
            SIM.dot(F.col("v"), F.col("v"))
            - 2 * SIM.dot(F.col("v"), c)
            + SIM.dot(c, c)
        )

    m = F.least(
        *[
            F.struct(dist_to(cv).alias("d"), F.lit(s).alias("s"))
            for s, _, _, cv in centers
        ]
    )
    ctr = spark.createDataFrame(
        [(s, vid) for s, vid, _, _ in centers], "step int, center_id long"
    )
    cells = (
        e.select(m.alias("m"))
        .groupBy(F.col("m.s").alias("step"))
        .agg(
            F.count("*").alias("n_points"),
            F.round(F.sqrt(F.max("m.d")), 4).alias("cell_radius"),
        )
    )
    return (
        cells.join(F.broadcast(ctr), "step")
        .select("step", "center_id", "n_points", "cell_radius")
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# q282 — two-sided trimmed mean (robust location per segment)
# ---------------------------------------------------------------------------


@register(
    "q282_trimmed_mean_order_value",
    """
    WITH base AS (
        SELECT c.c_mktsegment AS segment,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cuts AS (
        SELECT segment,
               quantile_cont(cents, 0.1) AS lo,
               quantile_cont(cents, 0.9) AS hi
        FROM base GROUP BY segment
    )
    SELECT b.segment,
           CAST(count(*) AS BIGINT) AS n_all,
           CAST(count(*) FILTER (WHERE cents >= lo AND cents <= hi)
                AS BIGINT) AS n_kept,
           round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 4)
               AS raw_mean,
           round(CAST(sum(cents) FILTER (WHERE cents >= lo AND cents <= hi)
                      AS DOUBLE)
                 / count(*) FILTER (WHERE cents >= lo AND cents <= hi)
                 / 100.0, 4) AS trimmed_mean
    FROM base b JOIN cuts USING (segment)
    GROUP BY b.segment ORDER BY b.segment
    """,
    doc=(
        "10% two-sided trimmed mean of order value per market segment — "
        "the robust location estimate (outlier-immune where the raw "
        "mean is not; complements q82's median and q114/q235's weighted "
        "medians).  Per-segment p10/p90 cuts from one interpolated-"
        "percentile aggregate broadcast back (|segments| rows), then "
        "one conditional aggregate over exact integer cents — the only "
        "floats are the shared (n-1)p interpolation (q249 precedent) "
        "and two final divisions.  Two scans, both partial-merging; "
        "nothing grows with corpus size but the scan"
    ),
)
def q282(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    base = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "segment",
        F.floor(F.col("o_totalprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    cuts = base.groupBy("segment").agg(
        F.expr("percentile(cents, 0.1D)").alias("lo"),
        F.expr("percentile(cents, 0.9D)").alias("hi"),
    )
    inside = (F.col("cents") >= F.col("lo")) & (
        F.col("cents") <= F.col("hi")
    )
    return (
        base.join(F.broadcast(cuts), "segment")
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_all"),
            F.count(F.when(inside, 1)).alias("n_kept"),
            F.round(
                F.sum("cents").cast("double") / F.count("*") / 100.0, 4
            ).alias("raw_mean"),
            F.round(
                F.sum(F.when(inside, F.col("cents")))
                .cast("double")
                / F.count(F.when(inside, 1))
                / 100.0,
                4,
            ).alias("trimmed_mean"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# q283 — Holt double-exponential smoothing (linear-trend forecast)
# ---------------------------------------------------------------------------

# The forecasting workhorse next to q244's seasonal-naive MASE: level +
# trend smoothed by a SEQUENTIAL recurrence.  The corpus-sized work is
# the daily aggregate; the recurrence itself is |days|-bounded and runs
# IN-PLAN as one fold over the sorted day array (a single bounded
# reduce — the q272 "config-table driver fill" class, but kept inside
# the engine).  h_t = a·x_t + (1-a)(h+b); b_t = β(h_t - h) + (1-β)b.
_Q283_A = 0.3
_Q283_1A = 1.0 - _Q283_A
_Q283_B = 0.1
_Q283_1B = 1.0 - _Q283_B


def _q283_oracle() -> str:
    # the recursive term writes h' INLINE inside b' (the exact shape
    # the Spark fold evaluates) so the float chains agree
    hp = f"{_Q283_A!r} * s.x + {_Q283_1A!r} * (r.h + r.b)"
    return f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) AS x
        FROM orders GROUP BY 1
    ), seq AS (
        SELECT x, row_number() OVER (ORDER BY d) AS i,
               count(*) OVER () AS n
        FROM daily
    ), rec AS (
        SELECT CAST(1 AS BIGINT) AS i, s1.x AS h, s2.x - s1.x AS b,
               CAST(0.0 AS DOUBLE) AS sse, s1.n AS n
        FROM (SELECT x, n FROM seq WHERE i = 1) s1,
             (SELECT x FROM seq WHERE i = 2) s2
        UNION ALL
        SELECT s.i,
               {hp} AS h,
               {_Q283_B!r} * (({hp}) - r.h) + {_Q283_1B!r} * r.b AS b,
               r.sse + (s.x - (r.h + r.b)) * (s.x - (r.h + r.b)) AS sse,
               r.n
        FROM rec r JOIN seq s ON s.i = r.i + 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(h / 100, 4) AS level,
           round(b / 100, 4) AS trend,
           round((h + 7 * b) / 100, 4) AS forecast_7,
           round(sqrt(sse / (n - 1)) / 100, 4) AS rmse_1step
    FROM rec WHERE i = n
    """


@register(
    "q283_holt_linear_forecast",
    _q283_oracle(),
    doc=(
        "Holt double-exponential smoothing over daily revenue (level + "
        "trend, a=0.3/beta=0.1) with the 7-day-ahead forecast and the "
        "one-step-ahead RMSE — the forecasting workhorse q244's "
        "seasonal-naive MASE benchmarks against.  The corpus-sized "
        "work is ONE partial-merging daily aggregate over exact "
        "integer cents; the inherently sequential recurrence then runs "
        "IN-PLAN as a single fold over the sorted |days|-bounded array "
        "(2.4k steps — never a corpus-sized window, never a driver "
        "loop).  The DuckDB twin is the same recurrence as a recursive "
        "CTE, with h_t written INLINE inside b_t in both engines so "
        "the float chains are bit-identical"
    ),
)
def q283(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            )
            .cast("double")
            .alias("x")
        )
    )
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("a")
    )

    def step(acc, e):
        hp = _Q283_A * e["x"] + _Q283_1A * (acc["h"] + acc["b"])
        bp = (
            _Q283_B
            * (
                (_Q283_A * e["x"] + _Q283_1A * (acc["h"] + acc["b"]))
                - acc["h"]
            )
            + _Q283_1B * acc["b"]
        )
        err = e["x"] - (acc["h"] + acc["b"])
        return F.struct(
            hp.alias("h"),
            bp.alias("b"),
            (acc["sse"] + err * err).alias("sse"),
        )

    x1 = F.element_at("a", 1)["x"]
    x2 = F.element_at("a", 2)["x"]
    init = F.struct(
        x1.alias("h"), (x2 - x1).alias("b"), F.lit(0.0).alias("sse")
    )
    acc = F.aggregate(
        F.slice(F.col("a"), F.lit(2), F.size("a") - 1), init, step
    )
    n = F.size("a")
    return arr.select(
        n.cast("long").alias("n_days"),
        F.round(acc["h"] / 100, 4).alias("level"),
        F.round(acc["b"] / 100, 4).alias("trend"),
        F.round((acc["h"] + 7 * acc["b"]) / 100, 4).alias("forecast_7"),
        F.round(F.sqrt(acc["sse"] / (n - 1)) / 100, 4).alias(
            "rmse_1step"
        ),
    )


# ---------------------------------------------------------------------------
# q284 — Mann-Kendall trend test (non-parametric monotone trend)
# ---------------------------------------------------------------------------

# The distribution-free companion to q283's parametric smoothing: is
# the daily series monotonically trending at all?  S = Σ_{i<j}
# sign(x_j − x_i) over day pairs, variance with the tie correction,
# normal-approximation z.  Everything through the variance is EXACT
# integer arithmetic; the pair space is |days|², bounded by the
# calendar — never by corpus size (the corpus-sized work is the one
# daily aggregate).


@register(
    "q284_mann_kendall_trend",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), s AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END)
                    AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM daily a JOIN daily b ON b.d > a.d
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM daily
    ), ties AS (
        SELECT COALESCE(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT),
                        0) AS tie_term
        FROM (
            SELECT CAST(count(*) AS BIGINT) AS t
            FROM daily GROUP BY x HAVING count(*) > 1
        )
    )
    SELECT s.s AS s_stat, n.n AS n_days,
           CAST((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term)
                AS BIGINT) AS var18,
           round((s.s - CASE WHEN s.s > 0 THEN 1
                             WHEN s.s < 0 THEN -1 ELSE 0 END)
                 / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term)
                        / 18.0), 4) AS z,
           CASE WHEN s.s > 0 THEN 'increasing'
                WHEN s.s < 0 THEN 'decreasing'
                ELSE 'none' END AS direction
    FROM s, n, ties
    """,
    doc=(
        "Mann-Kendall non-parametric trend test over daily revenue — "
        "the distribution-free 'is it trending at all' companion to "
        "q283's parametric smoothing (the standard pairing in "
        "hydrology/ops monitoring).  S, n and the tie-corrected "
        "variance numerator are EXACT integer arithmetic over integer "
        "cents; the only floats are one sqrt and one division, written "
        "identically in both engines.  The pair join is |days|² — "
        "bounded by the calendar, never by corpus size; the corpus-"
        "sized work is the one partial-merging daily aggregate"
    ),
)
def q284(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            )
            .cast("long")
            .alias("x")
        )
    )
    from ..cache import track_persist

    daily = track_persist(daily)
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    s_row = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    n_row = daily.agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    joined = s_row.crossJoin(n_row).crossJoin(ties)
    n, s = F.col("n"), F.col("s")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    sgn = F.when(s > 0, 1).when(s < 0, -1).otherwise(0)
    return joined.select(
        s.alias("s_stat"),
        n.alias("n_days"),
        var18.alias("var18"),
        F.round((s - sgn) / F.sqrt(var18 / 18.0), 4).alias("z"),
        F.when(s > 0, "increasing")
        .when(s < 0, "decreasing")
        .otherwise("none")
        .alias("direction"),
    )
