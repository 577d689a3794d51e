"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) as reusable operators.

Scoring: per-doc importance weight log p_target(doc)/p_raw(doc) under
Laplace-smoothed hashed-ngram (word uni+bigram) bag models — the cheap
standard for selecting pretraining data "like" a target corpus without
training a classifier.  Selection: sample-without-replacement with
probability ∝ exp(weight) via the Gumbel-max trick (RNG-free: the
per-doc uniform derives from the doc id's portable md5 hash — the
q19/q137 reproducible-assignment discipline), here extended to a TOKEN
budget: keep the race's leading docs until their cumulative token count
fills the budget, computed with the two-phase distributed prefix sum
(`rankstats.prefix_sums_by_value`) — no single-partition window at any
corpus size.

The oracled registry twins are q267 (weights) and q269 (resampling),
which delegate here; `plans/release.py` wires `dsir_resample` into the
release capstone as its selection stage.

Scale shape (100 TB): one corpus scan builds the persisted gram-array
frame (explode-fusion barrier — ARCHITECTURE.md round-9/10 audit rule);
bucket models are one 512-bounded map-side-combining aggregate; the
weight table broadcasts back onto the gram stream; selection adds one
narrow map plus the prefix-sum's single range exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import track_persist

#: hashed-ngram bucket count (matches q267's oracle constant)
DSIR_BUCKETS = 512
#: portable-hash value space for the Gumbel uniform (60-bit md5 prefix)
DSIR_HASH_SPACE = float(1 << 60)


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    weight_col: str = "dsir_w",
    hash_prefix: str = "dsir:",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """``(id_col, *carry_cols, weight_col)`` — per-doc DSIR log-ratio
    importance weights; ``is_target`` marks the target-domain rows of
    ``df`` (the raw model is estimated over ALL rows, the target model
    over the marked slice, both Laplace-smoothed).  ``carry_cols`` ride
    along per-doc columns (functionally dependent on ``id_col``)
    through the aggregate — q267 carries ``lang``.

    The uni+bigram gram array is MATERIALIZED behind a persist before
    the explode (fused codegen would re-evaluate the tokenize+transform
    builder per output row — the measured quadratic tax), and the one
    persisted frame feeds both passes: bucket counting and per-doc
    scoring.  Portable md5 bucket hashing keeps DuckDB twins bit-exact
    (q90–q93 discipline)."""
    from .dedup_docs import portable_hash60

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: t.rlike("^[a-z]+$"),
    )
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.concat(
            F.element_at("t", i),
            F.lit(" "),
            F.element_at("t", i + 1),
        ),
    )
    carry = list(carry_cols or [])
    base = track_persist(
        df.select(
            F.col(id_col),
            *carry,
            is_target.alias("__tgt"),
            toks.alias("t"),
        ).select(
            id_col,
            *carry,
            "__tgt",
            F.when(F.size("t") >= 2, F.concat(F.col("t"), bigrams))
            .otherwise(F.col("t"))
            .alias("grams"),
        )
    )
    hashed = base.select(
        id_col, *carry, "__tgt", F.explode("grams").alias("g")
    ).select(
        id_col,
        *carry,
        "__tgt",
        F.pmod(portable_hash60("g", hash_prefix), F.lit(n_buckets)).alias(
            "b"
        ),
    )
    bucket = hashed.groupBy("b").agg(
        F.count("*").alias("c_r"),
        F.count(F.when(F.col("__tgt"), 1)).alias("c_t"),
    )
    totals = bucket.agg(
        F.sum("c_r").cast("double").alias("r_total"),
        F.sum("c_t").cast("double").alias("t_total"),
    )
    bucket_w = bucket.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("t_total") + n_buckets))
            - F.log((F.col("c_r") + 1.0) / (F.col("r_total") + n_buckets))
        ).alias("w"),
    )
    return (
        hashed.join(F.broadcast(bucket_w), "b")
        .groupBy(id_col, *carry)
        .agg(F.sum("w").alias(weight_col))
    )


def dsir_race_key(
    weight: Column, doc_id: Column, hash_prefix: str = "gum:"
) -> Column:
    """Gumbel-max race key: ``weight + Gumbel(u)`` with ``u`` a
    pseudo-uniform from the doc id's portable hash — descending order of
    this key IS a without-replacement sample ∝ exp(weight)."""
    from .dedup_docs import portable_hash60

    u = (portable_hash60(doc_id.cast("string"), hash_prefix) + F.lit(1.0)) / (
        F.lit(DSIR_HASH_SPACE + 2.0)
    )
    return weight - F.log(-F.log(u))


def dsir_resample(
    df: DataFrame,
    is_target: Column,
    token_budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    key_decimals: int | None = None,
) -> DataFrame:
    """DSIR selection to a TOKEN budget: score ``df``, race by
    Gumbel-max, and keep the race's leading documents whose cumulative
    whitespace-token count stays within ``token_budget`` (inclusive
    prefix sums in descending race order — a doc is kept iff everything
    up to and including it fits).  Returns the selected rows of ``df``
    (original columns), plus ``dsir_w`` and ``race_key``.

    Deterministic and RNG-free: same input → same selection, on any
    cluster layout (the q19/q137 discipline); the cutoff is exact, not
    a sampled rate — the budget-solver trade q170 documents.

    ``key_decimals`` rounds the race key BEFORE ordering (doc id still
    breaks ties): the weight is a float sum whose last-ulp depends on
    aggregation order, so a cross-engine oracle (q270) must race on
    rounded keys to be bit-reproducible — in-engine callers (the
    release capstone) don't need it."""
    from .text import token_count
    from ..operators.rankstats import prefix_sums_by_value

    w = dsir_weights(
        df, is_target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets,
    )
    race = dsir_race_key(F.col("dsir_w"), F.col(id_col))
    if key_decimals is not None:
        race = F.round(race, key_decimals)
    scored = (
        df.join(w, id_col)
        .withColumn("race_key", race)
        .withColumn("__toks", token_count(text_col))
        # descending race as an ascending total order (struct fields
        # compare in sequence; id breaks float ties deterministically)
        .withColumn(
            "__race_ord",
            F.struct(
                (-F.col("race_key")).alias("nr"),
                F.col(id_col).alias("i"),
            ),
        )
    )
    cum = prefix_sums_by_value(scored, "__race_ord", ["__toks"])
    return cum.filter(F.col("cum___toks") <= token_budget).drop(
        "__race_ord", "__toks", "cum___toks"
    )
