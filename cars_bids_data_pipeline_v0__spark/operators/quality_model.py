"""Pretrained linear quality model (the fastText-style classifier stage).

Every modern web-curation pipeline (CCNet, DCLM, FineWeb-Edu) runs a
MODEL gate after the rule gates: a lightweight classifier scores each
document and the release keeps the high-scoring slice.  This module is
that stage with the training externalized — the weights arrive as a
plain dict (from a notebook, a logistic regression, or hand-tuning) and
scoring is a pure Spark plan: one explode + two all-integer
map-side-combining aggregations + one keyed join back.  No Python UDFs,
no model server, nothing per-row on the driver.

Scale shape (100 TB): the explode is linear in corpus tokens, both
aggregations combine map-side keyed by doc id, and the join back is
co-partitioned on the same key the aggregation just shuffled on — one
effective exchange over the corpus.  Features are exact integer ratios,
so the score is reproducible across engines (q275's DuckDB twin hashes
the same math); the keep/cut decision is the SIGN of the raw linear
score, immune to float rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# The default "pretrained" model (the q275 registry query's weights):
# interpretable features, intercept centering z near 0 on the synthetic
# corpus so the decision is non-degenerate.
DEFAULT_WEIGHTS: dict[str, float] = {
    "intercept": -6.8,
    "ttr": 3.0,  # type-token ratio: lexical diversity up => quality up
    "top_frac": -6.0,  # single-token dominance => boilerplate
    "mean_word_len": 0.8,  # longer words => denser prose
    "stop_frac": 4.0,  # stopword presence => natural language
    "log_n_toks": 0.5,  # longer docs favored, log-damped
}
DEFAULT_STOPWORDS: tuple[str, ...] = ("the", "a")


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Per-document integer feature counts: ``(id_col, n, d, top, chars,
    stop)`` = token count, distinct-token count, top token's count,
    character count over tokens, stopword count.  One explode + two
    map-side-combining aggregations — exact integers all the way."""
    tok = df.select(
        id_col,
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    cnts = tok.groupBy(id_col, "tok").agg(F.count("*").alias("cnt"))
    return cnts.groupBy(id_col).agg(
        F.sum("cnt").alias("n"),
        F.count("*").alias("d"),
        F.max("cnt").alias("top"),
        F.sum(F.length("tok") * F.col("cnt")).alias("chars"),
        F.sum(
            F.when(F.col("tok").isin(*stopwords), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("stop"),
    )


def linear_score(w: dict[str, float]) -> Column:
    """The raw linear score over :func:`quality_features` columns, built
    with a FIXED literal/associativity shape (left-assoc sum of five
    weighted terms, each ``literal * (int * 1.0 / int)``) so the float
    chain is bit-identical to the SQL twin q275 hashes against."""
    return (
        F.lit(w["intercept"])
        + w["ttr"] * (F.col("d") * 1.0 / F.col("n"))
        + w["top_frac"] * (F.col("top") * 1.0 / F.col("n"))
        + w["mean_word_len"] * (F.col("chars") * 1.0 / F.col("n"))
        + w["stop_frac"] * (F.col("stop") * 1.0 / F.col("n"))
        + w["log_n_toks"] * F.log(F.col("n").cast("double"))
    )


def score_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Score every document with the linear quality model: all of
    ``df``'s columns plus ``quality_score`` (sigmoid, double) and
    ``quality_kept`` (sign of the raw linear score, boolean).

    The feature aggregation shuffles on ``id_col`` and the join back is
    keyed on the same column, so the whole stage is one effective
    exchange; the model itself is plan literals (never a broadcast
    table, never a UDF)."""
    w = dict(DEFAULT_WEIGHTS, **(weights or {}))
    z = linear_score(w)
    scored = quality_features(df, text_col, id_col, stopwords).select(
        id_col,
        (1.0 / (1.0 + F.exp(-z))).alias("quality_score"),
        (z > 0).alias("quality_kept"),
    )
    return df.join(scored, id_col)
