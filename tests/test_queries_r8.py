"""Round-8 query-surface tests: the decontamination machinery on a
CLEAN corpus (the 0-hit case the oracle no longer certifies, kept here
per VERDICT r7 directive 4), and the planted-overlap arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.dedup_docs import (
    fan_out,
    word_shingles,
)
from cars_bids_data_pipeline_v0__spark.plans import queries_r7b as R7B
from cars_bids_data_pipeline_v0__spark.plans.queries import _t

SF_DIR = "/root/testdata/sf0.001"


def _overlap(docs):
    """The q254 overlap audit over an arbitrary doc frame (no plant)."""
    inv = fan_out(docs).select(
        "doc_id",
        F.explode(word_shingles("text", R7B._Q254_NGRAM)).alias("shingle"),
    )
    train = inv.where(F.col("doc_id") % R7B._Q254_EVAL_MOD != 0)
    ev = inv.where(F.col("doc_id") % R7B._Q254_EVAL_MOD == 0)
    return (
        train.join(
            F.broadcast(ev.withColumnRenamed("doc_id", "eval_id")), "shingle"
        )
        .groupBy(F.col("doc_id").alias("train_id"))
        .agg(F.countDistinct("shingle").alias("n_grams_hit"))
        .where(F.col("n_grams_hit") >= R7B._Q254_MIN_HITS)
    )


def test_clean_corpus_has_no_contamination(spark):
    """Without the plant, the sf0.01 corpus shares no 8-gram across the
    eval split — the 0-hit steady state a healthy pipeline sees.  (The
    sf0.001 corpus carries two ORGANIC near-dup train docs that overlap
    eval — the planted test below tolerates those extras.)"""
    docs = _t(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    assert _overlap(docs).count() == 0


def test_planted_overlap_is_found_and_attributed(spark):
    """Planting the q254 phrase on eval + train subsets makes exactly
    the planted non-eval train docs surface, each via >=4 shared
    interior shingles (11-word plant -> 4 complete 8-grams)."""
    docs = _t(spark, SF_DIR, "documents").select(
        "doc_id",
        F.when(
            (F.col("doc_id") % R7B._Q254_EVAL_MOD == 0)
            | (F.col("doc_id") % R7B._Q254_TRAIN_MOD == 3),
            F.concat(F.col("text"), F.lit(" " + R7B._Q254_PLANT)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    planted_train = {
        r[0]
        for r in docs.where(
            (F.col("doc_id") % R7B._Q254_TRAIN_MOD == 3)
            & (F.col("doc_id") % R7B._Q254_EVAL_MOD != 0)
        )
        .select("doc_id")
        .collect()
    }
    got = {r["train_id"]: r["n_grams_hit"] for r in _overlap(docs).collect()}
    assert planted_train <= set(got)
    assert all(got[t] >= 3 for t in planted_train)


def test_q254_registry_entry_returns_planted_rows(spark):
    got = R7B.q254(spark, SF_DIR)
    rows = got.collect()
    assert len(rows) >= 1  # the hash now certifies a non-empty answer
    assert got.columns == ["train_id", "n_grams_hit", "n_eval_docs"]
