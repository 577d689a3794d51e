"""Deterministic sampling/split semantics: stability under re-run and
repartitioning, disjoint-exhaustive splits, sane fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    train_val_test_split,
)

SF = "/root/testdata/sf0.001"


def test_sample_stable_under_rerun_and_repartition(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = sorted(r["doc_id"] for r in deterministic_sample(d, "doc_id", 0.25).collect())
    s2 = sorted(
        r["doc_id"]
        for r in deterministic_sample(d.repartition(7), "doc_id", 0.25).collect()
    )
    assert s1 == s2 and len(s1) > 0
    # roughly the requested fraction (md5 buckets are uniform)
    assert 0.1 < len(s1) / d.count() < 0.4


def test_split_disjoint_exhaustive_stable(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = train_val_test_split(d, "doc_id", train=0.8, val=0.1)
    n = d.count()
    by_split = {r["split"]: r["n"] for r in
                out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == n  # exhaustive
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]
    # stability: same membership on re-run
    a = {(r["doc_id"], r["split"]) for r in out.collect()}
    b = {
        (r["doc_id"], r["split"])
        for r in train_val_test_split(
            d.repartition(5), "doc_id", train=0.8, val=0.1
        ).collect()
    }
    assert a == b


def test_fast_path_bucket_is_uniform_ish(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    counts = [
        r["n"]
        for r in d.select(hash_bucket("doc_id", 8).alias("b"))
        .groupBy("b").agg(F.count("*").alias("n")).collect()
    ]
    assert len(counts) == 8
    assert max(counts) < 3 * min(counts)


def test_sketch_aggregates_within_error_bounds(spark):
    """approx_count_distinct (HLL) and approx percentile — the documented
    100 TB swap-ins for q16/q18-style exact aggregates — must land within
    their advertised error."""
    from cars_bids_data_pipeline_v0__spark.sources.ingest import read_table

    e = read_table(spark, SF, "events")
    exact_users = e.select("user_id").distinct().count()
    approx = e.select(
        F.approx_count_distinct("user_id", rsd=0.05).alias("n")
    ).collect()[0]["n"]
    assert abs(approx - exact_users) / exact_users < 0.15

    exact_p50 = e.select(
        F.percentile("value", F.lit(0.5)).alias("p")
    ).collect()[0]["p"]
    approx_p50 = e.select(
        F.percentile_approx("value", F.lit(0.5), F.lit(1000)).alias("p")
    ).collect()[0]["p"]
    assert abs(approx_p50 - exact_p50) <= 1.0


def test_es_weighted_sample_biased_toward_heavy_rows(spark):
    """q174 (A-Res weighted sampling): selection probability must rise
    with weight — the sampled docs' mean n_chars exceeds the corpus mean
    (the COVERAGE-claimed weighted-bias sanity)."""
    from cars_bids_data_pipeline_v0__spark.plans.queries import (
        REGISTRY,
        _load_extensions,
    )

    _load_extensions()
    rows = REGISTRY["q174_weighted_sample_without_replacement"].builder(
        spark, SF
    ).collect()
    assert len(rows) == 100
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus_mean = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean
