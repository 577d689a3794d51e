"""Bloom-filter join pruning (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom,
)


def test_bloom_no_false_negatives_and_prunes(spark):
    small = spark.range(0, 500).select((F.col("id") * 17 + 3).alias("k"))
    big = spark.range(0, 50_000).select(F.col("id").alias("k"))
    words = build_bloom(small, "k", n_bits=1 << 16)
    assert len(words) == (1 << 16) // 64

    kept = big.filter(bloom_might_contain("k", words))
    member_keys = {r["k"] for r in small.filter(F.col("k") < 50_000).collect()}
    kept_keys = {r["k"] for r in kept.collect()}
    assert member_keys <= kept_keys  # a Bloom filter never drops a member
    # and at this density it prunes almost everything else
    assert len(kept_keys) < 2 * len(member_keys)


def test_bloom_semi_join_exact(spark):
    small = spark.createDataFrame(
        [(3,), (3,), (7,), (None,)], "sk long"  # dup + null keys
    )
    big = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    out = bloom_semi_join(big, small, "k", "sk")
    exact = big.join(
        small.select(F.col("sk").alias("k")).distinct(), "k", "left_semi"
    )
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in exact.collect()
    ) == [3, 7]
    assert out.columns == big.columns


def test_bloom_semi_join_exact_across_key_types(spark):
    # xxhash64(INT) != xxhash64(BIGINT) for the same value; without type
    # normalization true members would be pruned before the exact join
    small = spark.range(0, 50).select(F.col("id").cast("int").alias("sk"))
    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = bloom_semi_join(big, small, "k", "sk")
    assert sorted(r["k"] for r in out.collect()) == list(range(50))
