"""Skew-mitigation operators must be exact rewrites: salted two-phase
aggregation and the replicated salted join produce the same rows as their
direct equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.skew import (
    deterministic_salt,
    replicate_join,
    salted_two_phase_agg,
)
from cars_bids_data_pipeline_v0__spark.sources.ingest import read_table

SF = "/root/testdata/sf0.001"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_matches_direct(spark):
    e = read_table(spark, SF, "events")
    direct = e.groupBy("event_type").agg(
        F.count("event_id").alias("n"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.avg("value").alias("av"),
    )
    salted = salted_two_phase_agg(
        e,
        keys=["event_type"],
        metrics={
            "n": ("count", "event_id"),
            "mn": ("min", "value"),
            "mx": ("max", "value"),
            "av": ("avg", "value"),
        },
        salt_from="event_id",
        num_salts=8,
    )
    d = {r["event_type"]: r for r in direct.collect()}
    s = {r["event_type"]: r for r in salted.collect()}
    assert d.keys() == s.keys()
    for k in d:
        assert d[k]["n"] == s[k]["n"]
        assert d[k]["mn"] == s[k]["mn"]
        assert d[k]["mx"] == s[k]["mx"]
        assert abs(d[k]["av"] - s[k]["av"]) < 1e-9  # sum order may differ


def test_replicate_join_matches_plain_join(spark):
    e = read_table(spark, SF, "events").select(
        "event_id", "user_id", "value"
    )
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = e.join(c, "user_id").select("event_id", "c_mktsegment")
    salted = replicate_join(
        e, c, on=["user_id"], salt_from="event_id", num_salts=4
    ).select("event_id", "c_mktsegment")
    assert rows(plain) == rows(salted)


def test_replicate_left_join_keeps_unmatched(spark):
    e = spark.createDataFrame(
        [(1, 10), (2, 999_999)], ["event_id", "user_id"]
    )
    c = spark.createDataFrame([(10, "A")], ["user_id", "seg"])
    out = replicate_join(
        e, c, on=["user_id"], salt_from="event_id", num_salts=4, how="left"
    )
    got = {r["event_id"]: r["seg"] for r in out.collect()}
    assert got == {1: "A", 2: None}


def test_salt_is_deterministic_and_bounded(spark):
    e = read_table(spark, SF, "events").limit(100)
    s1 = rows(e.select(deterministic_salt("event_id", 16)))
    s2 = rows(e.select(deterministic_salt("event_id", 16)))
    assert s1 == s2
    assert all(0 <= v[0] < 16 for v in s1)
