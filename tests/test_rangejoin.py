"""Range-join semantics: closed-open intervals, overlap multiplicity,
bucket-edge values — differential against the plain theta join."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.rangejoin import range_join


def test_closed_open_and_overlaps(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 5.0), (3, 9.999), (4, 10.0), (5, 14.0), (6, 30.0)],
        ["pid", "v"],
    )
    # overlapping bands: [0,10) and [5,15)
    bands = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 5.0, 15.0)], ["bid", "lo", "hi"]
    )
    got = sorted(
        (r["pid"], r["bid"])
        for r in range_join(pts, bands, "v", "lo", "hi", 4.0).collect()
    )
    assert got == [
        (1, 100),            # 0.0 in [0,10) only
        (2, 100), (2, 200),  # 5.0 in both
        (3, 100), (3, 200),
        (4, 200),            # hi=10 exclusive for band 100
        (5, 200),
        # 30.0 matches nothing
    ]


def test_matches_theta_join_differential(spark):
    from cars_bids_data_pipeline_v0__spark.sources.ingest import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("value").isNotNull()
    ).select("event_id", "value")
    bands = spark.createDataFrame(
        [(i, i * 7.0, i * 7.0 + 11.0) for i in range(12)],
        ["bid", "lo", "hi"],
    )
    fast = sorted(
        (r["event_id"], r["bid"])
        for r in range_join(e, bands, "value", "lo", "hi", 3.0).collect()
    )
    theta = sorted(
        (r["event_id"], r["bid"])
        for r in e.join(
            bands,
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        ).collect()
    )
    assert fast == theta and len(fast) > 0
