"""Profiling and expectation operators: single-pass stats correctness and
quarantine tagging."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.expectations import check
from cars_bids_data_pipeline_v0__spark.operators.profile import profile


def test_profile_single_pass_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 9.0), (3, "b", None), (4, "a", 2.0)],
        ["id", "s", "v"],
    )
    got = {r["column"]: r for r in profile(df).collect()}
    assert got["id"]["n_nulls"] == 0 and got["id"]["n_distinct"] == 4
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "4"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_nulls"] == 1
    # native-type ordering: 2.0 < 9.0 < 10.0 (string order would say "10" < "9")
    assert got["v"]["min_value"] == "2.0" and got["v"]["max_value"] == "10.0"


def test_profile_is_one_scan(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    # exact mode: one scan (multi-column exact distinct costs an Expand)
    plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1 and "Union" not in plan
    # approx (HLL) mode: no Expand — a genuinely single Aggregate
    plan_a = (
        profile(df, approx_distinct=True)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan_a.count("Aggregate") == 1 and "Expand" not in plan_a


def test_expectations_tag_all_broken_rules(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, -1.0), (4, None)], ["id", "v"]
    )
    good, bad = check(
        df,
        {
            "id_present": F.col("id").isNotNull(),
            "v_positive": F.col("v") > 0,
        },
    )
    assert [r["id"] for r in good.collect()] == [1]
    tagged = {
        tuple(r["failed_expectations"]): r["id"] for r in bad.collect()
    }
    assert ("v_positive",) in tagged          # row id=2
    assert ("id_present", "v_positive") in tagged  # null id AND negative v
    # null expectation value counts as failure (F1's NA-means-invalid)
    assert ("v_positive",) in tagged and tagged[("v_positive",)] in (2, 4)
