"""rankstats operators: distributed prefix sums + KS / Mann-Whitney.

Oracle parity lives in q214/q215/q217; here the operator-level
invariants: the two-phase prefix sum equals the naive sequential cumsum
on arbitrary data, and the test statistics match hand-computed values on
small samples (including ties).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.rankstats import (
    ks_two_sample,
    mann_whitney_u,
    prefix_sums_by_value,
)


def test_prefix_sums_match_sequential_cumsum(spark):
    # 1000 distinct values, deliberately unordered input, two sum columns
    rows = [
        (v, (v * 7919) % 23, (v * 104729) % 5)
        for v in range(1000, 0, -1)
    ]
    df = spark.createDataFrame(rows, "v long, a long, b long")
    got = {
        r["v"]: (r["cum_a"], r["cum_b"])
        for r in prefix_sums_by_value(df, "v", ["a", "b"]).collect()
    }
    ca = cb = 0
    for v, a, b in sorted(rows):
        ca, cb = ca + a, cb + b
        assert got[v] == (ca, cb), v


def test_prefix_sums_every_stage_keyed(spark):
    df = spark.range(100).select(
        F.col("id").alias("v"), F.lit(1).alias("a")
    )
    out = prefix_sums_by_value(df, "v", ["a"])
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the cumulative window partitions on the materialized pid column —
    # never an unpartitioned ordered window
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__rs_pid" in line, line


def test_ks_two_sample_hand_value(spark):
    # g1 = {1,2,3}, g2 = {2,3,4,5}: CDF gaps at v=1: |1/3-0|=1/3,
    # v=2: |2/3-1/4|=5/12, v=3: |1-2/4|=1/2, v=4: |1-3/4|, v=5: 0 → D=1/2
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (2, "y"), (3, "y"), (4, "y"), (5, "y")],
        "v long, g string",
    )
    row = ks_two_sample(df, "v", "g", "x", "y").collect()[0]
    assert (row["n1"], row["n2"]) == (3, 4)
    assert row["ks_d"] == pytest.approx(0.5)


def test_mann_whitney_hand_value_with_ties(spark):
    # g1 = {1, 2, 2}, g2 = {2, 3}: sorted 1,2,2,2,3 → ranks 1, 3, 3, 3, 5
    # R1 = 1+3+3 = 7; U1 = 7 - 3·4/2 = 1
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, "x"), (2, "y"), (3, "y")],
        "v long, g string",
    )
    row = mann_whitney_u(df, "v", "g", "x", "y").collect()[0]
    assert (row["n1"], row["n2"]) == (3, 2)
    assert row["u1"] == pytest.approx(1.0)
    # tie-corrected z: mu = 3, sigma = sqrt((6/12)·(6 − 24/20)) = sqrt(2.4)
    assert row["z"] == pytest.approx((1.0 - 3.0) / (2.4 ** 0.5))


def test_mann_whitney_symmetry(spark):
    # swapping groups: U2 = n1·n2 − U1, z flips sign
    df = spark.createDataFrame(
        [(float(v % 17), "x" if v % 3 else "y") for v in range(200)],
        "v double, g string",
    )
    a = mann_whitney_u(df, "v", "g", "x", "y").collect()[0]
    b = mann_whitney_u(df, "v", "g", "y", "x").collect()[0]
    assert a["u1"] + b["u1"] == pytest.approx(a["n1"] * a["n2"])
    assert a["z"] == pytest.approx(-b["z"])


def test_prefix_sums_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "v long, a long")
    assert prefix_sums_by_value(empty, "v", ["a"]).count() == 0
    one = spark.createDataFrame([(5, 7)], "v long, a long")
    row = prefix_sums_by_value(one, "v", ["a"]).collect()[0]
    assert row["cum_a"] == 7


def test_ks_identical_samples_d_near_zero(spark):
    df = spark.createDataFrame(
        [(float(v % 13), g) for v in range(100) for g in ("x", "y")],
        "v double, g string",
    )
    row = ks_two_sample(df, "v", "g", "x", "y").collect()[0]
    assert row["ks_d"] == 0.0
