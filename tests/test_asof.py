"""As-of join semantics: backward match, exact-match toggle, tolerance,
unmatched-left nulls — pinned against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.asof import asof_join


def frames(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "l1"), (1, 20.0, "l2"), (1, 15.0, "l3"), (2, 5.0, "l4")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 5.0, "r5"), (1, 15.0, "r15"), (1, 25.0, "r25"), (3, 1.0, "rx")],
        ["k", "ts", "rv"],
    )
    return left, right


def run(spark, **kw):
    left, right = frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["rv"], **kw,
    )
    return {r["lv"]: (r["rv_asof"], r["ts_asof"]) for r in out.collect()}


def test_backward_match_includes_equal_ts(spark):
    got = run(spark)
    assert got["l1"] == ("r5", 5.0)    # 10 → latest ≤ 10 is 5
    assert got["l3"] == ("r15", 15.0)  # 15 → equal ts matches
    assert got["l2"] == ("r15", 15.0)  # 20 → 15, never 25
    assert got["l4"] == (None, None)   # key 2 has no right rows


def test_strict_inequality_mode(spark):
    got = run(spark, allow_exact_matches=False)
    assert got["l3"] == ("r5", 5.0)    # equal ts excluded → falls back to 5
    assert got["l1"] == ("r5", 5.0)


def test_tolerance_nulls_stale_matches(spark):
    got = run(spark, tolerance_seconds=6)
    assert got["l1"] == ("r5", 5.0)    # gap 5 ≤ 6 → kept
    assert got["l2"] == ("r15", 15.0)  # gap 5 → kept
    assert got["l4"] == (None, None)
    got_tight = run(spark, tolerance_seconds=3)
    assert got_tight["l1"] == (None, None)  # gap 5 > 3 → nulled


def test_matches_duckdb_asof_on_events(spark):
    import duckdb

    from cars_bids_data_pipeline_v0__spark.sources.ingest import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    ours = {
        (r["event_id"], r["view_id_asof"])
        for r in asof_join(
            clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["view_id"],
        ).collect()
    }
    duck = duckdb.connect()
    duck.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    theirs = set(
        duck.execute(
            """
            WITH c AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type='click'),
                 v AS (SELECT event_id AS view_id, user_id, ts FROM events
                       WHERE event_type='view')
            SELECT c.event_id, v.view_id
            FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
            """
        ).fetchall()
    )
    assert ours == theirs and len(ours) > 0
