"""as-of join operator corners (operators/asof.py).

Oracle parity vs DuckDB's native ASOF JOIN lives in q62/q188/q213; here
the operator-level semantics that the oracled queries don't isolate:
inclusive vs strict equality, tolerance voiding, unmatched-left nulls,
whole-row atomicity of the carried match, and the no-join plan shape.
"""

from __future__ import annotations

import contextlib
import datetime as dt
import io

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "d"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 10:00:00"), 20.0),  # == left@10:00
            (1, _ts("2024-01-01 11:59:00"), 30.0),
            (2, _ts("2024-01-01 11:00:00"), 40.0),
        ],
        "k long, rts timestamp, v double",
    )
    return left, right


def test_backward_latest_at_or_before(spark):
    left, right = _frames(spark)
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"],
        ).collect()
    }
    # inclusive equality, latest-≤ wins, LEFT semantics keep unmatched
    assert rows["a"]["v_asof"] == 20.0
    assert str(rows["a"]["rts_asof"]) == "2024-01-01 10:00:00"
    assert rows["b"]["v_asof"] == 30.0
    assert rows["c"]["v_asof"] is None and rows["c"]["rts_asof"] is None
    assert rows["d"]["v_asof"] is None


def test_strict_inequality_skips_equal_timestamps(spark):
    left, right = _frames(spark)
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"], allow_exact_matches=False,
        ).collect()
    }
    # 'a' no longer sees the 10:00 right row — falls back to 09:30
    assert rows["a"]["v_asof"] == 10.0
    assert rows["b"]["v_asof"] == 30.0


def test_tolerance_voids_stale_matches(spark):
    left, right = _frames(spark)
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"], tolerance_seconds=60.0,
        ).collect()
    }
    assert rows["a"]["v_asof"] == 20.0  # 0 s gap: kept
    assert rows["b"]["v_asof"] == 30.0  # 60 s gap: kept (inclusive bound)
    assert rows["c"]["v_asof"] is None and rows["d"]["v_asof"] is None

    tight = {
        r["tag"]: r
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"], tolerance_seconds=30.0,
        ).collect()
    }
    assert tight["b"]["v_asof"] is None  # 60 s gap now voided
    assert tight["b"]["rts_asof"] is None  # matched ts voided WITH payload
    assert tight["a"]["v_asof"] == 20.0


def test_carried_match_is_whole_row_atomic(spark):
    # a later right row with a NULL payload field must not let an older
    # row's field bleed through (the struct-carry property)
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"), "x")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 10.0, "old"),
            (1, _ts("2024-01-01 11:00:00"), None, "new"),
        ],
        "k long, rts timestamp, v double, label string",
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["v", "label"],
    ).collect()[0]
    # the 11:00 row matches as a WHOLE: v arrives null, not 10.0
    assert row["label_asof"] == "new" and row["v_asof"] is None


def test_plan_one_keyed_window_no_join(spark):
    # the whole point: no join operator at all (so no range-join row
    # multiplication), one KEYED window over the union
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["v"],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(k" in plan  # partitioned, never global


def test_asof_differential_vs_pandas_merge_asof(spark):
    # independent reference implementation: pandas.merge_asof per key on
    # deterministic pseudo-random data (200 left x 300 right, 5 keys)
    import pandas as pd

    def prng(i, salt):
        return (i * 1103515245 + salt * 12345 + 6789) % (2**31)

    left_rows = [
        (prng(i, 1) % 5, prng(i, 2) % 10_000, i) for i in range(200)
    ]
    right_rows = [
        (prng(i, 3) % 5, prng(i, 4) % 10_000, float(i)) for i in range(300)
    ]
    # dedup right on (key, ts): merge_asof picks the LAST among equal ts
    # rows, the operator tie-breaks on the payload struct — pin one row
    # per (key, ts) so both references are unambiguous
    rseen = {}
    for k, t, v in right_rows:
        rseen[(k, t)] = v
    right_rows = [(k, t, v) for (k, t), v in sorted(rseen.items())]

    lp = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t")
    want = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want_map = {
        int(r.lid): (None if pd.isna(r.v) else float(r.v))
        for r in want.itertuples()
    }

    lf = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), i)
         for k, t, i in left_rows],
        "k long, ts timestamp, lid long",
    )
    rf = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), v)
         for k, t, v in right_rows],
        "k long, rts timestamp, v double",
    )
    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(
            lf, rf, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["v"],
        ).collect()
    }
    assert got == want_map


def test_asof_empty_right_side(spark):
    left, right = _frames(spark)
    empty = right.filter(F.lit(False))
    rows = asof_join(
        left, empty, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["v"],
    ).collect()
    assert len(rows) == 4 and all(r["v_asof"] is None for r in rows)


def test_empty_right_cols_means_no_payload(spark):
    # regression: right_cols=[] must NOT fall back to "all columns" —
    # the right frame's extra payload stays excluded
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=[],
    )
    assert [c for c in out.columns if c.endswith("_asof")] == ["rts_asof"]
    rows = {r["tag"]: r for r in out.collect()}
    assert str(rows["a"]["rts_asof"]) == "2024-01-01 10:00:00"
