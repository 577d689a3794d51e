"""Plan-shape + semantics checks for the second query batch
(queries_more.py).  Value correctness is pinned by the DuckDB oracles
(tools/check_oracle.py); these tests pin the *physical plans* — the part the
oracle can't see and the part that decides 100 TB behavior."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from cars_bids_data_pipeline_v0__spark.plans.queries import (
    REGISTRY,
    _load_extensions,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _q(spark, name):
    _load_extensions()
    return REGISTRY[name].builder(spark, SF)


def test_q39_semi_anti_are_broadcast_hash_joins(spark):
    plan = plan_of(_q(spark, "q39_segment_orders"))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # the subqueries must not materialize as row-multiplying inner joins
    assert "BroadcastNestedLoopJoin" not in plan


def test_q31_decorrelated_no_nested_loop(spark):
    plan = plan_of(_q(spark, "q31_small_qty_revenue"))
    assert "BroadcastNestedLoopJoin" not in plan
    # per-part threshold is a partial-aggregated hash agg, not a per-row
    # re-scan: exactly 3 scans (lineitem ×2 + part ×1), each mentioned
    # twice in formatted explain (tree line + operator detail header)
    assert plan.count("Scan parquet") <= 6


def test_q33_window_is_partitioned(spark):
    df = _q(spark, "q33_price_rank_functions")
    plan = plan_of(df)
    # partitioned window → hash-partition exchange, never a global sort
    # onto one partition (SinglePartition only appears for global windows)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_higher_order_queries_have_no_python_udf(spark):
    for name in ("q35_vector_stats", "q64_word_repetition"):
        plan = plan_of(_q(spark, name))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_q64_values_on_known_doc(spark):
    df = spark.createDataFrame(
        [(1, "a a b the the the end"), (2, "   "), (3, "x")],
        "doc_id long, text string",
    )
    # q64's builder reads from sf_dir; pin the tokenization semantics the
    # query and its oracle both rely on (split-on-\s+ after trim, empty
    # docs filtered before any /n_words division)
    from pyspark.sql import functions as F

    d = df.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    rows = {r["doc_id"]: r for r in d.collect()}
    assert rows[1]["words"] == ["a", "a", "b", "the", "the", "the", "end"]
    assert 2 not in rows  # whitespace-only doc filtered, no div-by-zero
    assert rows[3]["words"] == ["x"]
