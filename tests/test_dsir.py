"""DSIR operators (`operators/dsir.py`) and their release-capstone
integration — the selection stage of Xie 2023 (round-9 VERDICT
directive 4).

The registry twins q267/q269 pin the weight/race arithmetic against
DuckDB; these tests pin what the oracle can't reach: the token-budget
cutoff (distributed prefix sums, no global window), determinism,
plan shape, and the release wiring.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.dsir import (
    dsir_race_key,
    dsir_resample,
    dsir_weights,
)


def _corpus(spark):
    # two "domains": science-flavored docs (target) and chatter docs,
    # plus one hybrid — enough signal for hashed bigram models
    sci = "quantum electron proton neutron lattice spectrum"
    chat = "lol omg haha yeah totally whatever nice cool"
    rows = []
    for i in range(10):
        rows.append((i, f"{sci} sample {sci} run {i % 3}", "sci"))
    for i in range(10, 30):
        rows.append((i, f"{chat} chat {chat} banter {i % 5}", "web"))
    rows.append((99, f"{sci} {chat}", "web"))  # hybrid
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_weights_favor_target_domain(spark):
    df = _corpus(spark)
    w = dsir_weights(df, F.col("source") == "sci").collect()
    by_id = {r["doc_id"]: r["dsir_w"] for r in w}
    # every science doc outscores every chatter doc; the hybrid lands
    # in between
    sci_min = min(by_id[i] for i in range(10))
    web_max = max(by_id[i] for i in range(10, 30))
    assert sci_min > by_id[99] > web_max


def test_resample_respects_token_budget_exactly(spark):
    from cars_bids_data_pipeline_v0__spark.operators.text import (
        token_count,
    )

    df = _corpus(spark)
    budget = 80
    got = dsir_resample(df, F.col("source") == "sci", budget)
    toks = got.select(
        F.sum(token_count("text")).alias("n")
    ).first()["n"]
    assert toks <= budget
    # the cutoff is tight: the next doc in race order would overflow.
    # reconstruct the full race and check the first excluded doc
    w = dsir_weights(df, F.col("source") == "sci")
    race = (
        df.join(w, "doc_id")
        .select(
            "doc_id",
            dsir_race_key(F.col("dsir_w"), F.col("doc_id")).alias("rk"),
            token_count("text").alias("t"),
        )
        .orderBy(F.col("rk").desc(), "doc_id")
        .collect()
    )
    kept_ids = {r["doc_id"] for r in got.collect()}
    cum = 0
    for r in race:
        cum += r["t"]
        if cum <= budget:
            assert r["doc_id"] in kept_ids, r
        else:
            assert r["doc_id"] not in kept_ids, r
    # deterministic: a second run selects the identical set
    again = {r["doc_id"] for r in dsir_resample(
        df, F.col("source") == "sci", budget
    ).collect()}
    assert again == kept_ids


def test_resample_keeps_original_columns_and_scores(spark):
    df = _corpus(spark)
    got = dsir_resample(df, F.col("source") == "sci", 60)
    assert {"doc_id", "text", "source", "dsir_w", "race_key"} <= set(
        got.columns
    )
    assert got.count() > 0


def test_resample_plan_has_no_global_window(spark):
    import contextlib
    import io

    from tests.test_plans import _global_window_specs

    df = _corpus(spark)
    out = dsir_resample(df, F.col("source") == "sci", 60)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert not _global_window_specs(buf.getvalue())


def test_release_with_dsir_selection(spark, tmp_path):
    """The capstone with selection on: gate → dedup → Q-Q → DSIR to a
    token budget → shards → fenced append.  The released increment must
    respect the budget, favor the target domain, and stay idempotent
    (a re-release of the same candidates writes nothing)."""
    from cars_bids_data_pipeline_v0__spark.operators.text import (
        token_count,
    )
    from cars_bids_data_pipeline_v0__spark.plans.release import (
        release_corpus,
    )
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_read

    # long-enough docs so the quality gate keeps them (>= 5 tokens,
    # alpha-heavy); sci docs are the target domain
    sci = "quantum electron proton neutron lattice spectrum phonon"
    chat = "random market garden kitchen window door table chair"
    rows = []
    for i in range(8):
        rows.append((i, f"{sci} alpha beta {sci} gamma run {i}", "sci"))
    for i in range(8, 28):
        rows.append(
            (i, f"{chat} delta {chat} epsilon zeta item {i}", "web")
        )
    cands = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    tbl = str(tmp_path / "released")
    shards = str(tmp_path / "shards")
    budget = 150
    manifest = release_corpus(
        spark,
        cands,
        tbl,
        shards,
        dsir_target="source = 'sci'",
        dsir_token_budget=budget,
    )
    assert manifest.count() > 0
    released = tx_read(spark, tbl)
    n_tok = released.select(
        F.sum(token_count("text")).alias("n")
    ).first()["n"]
    assert n_tok <= budget
    rel_ids = {r["doc_id"] for r in released.select("doc_id").collect()}
    # the selection leans hard toward the target domain
    n_sci = len([i for i in rel_ids if i < 8])
    n_web = len(rel_ids) - n_sci
    assert n_sci > n_web
    # released columns carry no DSIR internals
    assert "dsir_w" not in released.columns
    assert "race_key" not in released.columns
    # per-increment budget semantics: re-submitting the same candidates
    # releases the docs the budget CUT last time (still fresh, next in
    # the race) — never a doc twice, and the new increment respects the
    # budget too
    for _ in range(4):  # enough increments to exhaust the fresh pool
        release_corpus(
            spark,
            cands,
            tbl,
            shards,
            dsir_target="source = 'sci'",
            dsir_token_budget=budget,
        )
    full = tx_read(spark, tbl)
    per_doc = full.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 1).count() == 0
    # once the pool is exhausted, a further release adds nothing
    n_now = full.count()
    release_corpus(
        spark,
        cands,
        tbl,
        shards,
        dsir_target="source = 'sci'",
        dsir_token_budget=budget,
    )
    assert tx_read(spark, tbl).count() == n_now
    # shard artifact exists under the increment directory
    assert any(
        d.startswith("release=") for d in os.listdir(shards)
    )
