#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md §3).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced with the noop sink (computes every column, writes
nothing) so projection pruning can't fake the numbers.  Every entry runs
``RUNS`` times and reports the per-query MEDIAN — n=1 samples made ±5%
regressions unreadable across rounds (round-2 VERDICT item 8; a concurrent
background job inflated one observed n=1 total by 38%).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Headline set: the shuffle/join/window-heavy queries plus one scan-bound
# expression query — the shapes whose cost scales with data volume.
HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_order_priority_counts",
    "q10_keep_latest_order_per_customer",
    "q13_star_fact_assembly",
    "q28_bid_cleaning_and_features",
    "q40_hourly_event_windows",
    "q42_session_windows",
    "q52_exact_dup_groups",
    "q53_ngram_jaccard_pairs",
    "q56_minhash_lsh_near_dup",
    "q54_cosine_topk",
    "q59_corpus_quality_gate",
    "q211_jaccard_df_capped",
]

# medianed over 5 samples instead of 3 — see main().  q211 joined in
# round 8: its r7 reading (+35% on UNCHANGED code) was the same
# contention-integrates-over-long-entries artifact the q53/q56 medians
# were widened for.
EXTRA_RUNS_QUERIES = [
    "q53_ngram_jaccard_pairs",
    "q56_minhash_lsh_near_dup",
    "q211_jaccard_df_capped",
]

# timed and reported per-query but EXCLUDED from the headline total: the
# round-1 baseline predates these entries, and the cross-round ratio must
# stay apples-to-apples.  q211 = q53's plan plus the df-cap scrub over a
# corpus with a planted viral footer — its line next to q53's shows what
# the boilerplate guard costs (and that it stays bounded).
NON_COMPARABLE = {
    "pipeline_e2e_txlog",
    "q211_jaccard_df_capped",
    "dml_lifecycle_lineitem",
    # sf1 mirrors (round 14): volume-bound legs copied from the sf1
    # sweep into the headline `queries` dict so the driver's lower-core
    # re-runs have entries whose runtime actually scales with cores
    # (every sf0.1 entry is job-floor bound — PERF_r13's flat 0.85-1.18
    # ratios and its false `suspect_cpus_ignored` alarm).  Mirrored,
    # not re-run: zero added bench cost, same measurement.
    "q53_ngram_jaccard_pairs_sf1",
    "q56_minhash_lsh_near_dup_sf1",
    "dml_lifecycle_lineitem_sf1",
}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_pipeline(spark) -> float:
    """End-to-end ETL (the reference's actual workload): 2000 raw auctions
    in 20 mixed-vintage JSON files → variant ingest → silver transform +
    validity split → partitioned merge sink → full star-schema build.
    Generation is untimed; the timed span is ingest-to-gold."""
    import shutil
    import tempfile

    from cars_bids_data_pipeline_v0__spark.plans.gold import (
        GoldStore,
        build_star_schema,
        seed_state_dim,
    )
    from cars_bids_data_pipeline_v0__spark.plans.silver import transform_records
    from cars_bids_data_pipeline_v0__spark.sources.ingest import (
        read_raw_auctions,
        read_silver_lake,
    )
    from cars_bids_data_pipeline_v0__spark.sources.sinks import (
        merge_write_partitioned,
        write_text_queue,
    )
    from tests.fixtures import write_raw_corpus

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        write_raw_corpus(f"{tmp}/raw", n=2000, files=20)
        t0 = time.time()
        records = read_raw_auctions(spark, f"{tmp}/raw")
        silver, rescrape = transform_records(records)
        merge_write_partitioned(spark, silver, f"{tmp}/lake")
        write_text_queue(rescrape, f"{tmp}/rescrape")
        store = GoldStore(spark, f"{tmp}/gold")
        seed_state_dim(
            store,
            spark.createDataFrame(
                [(1, "Washington", "WA"), (2, "Florida", "FL")],
                "id long, state string, state_abbr string",
            ),
        )
        gold = build_star_schema(store, read_silver_lake(spark, f"{tmp}/lake"))
        gold["auction_fact"].write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_pipeline_txlog(spark) -> float:
    """The same ingest-to-gold ETL as ``bench_pipeline`` but through the
    ACID commit-log sink (``tx_merge_partitioned`` + ``tx_read_latest``)
    instead of the single-writer parquet merge — records what the
    transactional guarantees cost next to the parquet path."""
    import shutil
    import tempfile

    from cars_bids_data_pipeline_v0__spark.plans.gold import (
        GoldStore,
        build_star_schema,
        seed_state_dim,
    )
    from cars_bids_data_pipeline_v0__spark.plans.silver import transform_records
    from cars_bids_data_pipeline_v0__spark.sources.ingest import read_raw_auctions
    from cars_bids_data_pipeline_v0__spark.sources.sinks import write_text_queue
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_merge_partitioned,
        tx_read_latest,
    )
    from tests.fixtures import write_raw_corpus

    tmp = tempfile.mkdtemp(prefix="bench_e2e_tx_")
    try:
        write_raw_corpus(f"{tmp}/raw", n=2000, files=20)
        t0 = time.time()
        records = read_raw_auctions(spark, f"{tmp}/raw")
        silver, rescrape = transform_records(records)
        tx_merge_partitioned(spark, silver, f"{tmp}/lake")
        write_text_queue(rescrape, f"{tmp}/rescrape")
        store = GoldStore(spark, f"{tmp}/gold")
        seed_state_dim(
            store,
            spark.createDataFrame(
                [(1, "Washington", "WA"), (2, "Florida", "FL")],
                "id long, state string, state_abbr string",
            ),
        )
        gold = build_star_schema(store, tx_read_latest(spark, f"{tmp}/lake"))
        gold["auction_fact"].write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _dml_lifecycle(spark, sf_dir: str) -> float:
    """Row-level DML lifecycle on a fresh commit-log table over
    ``sf_dir``'s lineitem: append (returnflag-partitioned), MERGE a
    1-in-8 composite-key source (half updates, half inserts under
    shifted keys; deduped — the synthetic corpus is not PK-keyed and
    MERGE's cardinality rule correctly aborts otherwise), deletion-
    vector DELETE ~10 %, then force a full merge-on-read read-back.
    Fresh table per call (DML is stateful; a warm table would bench the
    txn fence, not the writers).  The same function runs at sf0.1 and
    sf1, so the pair is a clean same-shape 10x scaling read."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        tx_append_partitioned,
        tx_delete_where,
        tx_merge_into,
        tx_read,
    )

    tmp = tempfile.mkdtemp(prefix="bench_dml_")
    try:
        path = f"{tmp}/li_tx"
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        t0 = time.time()
        tx_append_partitioned(
            spark, li, path, partition_by="l_returnflag"
        )
        source = li.filter(
            (F.col("l_orderkey") % 8).isin(0, 1)
        ).dropDuplicates(["l_orderkey", "l_linenumber"]).select(
            F.when(
                F.col("l_orderkey") % 8 == 1,
                F.col("l_orderkey") + 10_000_000_000,
            ).otherwise(F.col("l_orderkey")).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            (F.col("l_extendedprice") + 1.0).alias("l_extendedprice"),
            "l_discount", "l_tax", "l_returnflag", "l_linestatus",
            "l_shipdate",
        )
        tx_merge_into(
            spark, path, source, on=["l_orderkey", "l_linenumber"],
            when_matched_update={"l_extendedprice": "s.l_extendedprice"},
            when_not_matched_insert=True,
            partition_by="l_returnflag",
        )
        tx_delete_where(spark, path, "l_orderkey % 10 = 3", mode="dv")
        force(tx_read(spark, path))
        return round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_dml_lifecycle(spark) -> float:
    return _dml_lifecycle(spark, SF_DIR)


# --------------------------------------------------------------------------
# sf1 scaling sweep — 10× data, measured (not asserted) scaling curve
# --------------------------------------------------------------------------

# The 100 TB claims rest on plan shape; this section makes them empirical:
# the dedup/ANN/scan headliners run once at 10× the driver's sf0.1 volume
# (6M lineitem / 50k docs / 20k embeddings) and the wall-times land in the
# bench JSON next to the sf0.1 medians.  Near-linear (~10×) growth is the
# expected signature of the bucketed/inverted-index plans; quadratic creep
# would show up here long before a cluster run.
SF1_QUERIES = [
    "q01_pricing_summary",
    "q52_exact_dup_groups",
    "q53_ngram_jaccard_pairs",
    "q56_minhash_lsh_near_dup",
    "q54_cosine_topk",
    # round-7 governance ops on the measured curve (VERDICT r7 #5):
    # the broadcast-eval-index and cell-scoped-prune claims as numbers
    "q254_benchmark_decontamination",
    "q224_semantic_dedup",
    # round-9: DSIR selection on the curve — gram explode + bucket-
    # bounded aggregates should stay ~flat (measured 2.8 -> 3.6 s for
    # 10x at introduction)
    "q267_dsir_importance_weights",
    # round-10b: the model-gate scorer on the curve — one explode + two
    # integer combines + a keyed join back; the release capstone runs
    # this shape over every candidate when model_gate=True
    "q275_quality_classifier",
    # round-11: the two heaviest new shapes on the curve — Heaps' fit
    # (token explode + prefix-sum range exchange) and the holdout
    # split (shingle explode + eval-broadcast semi-join; q81's join
    # shape under a 20× bigger probe side)
    "q285_heaps_law_fit",
    "q290_eval_holdout_split",
    # round-12: the two heaviest new shapes on the curve — the dedup
    # cascade (fingerprint groupBy + capped pair join + attribution
    # joins; 15.5 s at introduction, its 22 s sf0.01 reading was ~12 s
    # fixed overhead) and the held-out LM (bigram/unigram count tables
    # + a 4-way postings join over the 10% eval slice; 4.2 s)
    "q299_dedup_cascade_audit",
    "q302_heldout_lm_perplexity",
    # round-13: the two heaviest new shapes on the curve — the
    # per-source KL (one corpus word pass + broadcast top-100 grid)
    # and the dedup-index audit (the persistent-index build's shingle
    # materialization — the cost a release pays ONCE per released doc
    # instead of every increment)
    "q316_source_kl_divergence",
    "q324_dedup_index_audit",
]
SF1_DIR = str(Path(__file__).resolve().parent / ".benchdata" / "sf1")
SF5_DIR = str(Path(__file__).resolve().parent / ".benchdata" / "sf5")


def _scaled_documents(spark, src: str, out_dir: str, n_copies: int) -> None:
    """Write an ``n_copies``× documents table with the similarity-preserving
    token-suffix construction (see ``ensure_sf1``'s docstring)."""
    from pyspark.sql import functions as F

    copies = spark.range(n_copies).select(
        F.col("id").cast("int").alias("__copy")
    )
    d = spark.read.parquet(f"{src}/documents.parquet").crossJoin(
        F.broadcast(copies)
    )
    text = F.when(F.col("__copy") == 0, F.col("text")).otherwise(
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(
                    t, F.lit("#"), F.col("__copy").cast("string")
                ),
            ),
        )
    )
    d.select(
        (F.col("doc_id") + F.col("__copy").cast("long") * 10_000_000)
        .alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def ensure_sf1(spark, src: str = "/root/testdata/sf0.1") -> None:
    """Derive a 10× corpus from sf0.1 into ``SF1_DIR`` (cached).

    Replication must not distort the workload's similarity structure:
    naive 10× copies would make every document 9 exact dups and multiply
    every LSH bucket by 10 (pairs ×100 — superlinear by construction, not
    by plan defect).  Instead copy ``i`` suffixes every TOKEN with ``#i``,
    so within-copy dup/near-dup relations are preserved exactly while
    cross-copy shingle spaces are disjoint — total dedup work scales ~10×,
    which is what the sweep is meant to measure.  Embeddings get a
    cosine-invariant per-copy scale; lineitem shifts l_orderkey per copy.
    """
    import shutil

    from pyspark.sql import functions as F

    # version-tagged marker: a construction change (v2: shifted
    # embeddings) must regenerate a cached corpus built the old way
    tag = "derived 10x from sf0.1 v2 (shifted embeddings)"
    marker = Path(SF1_DIR) / "_GENERATED"
    if marker.exists() and marker.read_text().startswith(tag):
        return
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    Path(SF1_DIR).mkdir(parents=True, exist_ok=True)
    _scaled_documents(spark, src, SF1_DIR, 10)
    copies = spark.range(10).select(F.col("id").cast("int").alias("__copy"))

    e = spark.read.parquet(f"{src}/embeddings.parquet").crossJoin(
        F.broadcast(copies)
    )
    # per-copy CIRCULAR SHIFT of the embedding (an orthogonal permutation):
    # within-copy cosines are preserved bit-for-bit (copy 0 is the
    # original corpus), while cross-copy cosines of the "same" vector
    # decorrelate to the random baseline.  The earlier per-copy SCALE was
    # cosine-invariant, which made every vector 9 exact cosine-duplicates
    # across copies — semantic-dedup pair counts then grew ~copy² by
    # construction, poisoning q224's scaling curve with a data artifact.
    dim = F.size("embedding")
    sh = F.col("__copy")
    shifted = F.concat(
        F.slice("embedding", sh + F.lit(1), dim - sh),
        F.slice("embedding", F.lit(1), sh),
    )
    e.select(
        (F.col("vec_id") + F.col("__copy").cast("long") * 10_000_000)
        .alias("vec_id"),
        shifted.cast("array<float>").alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{SF1_DIR}/embeddings.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet").crossJoin(
        F.broadcast(copies)
    )
    li.select(
        (F.col("l_orderkey") + F.col("__copy").cast("long") * 100_000_000)
        .alias("l_orderkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "__copy")],
    ).write.mode("overwrite").parquet(f"{SF1_DIR}/lineitem.parquet")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "events"]:
        shutil.copy(f"{src}/{t}.parquet", f"{SF1_DIR}/{t}.parquet")
    marker.write_text(tag + "; see ensure_sf1()\n")


# 50× leg: the three dedup headliners only (they read nothing but
# ``documents``, so the sf5 corpus IS just a 50-copy documents table).
# One warm sample each — the plans are already JIT-hot from the sf0.1
# passes, and the point is the CURVE: a future regression in the
# inverted-index/banded plans shows up as a bend at the data-dominant
# 50× point long before any cluster run (round-5 VERDICT directive 4;
# the one-off curve lives in ARCHITECTURE.md's scaling table).
SF5_QUERIES = [
    "q52_exact_dup_groups",
    "q53_ngram_jaccard_pairs",
    "q56_minhash_lsh_near_dup",
    # round-10b: the model-gate scorer's 50x point — scan-bound by
    # design (one explode + two integer combines), so the slope should
    # track q52's
    "q275_quality_classifier",
]


def ensure_sf5(spark, src: str = "/root/testdata/sf0.1") -> None:
    """Derive the 50× documents-only corpus into ``SF5_DIR`` (cached)."""
    import shutil

    marker = Path(SF5_DIR) / "_GENERATED"
    if marker.exists():
        return
    shutil.rmtree(SF5_DIR, ignore_errors=True)
    Path(SF5_DIR).mkdir(parents=True, exist_ok=True)
    _scaled_documents(spark, src, SF5_DIR, 50)
    marker.write_text(
        "derived 50x from sf0.1 (documents only); see ensure_sf5()\n"
    )


def sweep_sf5(spark) -> dict:
    from cars_bids_data_pipeline_v0__spark.cache import release_build_caches
    from cars_bids_data_pipeline_v0__spark.plans import queries as Q

    Q._load_extensions()
    t0 = time.time()
    ensure_sf5(spark)
    gen_s = round(time.time() - t0, 3)
    out = {}
    # min-of-2, same contention rationale as the sf1 sweep
    for name in SF5_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            force(Q.REGISTRY[name].builder(spark, SF5_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            release_build_caches()
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    # the release capstone's 50x point (round-9 VERDICT directive 6):
    # pins the gate→dedup→chunk→pack→shard chain's scaling slope the
    # way q52/q53/q56 already are
    out["corpus_release_250k_docs"] = bench_corpus_release(spark, SF5_DIR)
    # one 50× point of the full-stack shape (all stages on) — the
    # scaling companion to sf1's corpus_release_full leg
    out["corpus_release_full_250k_docs"] = bench_corpus_release(
        spark,
        SF5_DIR,
        model_gate=True,
        dsir_target="source = 'src0'",
        dsir_token_budget=2_500_000,
    )
    corpus = Path(SF5_DIR, "_GENERATED")
    return {
        "queries": out,
        "gen_sec": gen_s,
        "scale_vs_sf01": 50,
        "corpus": corpus.read_text().strip() if corpus.exists() else None,
    }


def bench_pipeline_10x(spark) -> float:
    """The e2e ETL at 10× the headline corpus (20k auctions / 100 files)
    — recorded in the sf1 section.  With the 2k run's ~7.5 s this gives
    the measured scaling curve of the reference-parity workload itself
    (observed ~3×/10× on local[32]: the job-count floor amortizes and
    the data-proportional part is linear)."""
    import shutil
    import tempfile

    from cars_bids_data_pipeline_v0__spark.plans.gold import (
        GoldStore,
        build_star_schema,
        seed_state_dim,
    )
    from cars_bids_data_pipeline_v0__spark.plans.silver import transform_records
    from cars_bids_data_pipeline_v0__spark.sources.ingest import (
        read_raw_auctions,
        read_silver_lake,
    )
    from cars_bids_data_pipeline_v0__spark.sources.sinks import (
        merge_write_partitioned,
        write_text_queue,
    )
    from tests.fixtures import write_raw_corpus

    tmp = tempfile.mkdtemp(prefix="bench_e2e10x_")
    try:
        write_raw_corpus(f"{tmp}/raw", n=20000, files=100)
        t0 = time.time()
        records = read_raw_auctions(spark, f"{tmp}/raw")
        silver, rescrape = transform_records(records)
        merge_write_partitioned(spark, silver, f"{tmp}/lake")
        write_text_queue(rescrape, f"{tmp}/rescrape")
        store = GoldStore(spark, f"{tmp}/gold")
        seed_state_dim(
            store,
            spark.createDataFrame(
                [(1, "Washington", "WA"), (2, "Florida", "FL")],
                "id long, state string, state_abbr string",
            ),
        )
        gold = build_star_schema(store, read_silver_lake(spark, f"{tmp}/lake"))
        gold["auction_fact"].write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sweep_sf1(spark) -> dict:
    from cars_bids_data_pipeline_v0__spark.cache import release_build_caches
    from cars_bids_data_pipeline_v0__spark.plans import queries as Q

    Q._load_extensions()
    t0 = time.time()
    ensure_sf1(spark)
    gen_s = round(time.time() - t0, 3)
    out = {}
    # MIN of two samples per query: these legs are the scaling-curve
    # evidence, and a single sample on a shared host can swing 5× under
    # external contention (observed q56 sf1 9.8 s vs 47.6 s, same code,
    # same round).  The minimum is the least-contended estimate of the
    # plan's true cost — exactly what a scaling curve should plot.
    for name in SF1_QUERIES:
        best = None
        for _ in range(2):
            t0 = time.time()
            force(Q.REGISTRY[name].builder(spark, SF1_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            release_build_caches()
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    # the lifecycle legs follow the same min-of-2 discipline as the
    # query legs above — their r7→r8 single-sample readings swung +59%
    # with no way to tell contention from regression (VERDICT r8
    # "what's wrong" #1)
    out["pipeline_e2e_20k_auctions"] = min(
        bench_pipeline_10x(spark) for _ in range(2)
    )
    out["dml_lifecycle_lineitem"] = bench_dml_lifecycle_10x(spark)
    out["corpus_release_50k_docs"] = bench_corpus_release(spark)
    # the capstone with DSIR selection ON (round-9 VERDICT directive 4):
    # score vs the src0 target domain, resample to a 500k-token budget
    out["corpus_release_dsir_50k_docs"] = bench_corpus_release(
        spark,
        dsir_target="source = 'src0'",
        dsir_token_budget=500_000,
    )
    # the capstone with the round-10b MODEL gate ON (FineWeb-Edu shape:
    # classifier cuts before dedup/Q-Q) — measures the scorer inside
    # the chain, not just the standalone q275 leg
    out["corpus_release_mg_50k_docs"] = bench_corpus_release(
        spark, model_gate=True,
    )
    # the FULL production shape (round-10 VERDICT directive 3): every
    # stage on in ONE run — rule gates → model gate → incremental dedup
    # → Q-Q decile gate → DSIR selection → chunk → pack → shards.  The
    # per-stage legs above isolate each stage's cost; this one measures
    # their interaction (shared persist barriers, DSIR scoring the
    # model-gated slice)
    out["corpus_release_full_50k_docs"] = bench_corpus_release(
        spark,
        model_gate=True,
        dsir_target="source = 'src0'",
        dsir_token_budget=500_000,
    )
    # the capstone with k-center CORESET selection ON (round-12,
    # VERDICT r11 directive 7): id-keyed embedding join + batched
    # farthest-point traversal (k=64, batch=16) after the Q-Q gate
    out["corpus_release_coreset_50k_docs"] = bench_corpus_release(
        spark, coreset_k=64,
    )
    out.update(bench_ann_index(spark))
    out["kcenter_k32_20k_vecs"] = bench_kcenter(spark)
    corpus = Path(SF1_DIR, "_GENERATED")
    return {
        "queries": out,
        "gen_sec": gen_s,
        "scale_vs_sf01": 10,
        # cross-round sf1 comparisons are only valid on identical
        # corpora (q54's r7→r8 delta mixed a construction change into
        # the number) — stamp the generation tag into the artifact
        "corpus": corpus.read_text().strip() if corpus.exists() else None,
    }


def bench_dml_lifecycle_10x(spark) -> float:
    """The same DML lifecycle at 10x volume (sf1 lineitem, 600k rows) —
    min-of-2 warm samples (the scale-leg contention discipline)."""
    return min(_dml_lifecycle(spark, SF1_DIR) for _ in range(2))


def bench_corpus_release(
    spark, sf_dir: str | None = None, **release_kw
) -> float:
    """The release capstone at sf1 (50k docs) or, given ``sf_dir``, any
    other corpus (the sf5 leg passes the 250k-doc corpus): seed the
    release table with the even half (untimed), then time a FULL-corpus
    incremental release — q59 gate → dedup_incoming vs the released
    half → Q-Q decile gate → chunk → pack → training-shard write →
    fenced append.  Fresh state per sample (stateful, like the DML
    lifecycle); min-of-2."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cars_bids_data_pipeline_v0__spark.cache import release_build_caches
    from cars_bids_data_pipeline_v0__spark.plans.release import (
        release_corpus,
    )

    sf_dir = sf_dir or SF1_DIR
    best = None
    for _ in range(2):
        tmp = tempfile.mkdtemp(prefix="bench_release_")
        try:
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            if release_kw.get("coreset_k") is not None and (
                "embeddings" not in release_kw
            ):
                # deterministic 16-d pseudo-embeddings keyed by doc_id:
                # the derived sf1/sf5 corpora have no embedding rows for
                # their suffixed copies, and the coreset leg measures
                # the JOIN + traversal cost, not vector semantics
                release_kw = dict(
                    release_kw,
                    embeddings=docs.select(
                        "doc_id",
                        F.array(
                            *[
                                (
                                    F.pmod(
                                        F.xxhash64(
                                            F.col("doc_id") + F.lit(i)
                                        ),
                                        F.lit(1000),
                                    )
                                    / 500.0
                                    - 1.0
                                ).cast("double")
                                for i in range(16)
                            ]
                        ).alias("embedding"),
                    ),
                )
            tbl, shards = f"{tmp}/released", f"{tmp}/shards"
            release_corpus(
                spark, docs.filter(F.col("doc_id") % 2 == 0), tbl, shards,
                **release_kw,
            )
            release_build_caches()
            t0 = time.time()
            m = release_corpus(spark, docs, tbl, shards, **release_kw)
            m.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            release_build_caches()
            spark.catalog.clearCache()
    return round(best, 3)


def bench_bpe_k_curve(spark) -> dict:
    """BPE training cost vs merge count K at sf1 (round-9 VERDICT
    directive 3).  The sf1 word table is tiny (30 `[a-z]+` words — the
    synthetic corpus suffixes tokens with `#N`), so per-merge cost here
    IS the job-scheduling floor a real K≈10³ train would pay per
    round trip; `batch` amortizes it (greedy symbol-disjoint top-B per
    iteration, see ``_train_bpe``).  Measured at introduction:
    0.315 s/merge batch=1 vs 0.054 s/merge batch=8 (5.8×)."""
    from cars_bids_data_pipeline_v0__spark.cache import release_build_caches
    from cars_bids_data_pipeline_v0__spark.plans.queries_r9 import (
        _bpe_corpus_words,
        _train_bpe,
    )

    t0 = time.time()
    words = _bpe_corpus_words(spark, SF1_DIR)
    words.count()
    out = {"word_table_sec": round(time.time() - t0, 3)}
    for k, b in ((64, 1), (64, 8), (256, 8)):
        t0 = time.time()
        merges = _train_bpe(words, k, batch=b)
        dt = time.time() - t0
        out[f"k{k}_batch{b}"] = {
            "sec": round(dt, 3),
            "merges": len(merges),
            "sec_per_merge": round(dt / max(len(merges), 1), 4),
        }
    release_build_caches()
    spark.catalog.clearCache()
    return out


def bench_kcenter_curve(spark) -> dict:
    """k-center traversal cost vs k and batch at sf1 (20k × 64d) —
    round-10 VERDICT directive 2.  batch=1 pays one job round-trip per
    center (~0.33 s floor, the BPE batch=1 analogue); the batched
    traversal (top-B TakeOrdered + threshold prune, a (2/alpha)-approx)
    amortizes it, which is what makes a real coreset k≈10³ feasible.
    The batch=1 point is measured at k=64 only (it IS the slow shape —
    measured at introduction: 21 s vs ~2 s batched)."""
    from pyspark.sql import functions as F

    from cars_bids_data_pipeline_v0__spark.operators import similarity as S

    e = (
        spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
        .select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    )
    out = {}
    for k, b in ((64, 1), (64, 16), (256, 16), (256, 64)):
        t0 = time.time()
        centers = S.kcenter_traverse(e, k, batch=b)
        dt = time.time() - t0
        assert len(centers) == k
        out[f"k{k}_batch{b}"] = {
            "sec": round(dt, 3),
            "sec_per_center": round(dt / k, 4),
        }
    return out


def bench_ann_index(spark) -> dict:
    """Streaming-index lifecycle at the sf1 embedding volume (20k
    vectors): codebook train, two-batch exactly-once build, and a
    50-query probed-cells top-k.  Min-of-2 with a fresh index per
    sample (the scale-leg contention discipline — these were the last
    single-sample legs, and their r9→r10 ±27% swing read as a
    regression until the round-11 A/B (tools/bench_ann_ab.py) showed
    the file-list path costs <0.3 ms at this scale: the swing was box
    noise single samples can't reject)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cars_bids_data_pipeline_v0__spark.operators.similarity import (
        kmeans_centroids,
    )
    from cars_bids_data_pipeline_v0__spark.streaming.ann_index import (
        ivf_index_probe,
        ivf_index_sink,
    )

    corpus = spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
    out = {}
    for _ in range(2):
        tmp = tempfile.mkdtemp(prefix="bench_ann_")
        try:
            t0 = time.time()
            centroids = kmeans_centroids(corpus, nlist=16, iters=1)
            train_s = time.time() - t0
            index = f"{tmp}/index"
            sink = ivf_index_sink(index, centroids, stream_id="bench")
            t0 = time.time()
            sink(corpus.filter(F.col("vec_id") % 2 == 0), 0)
            sink(corpus.filter(F.col("vec_id") % 2 == 1), 1)
            build_s = time.time() - t0
            queries = corpus.filter(F.col("vec_id") % 397 == 0).select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_vec"),
            )
            t0 = time.time()
            ivf_index_probe(
                spark, index, queries, centroids, k=10, nprobe=4
            ).write.format("noop").mode("overwrite").save()
            probe_s = time.time() - t0
            for name, val in (
                ("ann_index_train", train_s),
                ("ann_index_build_2batch", build_s),
                ("ann_index_probe_50q", probe_s),
            ):
                out[name] = round(min(out.get(name, val), val), 3)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    from cars_bids_data_pipeline_v0__spark.cache import release_build_caches
    from cars_bids_data_pipeline_v0__spark.plans import queries as Q
    from cars_bids_data_pipeline_v0__spark.session import get_session

    spark = get_session(app_name="bench")
    Q._load_extensions()
    # One full UNTIMED warm-up pass: whole-stage-codegen JIT compilation
    # costs ~50% on a query's first executions (measured: q53 runs
    # 2.2/1.7/1.7 then settles at 1.44 s — ARCHITECTURE.md round-5
    # notes), and on a long-lived cluster every hot query runs
    # steady-state.  Timing the warm-up would benchmark the JVM's
    # compiler, not the plans.
    for name in HEADLINE:
        force(Q.REGISTRY[name].builder(spark, SF_DIR))
        release_build_caches()
        spark.catalog.clearCache()
    # the e2e entries run DIFFERENT plans (ingest/merge/gold build) that
    # the registry warm-up never touches, and their warm-up slope is LONG
    # (measured 10-run series: 20.8 cold → 9.3 → ~7.1 s steady state by
    # run 7 — ARCHITECTURE.md bench-protocol notes).  One untimed run each
    # moves the timed samples off the cliff; the n=5 median (below)
    # handles the rest of the slope.
    bench_pipeline(spark)
    bench_pipeline_txlog(spark)
    bench_dml_lifecycle(spark)

    import statistics

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    samples["pipeline_e2e_2k_auctions"] = []
    samples["pipeline_e2e_txlog"] = []
    samples["dml_lifecycle_lineitem"] = []
    # interleave whole passes (not per-query repeats) so a transient system
    # load spike degrades one PASS, which the median then discards
    for _ in range(RUNS):
        for name in HEADLINE:
            spec = Q.REGISTRY[name]
            t0 = time.time()
            force(spec.builder(spark, SF_DIR))
            samples[name].append(time.time() - t0)
            # builders track_persist() subframes for their own reuse;
            # release exactly those blocks so one entry's cache doesn't
            # distort the next (clearCache backstops untracked persists)
            release_build_caches()
            spark.catalog.clearCache()
        samples["pipeline_e2e_2k_auctions"].append(bench_pipeline(spark))
        samples["pipeline_e2e_txlog"].append(bench_pipeline_txlog(spark))
        samples["dml_lifecycle_lineitem"].append(bench_dml_lifecycle(spark))
    # q53/q56 showed ±15% run-to-run spread at n=3 (round-4 creep was
    # indistinguishable from jitter); two extra samples → median over 5.
    # pipeline_e2e joined the list in round 6: its r5 reading (9.31 s)
    # was a single-pass outlier of the same kind — see the 10-run
    # steady-state measurement in ARCHITECTURE.md's bench-protocol notes.
    for _ in range(2):
        samples["pipeline_e2e_2k_auctions"].append(bench_pipeline(spark))
    for name in EXTRA_RUNS_QUERIES:
        for _ in range(2):
            spec = Q.REGISTRY[name]
            t0 = time.time()
            force(spec.builder(spark, SF_DIR))
            samples[name].append(time.time() - t0)
            release_build_caches()
            spark.catalog.clearCache()
    timings = {
        name: round(statistics.median(vals), 3)
        for name, vals in samples.items()
    }

    sf1 = (
        sweep_sf1(spark)
        if os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
        else None
    )
    sf5 = (
        sweep_sf5(spark)
        if os.environ.get("SPARK_GRAFT_SF5", "1") != "0"
        else None
    )
    # driver-side metadata plane on a live-file-count curve (snapshot
    # assembly / checkpoint / metadata-only count / zone-map pruning /
    # OPTIMIZE policy at 1k→100k add actions) — the 100×-scale evidence
    # for the txlog's DRIVER cost, orthogonal to the data-volume sweeps
    metaplane = None
    if os.environ.get("SPARK_GRAFT_METAPLANE", "1") != "0":
        from tools.bench_metadata_plane import MEASURED_10M, run_curve

        # the 1M point closes the last 100×-scale extrapolation
        # (round-9 VERDICT directive 2): ~75 s, dominated by synthesis
        metaplane = run_curve(
            spark, points=(1_000, 10_000, 100_000, 1_000_000)
        )
        # the 10M decade (round-10 VERDICT directive 4) was measured
        # once on this box (30.4 min wall — synthesis + the known-dead
        # dict-path verbs dominate; far too heavy for the per-round
        # loop).  The measured row rides the curve with explicit
        # provenance; SPARK_GRAFT_META10M=1 re-measures it live, and
        # `python tools/bench_metadata_plane.py 10000000` reproduces
        # it ad hoc.  The scale-relevant verbs are linear: cold
        # tx_count 0.2→2.0 s and cold prune 0.26→2.6 s per 1M→10M.
        if os.environ.get("SPARK_GRAFT_META10M", "0") == "1":
            metaplane += run_curve(spark, points=(10_000_000,))
        else:
            metaplane = metaplane + [dict(MEASURED_10M)]

    bpe_curve = (
        bench_bpe_k_curve(spark)
        if os.environ.get("SPARK_GRAFT_BPE_CURVE", "1") != "0"
        else None
    )

    kcenter_curve = None
    if os.environ.get("SPARK_GRAFT_KCENTER_CURVE", "1") != "0":
        ensure_sf1(spark)
        kcenter_curve = bench_kcenter_curve(spark)

    # mirror the volume-bound sf1 legs into the headline dict (see
    # NON_COMPARABLE's note) — same numbers the sweep just measured
    if sf1 is not None:
        for src_name in (
            "q53_ngram_jaccard_pairs",
            "q56_minhash_lsh_near_dup",
            "dml_lifecycle_lineitem",
        ):
            if src_name in sf1["queries"]:
                timings[f"{src_name}_sf1"] = sf1["queries"][src_name]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # headline value = the SAME query set rounds 1-3 totalled, so the
    # cross-round/baseline ratio stays apples-to-apples; the ACID-path
    # entry (added per round-3 directive 6) is recorded per-query above
    # and compared against pipeline_e2e_2k_auctions, not the baseline
    comparable = sum(
        v for k, v in timings.items() if k not in NON_COMPARABLE
    )
    headline = {
        "metric": "headline_queries_total_runtime",
        "value": round(comparable, 3),
        "unit": "sec",
        "queries": timings,
        "runs": RUNS,
        "stat": "median",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # self-evidencing scaling runs (round-13 VERDICT item 2): the
        # session honors $SPARK_GRAFT_CPUS, and the payload now proves
        # the effective parallelism instead of leaving the driver to
        # infer it from (job-floor-bound) ratios
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "parallelism": spark.sparkContext.defaultParallelism,
        "full": "BENCH_full_latest.json",
    }
    # The driver's BENCH_r{N}.json captures a bounded tail (~2000 chars)
    # of stdout; rounds 9-12 lost the one-line JSON because the curve
    # sections inside the line pushed its head out of that tail.  The
    # FULL payload (sf1/sf5 sweeps, metadata-plane / BPE / k-center
    # curves) therefore goes to a committed repo file, and the stdout
    # contract line is the compact headline printed LAST.
    Path(__file__).resolve().parent.joinpath(
        "BENCH_full_latest.json"
    ).write_text(
        json.dumps(
            {
                **headline,
                "sf1": sf1,
                "sf5": sf5,
                "file_count_curve": metaplane,
                "bpe_k_curve": bpe_curve,
                "kcenter_k_curve": kcenter_curve,
            }
        )
        + "\n"
    )
    spark.stop()
    print(json.dumps(headline))


def bench_kcenter(spark, k: int = 32) -> float:
    """Greedy k-center traversal (round-10b, q277's operator) at the
    sf1 embedding volume (20k × 64d), k=32: the cost is k bounded
    argmax rounds — at any corpus size each round is one narrow
    projection + one 1-row aggregate, so this leg measures the
    job-scheduling floor the traversal pays per center (the BPE
    batch=1 analogy; min-of-2)."""
    from pyspark.sql import functions as F

    from cars_bids_data_pipeline_v0__spark.operators import similarity as S

    e = (
        spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
        .select("vec_id", S.as_double(F.col("embedding")).alias("v"))
    )
    best = None
    for _ in range(2):
        t0 = time.time()
        centers = S.kcenter_traverse(e, k)
        assert len(centers) == k
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


if __name__ == "__main__":
    main()
