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
]


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


def main() -> None:
    from cars_bids_data_pipeline_v0__spark.plans import queries as Q
    from cars_bids_data_pipeline_v0__spark.session import get_session

    spark = get_session(app_name="bench")
    Q._load_extensions()
    # warm the JVM/codegen path once (not timed)
    force(Q.REGISTRY["q02_revenue_by_nation"].builder(spark, SF_DIR).limit(1))

    import statistics

    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    samples["pipeline_e2e_2k_auctions"] = []
    samples["pipeline_e2e_txlog"] = []
    # interleave whole passes (not per-query repeats) so a transient system
    # load spike degrades one PASS, which the median then discards
    for _ in range(RUNS):
        for name in HEADLINE:
            spec = Q.REGISTRY[name]
            t0 = time.time()
            force(spec.builder(spark, SF_DIR))
            samples[name].append(time.time() - t0)
            # builders persist() subframes for their own reuse; drop the
            # blocks so one entry's cache doesn't distort the next
            spark.catalog.clearCache()
        samples["pipeline_e2e_2k_auctions"].append(bench_pipeline(spark))
        samples["pipeline_e2e_txlog"].append(bench_pipeline_txlog(spark))
    timings = {
        name: round(statistics.median(vals), 3)
        for name, vals in samples.items()
    }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # headline value = the SAME query set rounds 1-3 totalled, so the
    # cross-round/baseline ratio stays apples-to-apples; the ACID-path
    # entry (added per round-3 directive 6) is recorded per-query above
    # and compared against pipeline_e2e_2k_auctions, not the baseline
    comparable = sum(
        v for k, v in timings.items() if k != "pipeline_e2e_txlog"
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(comparable, 3),
                "unit": "sec",
                "queries": timings,
                "runs": RUNS,
                "stat": "median",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
