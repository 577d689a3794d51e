"""Same-box A/B of the ANN probe's file-list path (VERDICT r10 #1).

Round 10 pointed `ivf_index_probe` at `tx_files_in_partitions`, whose
fast path answers columnarly off the checkpoint SIDECAR; the round-10
bench then read probe 3.60→4.57 s / build 8.49→9.83 s at sf1 vs the r9
recording, with no same-box A/B to tell sidecar overhead from box noise.

This tool settles it by timing, on ONE box in ONE session:

* the sf1 probe leg with NO checkpoint (the bench's actual state: a
  2-commit index has no checkpoint, so `tx_files_in_partitions` falls
  through to the dict path — i.e. the bench NEVER runs the sidecar
  path) — n reps;
* the same probe after `log.checkpoint()` with metadata caches cleared
  per rep (cold sidecar path) and warm (snapshot cached) — n reps each;
* `tx_files_in_partitions` in ISOLATION (µs-scale, 100 reps) on both
  paths at the sf1 index AND on a fabricated large cell-partitioned
  log (bench_metadata_plane's synth), where the sidecar path is the
  one that scales.

Used ad hoc: ``python tools/bench_ann_ab.py [n_large]``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid


def _ensure_repo_on_path():
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _clear_metadata_caches():
    from tools.bench_metadata_plane import (
        _clear_metadata_caches as clear,
    )

    clear()


def probe_leg(spark, sf1_dir: str, reps: int = 3) -> dict:
    """The bench_ann_index shapes, A/B'd over checkpoint states."""
    from pyspark.sql import functions as F

    from cars_bids_data_pipeline_v0__spark.operators.similarity import (
        kmeans_centroids,
    )
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        TransactionLog,
        tx_files_in_partitions,
    )
    from cars_bids_data_pipeline_v0__spark.streaming.ann_index import (
        ivf_index_probe,
        ivf_index_sink,
    )

    corpus = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")
    tmp = tempfile.mkdtemp(prefix="ann_ab_")
    out: dict = {}
    try:
        centroids = kmeans_centroids(corpus, nlist=16, iters=1)
        index = f"{tmp}/index"
        sink = ivf_index_sink(index, centroids, stream_id="ab")
        t0 = time.time()
        sink(corpus.filter(F.col("vec_id") % 2 == 0), 0)
        sink(corpus.filter(F.col("vec_id") % 2 == 1), 1)
        out["build_2batch_sec"] = round(time.time() - t0, 3)
        queries = corpus.filter(F.col("vec_id") % 397 == 0).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_vec"),
        )

        def probe_once() -> float:
            t0 = time.time()
            ivf_index_probe(
                spark, index, queries, centroids, k=10, nprobe=4
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        out["probe_dict_path_sec"] = [
            round(probe_once(), 3) for _ in range(reps)
        ]

        log = TransactionLog(index)
        log.checkpoint()
        cold = []
        for _ in range(reps):
            _clear_metadata_caches()
            cold.append(round(probe_once(), 3))
        out["probe_sidecar_cold_sec"] = cold
        out["probe_sidecar_warm_sec"] = [
            round(probe_once(), 3) for _ in range(reps)
        ]

        # the file-list call in ISOLATION at this index's size
        cells = set(range(8))
        out["filelist_sf1"] = _filelist_micro(
            index, cells, tx_files_in_partitions, log
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _filelist_micro(path, cells, fn, log, reps: int = 50) -> dict:
    """µs-scale timings of tx_files_in_partitions on each path."""
    res: dict = {}
    # warm dict (snapshot cached)
    log._live_actions_shared()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn(path, cells)
    res["warm_per_call_ms"] = round(
        (time.perf_counter() - t0) / reps * 1e3, 3
    )
    # cold sidecar per call
    t = 0.0
    for _ in range(reps):
        _clear_metadata_caches()
        t0 = time.perf_counter()
        fn(path, cells)
        t += time.perf_counter() - t0
    res["cold_sidecar_per_call_ms"] = round(t / reps * 1e3, 3)
    # cold dict per call: clear caches AND hide the checkpoint meta so
    # the fallback replays the raw log into the snapshot
    from cars_bids_data_pipeline_v0__spark.sources import txlog as TX

    real = TX.TransactionLog._latest_checkpoint_meta
    try:
        TX.TransactionLog._latest_checkpoint_meta = lambda self, v: None
        t = 0.0
        for _ in range(reps):
            _clear_metadata_caches()
            t0 = time.perf_counter()
            fn(path, cells)
            t += time.perf_counter() - t0
        res["cold_dict_per_call_ms"] = round(t / reps * 1e3, 3)
    finally:
        TX.TransactionLog._latest_checkpoint_meta = real
    return res


def large_leg(spark, n_files: int = 1_000_000) -> dict:
    """The scale side: fabricated cell-partitioned log, both paths."""
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        TransactionLog,
        tx_files_in_partitions,
    )
    from tools.bench_metadata_plane import synth_log_table

    root = tempfile.mkdtemp(prefix="ann_ab_large_")
    try:
        path = os.path.join(root, "t")
        synth_log_table(
            spark, path, n_files,
            files_per_commit=5_000 if n_files >= 500_000 else 500,
        )
        log = TransactionLog(path)
        log.checkpoint()
        cells = {str(c) for c in range(8)}
        return {
            "n_files": n_files,
            **_filelist_micro(
                path, cells, tx_files_in_partitions, log, reps=5
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    _ensure_repo_on_path()
    import bench as B
    from cars_bids_data_pipeline_v0__spark.session import get_session

    spark = get_session(app_name="ann-ab")
    B.ensure_sf1(spark)
    out = {"sf1": probe_leg(spark, B.SF1_DIR)}
    n_large = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if n_large:
        out["large"] = large_leg(spark, n_large)
    print(json.dumps(out, indent=2))
    spark.stop()
