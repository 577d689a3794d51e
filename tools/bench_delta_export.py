"""Measure `tx_export_delta_log` on a table of N REAL parquet files —
the round-13 companion to `bench_metadata_plane.py` for the one
metadata verb that is inherently per-real-file I/O (the Delta spec
requires ``size``/``modificationTime`` per add, and the export
footer-checks every file for schema divergence), so it cannot ride the
fabricated-action harness.

Usage: ``python tools/bench_delta_export.py [n_files] [--serial]``
(default 100_000).  Stages n tiny uniform-schema parquet files through
pyarrow, commits them in 5k-file batches, then times the export with
the fork path enabled (default) or forced serial (--serial), printing
one JSON line.

MEASURED (quiet box, 2026-08-16, round 13, this tool at 100k real
files): serial 10.24 s / forked 2.51 s -> 4.1x; per-file 102.3 us
serial, 25.1 us forked.  The pass is per-file footer read + 2 stats +
json.dumps, all embarrassingly parallel across fork workers, so the
constant extrapolates linearly: a 10M-file export projects to ~17 min
serial vs ~4.2 min forked on this box's filesystem — the remaining
cost is the spec-mandated per-real-file syscalls (size +
modificationTime per add, plus the divergence footer check), not
GIL-serialized python (the round-12 write-side concern), and it forks
8-wide.  A full 10M measurement would need 10M real files on disk
(the fabricated-log harness cannot stat them), hence the documented
linear extrapolation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid


def stage(n_files: int, root: str, files_per_commit: int = 5000) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from cars_bids_data_pipeline_v0__spark.sources.txlog import (
        _DATA_DIR, TransactionLog,
    )

    t = os.path.join(root, "tbl")
    data = os.path.join(t, _DATA_DIR)
    os.makedirs(data)
    log = TransactionLog(t)
    tbl = pa.table({"id": pa.array([1, 2, 3], pa.int32()),
                    "p": pa.array(["a", "b", "c"])})
    made, v = 0, 0
    while made < n_files:
        batch = []
        for _ in range(min(files_per_commit, n_files - made)):
            rel = f"{_DATA_DIR}/{uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, os.path.join(t, rel))
            batch.append({
                "path": rel, "partition": None, "partition_col": None,
                "bytes": 1024, "rows": 3,
                "cols": {"id": "int32", "p": "string"},
                "stats": {"id": [1, 3]},
            })
            made += 1
        assert log.try_commit(v, batch, [], op="append")
        v += 1
    return t


def main() -> None:
    n = 100_000
    serial = False
    for a in sys.argv[1:]:
        if a == "--serial":
            serial = True
        else:
            n = int(a)
    root = tempfile.mkdtemp(prefix="delta_export_bench_")
    try:
        t0 = time.perf_counter()
        t = stage(n, root)
        stage_s = time.perf_counter() - t0

        from cars_bids_data_pipeline_v0__spark.sources import txlog as TX

        if not serial:
            TX._EXPORT_PARALLEL_MIN = 1
        t0 = time.perf_counter()
        out = TX.tx_export_delta_log(t)
        export_s = time.perf_counter() - t0
        n_lines = sum(
            1 for _ in open(
                os.path.join(out, "_delta_log", f"{0:020d}.json")
            )
        )
        assert n_lines == n + 3, n_lines
        print(json.dumps({
            "n_files": n,
            "mode": "serial" if serial else "forked",
            "stage_sec": round(stage_s, 2),
            "export_sec": round(export_s, 3),
            "per_file_us": round(export_s / n * 1e6, 1),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
