"""Same-box A/B for the two round-12 sf1 bench spreads (VERDICT r12
directive 4, the bench_ann_ab playbook):

* ``corpus_release_coreset_50k_docs`` — 25.2 s on the driver's box vs
  17.4 s on the builder's quiet box (7.8 s spread, beyond the ±30%
  band), A/B'd against the plain release leg on the same session;
* ``dml_lifecycle_lineitem`` — 37.5 s driver vs 30.6–31.5 s r11 band.

Runs each leg's samples INTERLEAVED (A B A B ...) in one session on
one box so contention drift hits both alternatives equally; prints one
JSON line with all samples plus min/median per leg.

Usage: ``python tools/bench_ab_r13.py [reps]`` (default 3 — each rep
is one full leg run; the legs themselves are min-of-2 internally where
bench.py's are).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench as B
    from cars_bids_data_pipeline_v0__spark.plans import queries as Q
    from cars_bids_data_pipeline_v0__spark.session import get_session

    spark = get_session(app_name="bench-ab-r13")
    Q._load_extensions()
    B.ensure_sf1(spark)
    legs = {
        "corpus_release_plain": lambda: B.bench_corpus_release(spark),
        "corpus_release_coreset": lambda: B.bench_corpus_release(
            spark, coreset_k=64
        ),
        "dml_lifecycle_lineitem": lambda: B.bench_dml_lifecycle_10x(
            spark
        ),
    }
    samples: dict[str, list[float]] = {k: [] for k in legs}
    for r in range(reps):
        for name, fn in legs.items():
            t0 = time.time()
            v = fn()
            wall = round(time.time() - t0, 3)
            # the leg functions already return their own timing where
            # they implement min-of-2; record the leg's own number when
            # it returns one, else the wall time
            samples[name].append(v if isinstance(v, (int, float)) else wall)
            print(
                f"rep {r} {name}: {samples[name][-1]}",
                file=sys.stderr,
                flush=True,
            )
    out = {}
    for name, vals in samples.items():
        sv = sorted(vals)
        out[name] = {
            "samples": vals,
            "min": sv[0],
            "median": sv[len(sv) // 2],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
