#!/usr/bin/env python
"""Dump formatted physical plans for every registered query and flag
scale anti-patterns: missing filter pushdown, un-pruned scans, nested-loop
joins where a broadcast-hash was expected, row-at-a-time Python evals.

Usage: python tools/explain_plans.py [--sf DIR] [--only q02] [--out plans.txt]
"""

from __future__ import annotations

import argparse
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = [
    ("python-udf-in-plan", re.compile(r"BatchEvalPython")),
    ("cartesian-product", re.compile(r"CartesianProduct")),
    ("full-scan-no-pruning", re.compile(r"ReadSchema: struct<(?:[^>]{400,})>")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from cars_bids_data_pipeline_v0__spark.plans import queries as Q
    from cars_bids_data_pipeline_v0__spark.session import get_session

    spark = get_session(app_name="explain")
    Q._load_extensions()

    out = open(args.out, "w") if args.out else sys.stdout
    for name, spec in Q.REGISTRY.items():
        if args.only and args.only not in name:
            continue
        txt = plan_text(spec.builder(spark, args.sf))
        flags = [label for label, rx in CHECKS if rx.search(txt)]
        scans = re.findall(r"ReadSchema: (struct<[^\n]*)", txt)
        pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", txt)
        joins = re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", txt)
        wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", txt)))
        print(f"==== {name} ====", file=out)
        print(f"joins: {joins or '-'} | codegen spans: {wsc} | "
              f"flags: {flags or 'none'}", file=out)
        for p in pushed:
            if p != "[]":
                print(f"  pushed: {p}", file=out)
        for s in scans:
            print(f"  scan: {s[:160]}", file=out)
        if args.only:
            print(txt, file=out)
    if args.out:
        out.close()


if __name__ == "__main__":
    main()
