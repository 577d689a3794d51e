#!/usr/bin/env python
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names/order-insensitive schema, and an order-insensitive
value comparison (exact for ints/strings/timestamps, exact-after-float() for
doubles).  Stricter than any reasonable hash — if this passes, the driver's
hash passes.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only q01]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _spark_kind(dt_obj):
    """Canonical physical-type kind for a Spark DataType (for Arrow parity)."""
    from pyspark.sql import types as T

    if isinstance(dt_obj, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt_obj, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt_obj, T.DecimalType):
        return "decimal"
    if isinstance(dt_obj, T.BooleanType):
        return "bool"
    if isinstance(dt_obj, T.StringType):
        return "str"
    if isinstance(dt_obj, T.BinaryType):
        return "bytes"
    if isinstance(dt_obj, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt_obj, T.DateType):
        return "date"
    if isinstance(dt_obj, T.ArrayType):
        return ("list", _spark_kind(dt_obj.elementType))
    if isinstance(dt_obj, T.MapType):
        return ("map", _spark_kind(dt_obj.keyType), _spark_kind(dt_obj.valueType))
    if isinstance(dt_obj, T.StructType):
        return ("struct",) + tuple(
            (f.name, _spark_kind(f.dataType)) for f in dt_obj.fields
        )
    return str(dt_obj)


def _arrow_kind(t):
    """Canonical physical-type kind for a pyarrow DataType."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _arrow_kind(t.value_type))
    if pa.types.is_map(t):
        return ("map", _arrow_kind(t.key_type), _arrow_kind(t.item_type))
    if pa.types.is_struct(t):
        return ("struct",) + tuple(
            (t.field(i).name, _arrow_kind(t.field(i).type))
            for i in range(t.num_fields)
        )
    return str(t)


def arrow_type_mismatches(con, sql, sdf):
    """Compare DuckDB's Arrow output types with Spark's schema per column.

    The driver's hash serializes both results through Arrow, so a value-equal
    pair can still hash-differently if the physical types diverge — e.g.
    DuckDB sum() returning HUGEINT (Arrow decimal128) vs Spark BIGINT
    (Arrow int64).  fetchall() comparison is blind to this class.
    """
    arrow_schema = con.execute(
        f"SELECT * FROM ({sql}) __q LIMIT 0"
    ).arrow().schema
    duck = {f.name: _arrow_kind(f.type) for f in arrow_schema}
    spark = {f.name: _spark_kind(f.dataType) for f in sdf.schema.fields}
    out = []
    for name in sorted(set(duck) & set(spark)):
        if duck[name] != spark[name]:
            out.append(f"type[{name}]: spark={spark[name]} duck={duck[name]}")
    return out


def frame_to_rows(cols, rows):
    """Sort columns by name, then rows lexicographically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--first", type=int, default=None,
                    help="check only the first N queries (driver window)")
    ap.add_argument("--ansi", action="store_true",
                    help="run with spark.sql.ansi.enabled=true (the "
                         "session.py ANSI-safety claim, enforced)")
    ap.add_argument("--ansi-window", type=int, default=None, metavar="N",
                    help="with --ansi: check a ROTATING window of N "
                         "queries keyed on the round number (count of "
                         "CORRECTNESS_r*.json), and write ANSI_SWEEP.json "
                         "so an ANSI regression in an OLD query cannot "
                         "land silently (round-12 VERDICT directive 3)")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from cars_bids_data_pipeline_v0__spark.cache import release_build_caches
    from cars_bids_data_pipeline_v0__spark.session import get_session

    extra = {"spark.sql.ansi.enabled": "true"} if args.ansi else None
    spark = get_session(app_name="oracle-check", extra_conf=extra)
    if args.ansi:
        # getOrCreate may have reused a live session: force the claim
        spark.conf.set("spark.sql.ansi.enabled", "true")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ansi_round = None
    if args.ansi_window:
        # deterministic rotation: round r covers names[r*N % M :][:N]
        # (wrapping), over the SORTED registry — every query is re-swept
        # under ANSI at least once every ceil(M/N) rounds
        repo = Path(__file__).resolve().parent.parent
        ansi_round = len(list(repo.glob("CORRECTNESS_r*.json")))
        names = sorted(qs)
        n, m = args.ansi_window, len(names)
        start = (ansi_round * n) % m
        window = (names[start:] + names[:start])[:n]
        qs = {w: qs[w] for w in window}
    if args.first:
        qs = dict(list(qs.items())[: args.first])
    if args.only:
        pats = [p for p in args.only.split(",") if p]
        qs = {n: f for n, f in qs.items() if any(p in n for p in pats)}
        if not qs:
            print(f"--only {args.only!r} matched no queries")
            sys.exit(2)
    failures, skipped = [], []
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, args.sf)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        # builders track_persist() reused subframes for their own build;
        # release exactly those blocks between queries so a full registry
        # sweep doesn't accumulate cache/disk pressure across the session
        # (clearCache stays as a backstop for any untracked persist)
        release_build_caches()
        spark.catalog.clearCache()
        if name not in oracles:
            skipped.append(name)
            print(f"~ {name:42s} rows-only ({len(srows)} rows, {spark_s:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        duck_s = time.time() - t0
        ok = True
        msgs = []
        type_diffs = arrow_type_mismatches(con, oracles[name], sdf)
        if type_diffs:
            ok = False
            msgs.extend(type_diffs)
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        else:
            _, s_norm = frame_to_rows(scols, srows)
            _, d_norm = frame_to_rows(dcols, drows)
            if s_norm != d_norm:
                ok = False
                for i, (a, b) in enumerate(zip(s_norm, d_norm)):
                    if a != b:
                        msgs.append(f"first diff at sorted row {i}:")
                        msgs.append(f"  spark: {a}")
                        msgs.append(f"  duck : {b}")
                        break
        status = "✓" if ok else "✗"
        print(f"{status} {name:42s} {len(srows):>7} rows  "
              f"spark {spark_s:5.1f}s  duck {duck_s:5.1f}s")
        if not ok:
            failures.append(name)
            for m in msgs:
                print(f"    {m}")
    print(f"\n{len(qs) - len(failures) - len(skipped)} ok, "
          f"{len(failures)} failed, {len(skipped)} rows-only")
    if args.ansi_window:
        import json as _json

        artifact = Path(__file__).resolve().parent.parent / "ANSI_SWEEP.json"
        artifact.write_text(_json.dumps({
            "round": ansi_round,
            "window_size": args.ansi_window,
            "sf": args.sf,
            "queries": sorted(qs),
            "ok": len(qs) - len(failures) - len(skipped),
            "rows_only": sorted(skipped),
            "failed": sorted(failures),
        }, indent=1) + "\n")
        print(f"ANSI_SWEEP.json written (round {ansi_round}, "
              f"{len(qs)} queries)")
    if failures:
        print("FAILED:", ", ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
