"""Z-order clustering: per-file min/max ranges on EVERY z-column shrink
versus a hash layout (the property parquet row-group skipping feeds on),
and the rewrite is lossless."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.zorder import (
    morton_interleave,
    zorder_write,
)


def _per_file_ranges(path, col):
    spans = []
    for name in os.listdir(path):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        lo = min(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)]
                .index(col)
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(
                [md.schema.column(j).name for j in range(md.num_columns)]
                .index(col)
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(hi - lo)
    return spans


def _mk(spark, n=20000):
    return spark.range(n).select(
        "id",
        (F.col("id") % 141).cast("long").alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).cast("long").alias("y"),
    )


def test_zorder_narrows_per_file_ranges_on_both_columns(spark, tmp_path):
    df = _mk(spark)
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zord")
    df.repartition(16).write.mode("overwrite").parquet(naive)
    zorder_write(df, zord, ["x", "y"], num_files=16)

    for col in ("x", "y"):
        naive_avg = sum(_per_file_ranges(naive, col)) / 16
        z_spans = _per_file_ranges(zord, col)
        z_avg = sum(z_spans) / len(z_spans)
        # hash layout: every file spans ~the full range; z-order: each
        # file covers a compact curve segment → a fraction of the range
        assert z_avg < 0.6 * naive_avg, (col, z_avg, naive_avg)


def test_zorder_rewrite_is_lossless_and_sorted(spark, tmp_path):
    df = _mk(spark, 5000)
    out = str(tmp_path / "z")
    zorder_write(df, out, ["x", "y"], num_files=8)
    back = spark.read.parquet(out)
    assert sorted(r["id"] for r in back.collect()) == list(range(5000))
    assert set(back.columns) == {"id", "x", "y"}  # __z never materializes


def test_morton_interleave_is_monotone_in_each_arg(spark):
    df = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(8)], "a long, b long"
    )
    z = df.select(
        "a", "b",
        morton_interleave([F.col("a"), F.col("b")], bits=3).alias("z"),
    )
    rows = {(r["a"], r["b"]): r["z"] for r in z.collect()}
    assert len(set(rows.values())) == 64  # bijective on the grid
    # interleave of (a,0): bits of a at even positions
    assert rows[(0, 0)] == 0 and rows[(1, 0)] == 1 and rows[(0, 1)] == 2
    for a in range(7):
        assert rows[(a + 1, 0)] > rows[(a, 0)]
        assert rows[(0, a + 1)] > rows[(0, a)]
