"""Incremental time-bucket rollup — the hypertable continuous-aggregate
pattern over plain Spark tables.

A query like q40 (hourly counts/sums) re-scans all history every run; at
100 TB the history never fits a per-query scan.  This maintains the
aggregate INCREMENTALLY: each new batch aggregates to partial rows
(bucket, key, count, sum), merges with the stored partials for ONLY the
touched buckets, and rewrites those buckets.  Work per batch is
O(batch + touched_buckets), independent of table history.

Correct because count/sum are mergeable (partial aggregation algebra —
the same property AQE exploits map-side); avg derives at read time.
``read_rollup`` exposes the finished aggregate.  The same shape under
``foreachBatch`` gives the streaming continuous aggregate; batch callers
invoke ``merge_rollup`` directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partials(events: DataFrame, ts_col: str, key_cols: list[str],
              value_col: str, bucket: str) -> DataFrame:
    return (
        events.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
            *key_cols,
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
    )


def merge_rollup(
    spark: SparkSession,
    new_events: DataFrame,
    rollup_path: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    bucket: str = "hour",
) -> None:
    """Fold ``new_events`` into the stored rollup: only buckets present in
    the batch are read back, merged (sums of partials), and rewritten."""
    key_cols = key_cols if key_cols is not None else ["event_type"]
    batch = _partials(new_events, ts_col, key_cols, value_col, bucket).persist()
    try:
        if os.path.exists(rollup_path):
            existing = spark.read.parquet(rollup_path)
            touched = [r[0] for r in batch.select("bucket_start").distinct().collect()]
            overlap = existing.filter(F.col("bucket_start").isin(touched))
            untouched = existing.filter(~F.col("bucket_start").isin(touched))
            merged = (
                overlap.unionByName(batch)
                .groupBy("bucket_start", *key_cols)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").alias("sum_value"),
                )
                .unionByName(untouched)
            )
        else:
            merged = batch
        tmp = rollup_path + ".__tmp__"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(rollup_path):
            import shutil

            shutil.rmtree(rollup_path)
        os.rename(tmp, rollup_path)
    finally:
        batch.unpersist()


def rollup_stream(
    spark: SparkSession,
    events: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    bucket: str = "hour",
):
    """Continuous aggregate: `merge_rollup` per micro-batch."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_rollup(
            batch_df.sparkSession, batch_df, rollup_path,
            ts_col, key_cols, value_col, bucket,
        )

    return (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The finished aggregate, with derived avg (never avg-of-avgs)."""
    r = spark.read.parquet(rollup_path)
    return r.withColumn(
        "avg_value", F.col("sum_value") / F.col("n_events")
    )


# ---------------------------------------------------------------------------
# streaming M4 downsample — the continuous-aggregate twin of q193
# ---------------------------------------------------------------------------


def _m4_partials(
    events: DataFrame,
    lo_ms: int,
    hi_ms: int,
    n_buckets: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Mergeable M4 cells: min/max are trivially mergeable; first/last
    ride as lexicographic min/max over (ms, id, value) structs, so
    merging partials can never pick a different representative than a
    single-pass aggregate (the (ms, id) key is unique and totally
    ordered).  Bucket arithmetic is exact integer math shared with q193:
    ((ms - lo) * N) floor-div (hi - lo + 1).

    Events OUTSIDE the caller-fixed [lo_ms, hi_ms] window are DROPPED
    (the window is the retention contract): without the filter, a
    pre-window event's negative numerator truncates toward zero and
    pollutes bucket 0 — becoming its (ms, id)-smallest first_pt — and a
    post-window event emits bucket >= n_buckets.  Review finding, round
    4."""
    from ..functions.scalar import epoch_millis_encode

    ms = epoch_millis_encode(ts_col)
    events = events.filter(
        (ms >= F.lit(int(lo_ms))) & (ms <= F.lit(int(hi_ms)))
    )
    num = ((ms - F.lit(lo_ms)) * n_buckets).cast("long")
    den = F.lit(int(hi_ms) - int(lo_ms) + 1)
    bucket = ((num - (num % den)) / den).cast("long")
    return (
        events.select(
            F.col(key_col).alias("series"),
            bucket.alias("bucket"),
            F.struct(
                ms.alias("ms"),
                F.col(id_col).alias("id"),
                F.col(value_col).alias("v"),
            ).alias("pt"),
            F.col(value_col).alias("v"),
        )
        .groupBy("series", "bucket")
        .agg(
            F.count("*").alias("n_points"),
            F.min("v").alias("min_value"),
            F.max("v").alias("max_value"),
            F.min("pt").alias("first_pt"),
            F.max("pt").alias("last_pt"),
        )
    )


def merge_m4(
    spark: SparkSession,
    new_events: DataFrame,
    store_path: str,
    lo_ms: int,
    hi_ms: int,
    n_buckets: int = 100,
    **cols,
) -> None:
    """Fold a batch into the stored M4 cells (only touched buckets are
    rewritten — same shape as merge_rollup)."""
    batch = _m4_partials(new_events, lo_ms, hi_ms, n_buckets, **cols).persist()
    try:
        if os.path.exists(store_path):
            existing = spark.read.parquet(store_path)
            # touched-cell split via semi/anti joins on the (tiny) batch
            # key set — no driver-side key list, works at any cell count
            keys = batch.select("series", "bucket").distinct()
            overlap = existing.join(
                F.broadcast(keys), ["series", "bucket"], "left_semi"
            )
            untouched = existing.join(
                F.broadcast(keys), ["series", "bucket"], "left_anti"
            )
            merged = (
                overlap.unionByName(batch)
                .groupBy("series", "bucket")
                .agg(
                    F.sum("n_points").alias("n_points"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                    F.min("first_pt").alias("first_pt"),
                    F.max("last_pt").alias("last_pt"),
                )
                .unionByName(untouched)
            )
        else:
            merged = batch
        tmp = store_path + ".__tmp__"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(store_path):
            import shutil

            shutil.rmtree(store_path)
        os.rename(tmp, store_path)
    finally:
        batch.unpersist()


def m4_stream(
    spark: SparkSession,
    events: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    lo_ms: int,
    hi_ms: int,
    n_buckets: int = 100,
    **cols,
):
    """Continuous M4 downsample: per-batch mergeable partials, one
    ``batch_id=<id>`` partition each (idempotent under replay — an
    at-least-once redelivery overwrites its own partition).  Bounds are
    caller-fixed (a streaming job cannot see the global time range; in
    production they're the retention window)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # exactly-once across checkpoint replays: each micro-batch's
        # partial cells land under their own batch_id partition with
        # OVERWRITE, so an at-least-once redelivery rewrites the same
        # partition instead of double-counting (the matview_stream
        # contract).  read_m4 merges partials on read — cells are
        # mergeable by construction, so merge-on-read is exact.
        _m4_partials(
            batch_df, lo_ms, hi_ms, n_buckets, **cols
        ).write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}"
        )

    return (
        events.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_m4(spark: SparkSession, store_path: str) -> DataFrame:
    """Finished M4 cells flattened to the q193 output shape.  Works on
    both store layouts: a merge_m4 batch store (flat cells) and an
    m4_stream store (per-batch_id partial partitions — merged on read;
    exact because every cell statistic is mergeable)."""
    s = spark.read.parquet(store_path)
    if "batch_id" in s.columns:
        s = s.drop("batch_id")
    s = s.groupBy("series", "bucket").agg(
        F.sum("n_points").alias("n_points"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.min("first_pt").alias("first_pt"),
        F.max("last_pt").alias("last_pt"),
    )
    return s.select(
        F.col("series").alias("event_type"),
        "bucket",
        F.col("n_points").cast("long").alias("n_points"),
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.round(F.col("first_pt.v"), 6).alias("first_value"),
        F.round(F.col("last_pt.v"), 6).alias("last_value"),
    )
