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
