"""Sinks (SURVEY §2.1 S5-S9).

S5 — the reference's hand-rolled per-partition merge: group rows by auction
date, and per date-file either write fresh or read-concat-dedup-rewrite
(load_to_s3, transform_lambda/main.py:327-399).  That is a MERGE keyed on
``auction_id`` with update-wins-by-recency.

Spark-first (no Delta in this container): a date-partitioned parquet table
with *dynamic partition overwrite* — only the partitions present in the new
batch are read back, unioned, window-deduped (D1), and atomically swapped.
Partition pruning makes the read-back proportional to the batch, not the
table.  Single-writer assumption is inherited from the reference
(:373-392); for MULTI-writer deployments use `sources.txlog.
tx_merge_partitioned` — the same merge semantics under a transactional
commit log (optimistic concurrency, snapshot isolation, time travel).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import keep_latest

PARTITION_COL = "auction_saving_date"


def merge_write_partitioned(
    spark: SparkSession,
    new_df: DataFrame,
    table_path: str,
    key: str = "auction_id",
    order_by: str = "auction_date",
    partition_src: str = "auction_date",
) -> list[str]:
    """S5/M5 — merge ``new_df`` into the date-partitioned parquet table at
    ``table_path``; returns the partition values written (the reference
    returns the list of touched S3 keys, transform_lambda/main.py:397-399).
    """
    from ..session import size_coalesced_shuffle

    # size-first AQE coalescing for the whole merge: the dedup windows and
    # the partition-clustering exchange are byte-light at any batch size
    # relative to core count, and the coalesced shape also writes sanely
    # sized files (round-13 optimization pass — measurement and scale
    # argument in size_coalesced_shuffle's docstring)
    with size_coalesced_shuffle(spark):
        return _merge_write_partitioned_inner(
            spark, new_df, table_path, key, order_by, partition_src
        )


def _merge_write_partitioned_inner(
    spark: SparkSession,
    new_df: DataFrame,
    table_path: str,
    key: str,
    order_by: str,
    partition_src: str,
) -> list[str]:
    batch = new_df.withColumn(PARTITION_COL, F.to_date(F.col(partition_src)))
    batch = keep_latest(batch, key, order_by=order_by).persist()
    try:
        touched = [
            str(r[0])
            for r in batch.select(PARTITION_COL).distinct().collect()
        ]
        if not touched:
            return []
        if _table_exists(table_path):
            existing = spark.read.parquet(table_path)
            # partition-pruned read-back: only the dates in this batch.
            # NOTE (parity): like the reference, the merge is per-date-
            # partition — a key re-arriving under a NEW date leaves its old
            # row in the old partition; consumers dedup at read
            # (read_silver_lake) exactly as the load path does
            # (load_lambda/main.py:96-97).
            overlap = existing.filter(F.col(PARTITION_COL).isin(touched))
            # date tie → existing row wins (existing_data + new_data concat
            # order under pandas' stable sort, transform_lambda/main.py:378-386)
            merged = keep_latest(
                overlap.withColumn("__src", F.lit(0)).unionByName(
                    batch.withColumn("__src", F.lit(1)),
                    allowMissingColumns=True,
                ),
                key,
                order_by=order_by,
                tiebreakers=[F.col("__src").asc()],
            ).drop("__src")
        else:
            merged = batch
        (
            merged.repartition(PARTITION_COL)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(table_path)
        )
        return sorted(touched)
    finally:
        batch.unpersist()


def _table_exists(path: str) -> bool:
    return os.path.exists(path) and any(
        n.startswith(PARTITION_COL + "=") or n.startswith("part-")
        for n in os.listdir(path)
    )


def write_text_queue(df: DataFrame, path: str, column: str = "auction_url") -> None:
    """S9 — rescrape work-queue: one URL per line
    (write_rescrape_urls_lambda/main.py:23-34)."""
    df.select(F.col(column).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    ).write.mode("overwrite").text(path)


def write_json_debug(df: DataFrame, path: str) -> None:
    """S8 — single-file JSON debug artifact (src/rescrape/main.py:117)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def write_jdbc_staging(
    df: DataFrame,
    url: str,
    table: str = "staging",
    properties: dict | None = None,
    batchsize: int = 150,
    truncate_and_load: bool = True,
    varchar_strings: int | None = None,
) -> None:
    """S6 + S7 — warehouse staging load over JDBC.

    Reference: tuple-ize + ``TRUNCATE TABLE staging`` + paged
    ``execute_values(page_size=150)`` (load_lambda/main.py:83-113).  Spark
    ships rows from executors in parallel JDBC connections instead of one
    driver-side cursor; ``overwrite`` + ``truncate`` reproduces the
    truncate-and-load semantics.  The engine-native path skips Postgres and
    writes gold parquet directly (plans.gold); this sink exists for
    capability parity.  Integration-tested against embedded Derby (the
    derby jars ship with pyspark) in tests/test_jdbc.py: full silver
    staging round-trip, truncate-and-load re-run stays duplicate-free.

    Complex columns (array/struct/map — e.g. silver's ``bids``) have no
    portable JDBC type, so they ship as JSON text — the engine-agnostic
    twin of the reference's driver-side tuple-ization; a Postgres target
    can cast back with ``::jsonb``.

    ``varchar_strings=N`` declares every string column as ``VARCHAR(N)``
    at table-create time; targets whose default string mapping is a
    non-comparable LOB (Derby → CLOB) need this for predicates to work
    against the staging table.  Postgres maps string → TEXT and doesn't.
    """
    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
    ]
    for c in complex_cols:
        df = df.withColumn(c, F.to_json(F.col(c)))
    writer = (
        df.write.mode("overwrite" if truncate_and_load else "append")
        .option("truncate", truncate_and_load)
        .option("batchsize", batchsize)
    )
    if varchar_strings is not None:
        ddl = ", ".join(
            f"{f.name} VARCHAR({varchar_strings})"
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        )
        if ddl:
            writer = writer.option("createTableColumnTypes", ddl)
    writer.jdbc(url, table, properties=properties or {})


def write_training_shards(
    packed: DataFrame,
    out_dir: str,
    rows_per_file: int = 100_000,
) -> DataFrame:
    """Materialize packed training sequences (operators/packing.py) as a
    shard-partitioned parquet layout a training loader can consume:
    ``out_dir/shard=N/part-*.parquet``, files capped at
    ``rows_per_file`` rows, rows clustered by ``(shard, pack_id)`` so a
    pack never straddles a row-group boundary by more than one file.

    Returns the per-shard manifest ``(shard, n_files, n_rows,
    n_packs)`` read back from the written data — what the loader uses to
    schedule workers.  One shuffle (the shard repartition); file sizing
    is the writer's ``maxRecordsPerFile``, not a driver loop.
    """
    (
        packed.repartition("shard")
        .sortWithinPartitions("shard", "pack_id")
        .write.partitionBy("shard")
        .option("maxRecordsPerFile", rows_per_file)
        .mode("overwrite")
        .parquet(out_dir)
    )
    spark = packed.sparkSession
    written = spark.read.parquet(out_dir).select(
        "shard", "pack_id", F.input_file_name().alias("__file")
    )
    return written.groupBy("shard").agg(
        F.count_distinct("__file").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("pack_id").alias("n_packs"),
    )
