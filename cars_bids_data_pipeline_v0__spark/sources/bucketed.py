"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders shape) is
the pairwise shuffle.  Hash-bucketing both tables on the join key at WRITE
time moves that cost to ingest, amortized over every subsequent join: Spark
recognizes compatibly-bucketed scans and plans a SortMergeJoin with NO
Exchange on either side (verified by ``tests/test_bucketing.py``, which
asserts the physical plan is exchange-free).

Bucketing lives in the table catalog (``saveAsTable``); bucket count should
match the downstream ``spark.sql.shuffle.partitions`` order of magnitude so
AQE never re-partitions.  Delta/Iceberg replace this with hidden
partitioning / storage-partitioned joins; the DataFrame surface here is the
same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table.  Sorting by the join key lets SortMergeJoin skip its
    sort stage too."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
