"""Small-file compaction for partitioned parquet lakes.

Every incremental merge (``merge_write_partitioned``) or streaming
micro-batch appends a few files per touched partition; after thousands of
batches a 100 TB lake degrades into millions of KB-sized files — scan
planning, footer reads, and task scheduling start to dominate query time.
Compaction is the maintenance op that rewrites fragmented partitions into
target-sized files.

Design points (the parts that matter at scale):

* **Partition-selective.** Only partitions whose file count / average
  file size violates the thresholds are rewritten — work is proportional
  to fragmentation, not table size, so compaction can run continuously.
* **Size-targeted, not count-targeted.** File count per partition is
  derived from actual partition bytes / ``target_file_bytes`` — a skewed
  partition gets more files, a tiny one gets one.
* **Atomic per partition.** Each partition is rewritten through Spark's
  dynamic partition overwrite (stage → swap), so readers never see a
  half-compacted partition.  (On a transactional table format this whole
  module becomes ``OPTIMIZE``; the interface is kept compatible.)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PartitionStats:
    partition: str  # e.g. "auction_saving_date=2024-03-01"
    n_files: int
    total_bytes: int

    @property
    def avg_bytes(self) -> float:
        return self.total_bytes / max(1, self.n_files)


def partition_stats(table_path: str) -> list[PartitionStats]:
    """File census per leaf partition directory (driver-side listing —
    on object stores swap for the catalog/manifest listing)."""
    out: list[PartitionStats] = []
    for entry in sorted(os.scandir(table_path), key=lambda e: e.name):
        if not entry.is_dir() or not entry.name.count("="):
            continue
        files = [
            f
            for f in os.scandir(entry.path)
            if f.is_file() and f.name.endswith(".parquet")
        ]
        out.append(
            PartitionStats(
                entry.name,
                len(files),
                sum(f.stat().st_size for f in files),
            )
        )
    return out


def fragmented_partitions(
    stats: list[PartitionStats],
    target_file_bytes: int,
    max_files_per_partition: int = 4,
) -> list[PartitionStats]:
    """A partition needs compaction when it has more than
    ``max_files_per_partition`` files AND its files average under half
    the target size (many big files are fine — that's just data)."""
    return [
        s
        for s in stats
        if s.n_files > max_files_per_partition
        and s.avg_bytes < target_file_bytes / 2
    ]


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_files_per_partition: int = 4,
) -> dict[str, int]:
    """Rewrite fragmented partitions into ⌈bytes/target⌉ files each.

    Returns ``{partition_dir: files_after}`` for the rewritten
    partitions.  Untouched partitions are never read or written.
    """
    stats = partition_stats(table_path)
    victims = fragmented_partitions(
        stats, target_file_bytes, max_files_per_partition
    )
    if not victims:
        return {}
    # one read pruned to the victim partitions, one dynamic overwrite
    col, _ = victims[0].partition.split("=", 1)
    values = [s.partition.split("=", 1)[1] for s in victims]
    planned = {
        s.partition: max(1, -(-s.total_bytes // target_file_bytes))
        for s in victims
    }
    df = spark.read.parquet(table_path)
    pruned = df.filter(F.col(col).cast("string").isin(values))
    # per-partition output file count: bucket ∈ [0, planned_i) chosen by a
    # CASE on the partition value, then hash-repartition on (partition,
    # bucket).  Each (partition, bucket) combo lands in one task → at most
    # planned_i files per directory (hash collisions can only merge
    # combos, never split them).  monotonically_increasing_id is only a
    # row-spreader here — it never reaches the data.
    n_buckets = F.lit(1)
    for s in victims:
        n_buckets = F.when(
            F.col(col).cast("string") == s.partition.split("=", 1)[1],
            F.lit(planned[s.partition]),
        ).otherwise(n_buckets)
    bucket = F.pmod(F.xxhash64(F.monotonically_increasing_id()), n_buckets)
    (
        pruned.repartition(sum(planned.values()), F.col(col), bucket)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(col)
        .parquet(table_path)
    )
    after = {
        s.partition: ps.n_files
        for s in victims
        for ps in partition_stats(table_path)
        if ps.partition == s.partition
    }
    return after


def compacted_copy(
    df: DataFrame, partition_col: str, files_per_partition: int = 1
) -> DataFrame:
    """Plan-side helper: shape a frame so a write produces
    ``files_per_partition`` files per partition value (repartition on the
    partition column plus a bounded salt — no global single-task sink)."""
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id()),
        F.lit(files_per_partition),
    )
    return df.repartition(F.col(partition_col), salt)
