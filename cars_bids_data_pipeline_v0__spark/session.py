"""SparkSession factory with engine-pinned configuration.

The reference pipeline is single-process pandas (eager, UTC-naive-ish); the
engine pins the Spark settings that make its semantics reproducible at any
scale:

* ``spark.sql.session.timeZone=UTC`` — the reference parses datetimes with
  ``pd.to_datetime(..., utc=True)`` (transform_lambda/main.py:139); all
  engine timestamps are UTC.
* AQE on — runtime coalescing/skew-join handling for the 100 TB target.
* dynamic partition overwrite — the parquet fallback of the per-partition
  merge sink rewrites only touched date partitions.

Any externally supplied session (e.g. the verification driver's) also works:
every operator in the engine uses ANSI-safe expressions (``try_cast`` /
``try_element_at`` / guarded regexp) so behavior does not depend on
``spark.sql.ansi.enabled``.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


@contextmanager
def scoped_conf(spark: SparkSession, keys: dict[str, str]):
    """Set session confs for a statement block, restoring prior values
    (or unsetting back to defaults) on exit.  Session conf is
    thread-global — callers own the no-concurrent-conflicting-queries
    discipline (the engine's harnesses drive statements sequentially)."""
    old: dict[str, str | None] = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@contextmanager
def size_coalesced_shuffle(spark: SparkSession, advisory: str = "64m"):
    """Scope AQE's SIZE-based partition coalescing to a statement block.

    ``spark.sql.adaptive.coalescePartitions.parallelismFirst`` defaults to
    true, which keeps every post-shuffle stage at >= the cluster's default
    parallelism even when the shuffle carries a few KB — each tiny window /
    distinct / merge stage then pays (cores) no-op task launches plus an
    AQE re-plan (measured on the round-13 box: a 100-row window+write job
    is 0.50 s with 32 post-shuffle tasks vs 0.25 s coalesced).  Flipping to
    size-first is exactly Spark's documented recommendation for it, and at
    production volume it is the SCALE-CORRECT behavior as well: partition
    counts derive from bytes (advisory 64m), not from whatever core count
    the session happens to have — which also keeps the bench's
    lower-core-count scaling runs honest (nothing is tuned to local[32]).

    It is a CONTEXT, not a session default, because parallelism-first is
    the right call for CPU-heavy small-byte stages (q28's per-group array
    stats, q53's shingle join at bench SFs lose 2x when serialized onto
    size-derived partition counts).  The ETL pipeline paths (silver merge
    sink, gold star build) are window/join/write-shaped with per-row costs
    already paid on the scan side, so they take the coalesced shape.

    Session-level conf is thread-global: the gold build's own worker pool
    inheriting the setting is intended; callers must not run unrelated
    CPU-bound queries concurrently with the block (the engine's harnesses
    drive statements sequentially).
    """
    with scoped_conf(
        spark,
        {
            "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": advisory,
        },
    ):
        yield


def get_session(
    app_name: str = "cars_bids_data_pipeline_v0__spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession pinned to engine semantics."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # lets the txlog Python data source (sources/pyds.py) do
        # metadata-level file pruning behind the planner; the source
        # degrades to an unpruned reader when this is off
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
