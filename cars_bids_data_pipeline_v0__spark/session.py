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

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


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
