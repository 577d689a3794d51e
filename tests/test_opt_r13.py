"""Round-13 optimization internals: the scoped-conf contexts and the
staged-write sub-split (txlog.stage_dataframe expected_rows path)."""

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.session import (
    scoped_conf,
    size_coalesced_shuffle,
)
from cars_bids_data_pipeline_v0__spark.sources.txlog import (
    TransactionLog,
    tx_read,
)


def test_scoped_conf_sets_and_restores(spark):
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    before = spark.conf.get(key)
    with scoped_conf(spark, {key: "false"}):
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == before


def test_scoped_conf_restores_on_exception(spark):
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, {key: "1m"}):
            assert spark.conf.get(key) == "1m"
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before


def test_size_coalesced_shuffle_flips_parallelism_first(spark):
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    with size_coalesced_shuffle(spark):
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == "true"


def _stage(spark, tmp_path, expected_rows):
    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("p"),
    )
    log = TransactionLog(str(tmp_path / f"t_{expected_rows}"))
    adds = log.stage_dataframe(
        df, partition_by="p", expected_rows=expected_rows
    )
    assert log.try_commit(0, adds, [], op="append")
    return log, adds


def test_stage_small_expected_rows_keeps_one_file_per_value(spark, tmp_path):
    log, adds = _stage(spark, tmp_path, expected_rows=300)
    # below the 2M-row threshold the layout is the classic
    # one-file-per-partition-value
    assert len(adds) == 3
    assert sorted(a["partition"] for a in adds) == ["0", "1", "2"]
    got = tx_read(spark, log.path)
    assert got.count() == 300


def test_stage_large_expected_rows_subsplits_and_roundtrips(spark, tmp_path):
    # expected_rows is a METADATA bound, so the sub-split can be
    # exercised with a small frame: k = min(ceil(5M/1M), shuffle
    # partitions) = 5 content-hash buckets per partition value.  AQE
    # coalescing would re-merge these KB-sized test partitions (at real
    # volume each bucket exceeds minPartitionSize and stays split — the
    # point of the feature), so pin it off for a deterministic layout.
    with scoped_conf(
        spark,
        {"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    ):
        log, adds = _stage(spark, tmp_path, expected_rows=5_000_000)
    assert len(adds) > 3, "sub-split should produce >1 file per value"
    # every file still carries exactly one partition value
    assert set(a["partition"] for a in adds) == {"0", "1", "2"}
    # no rows lost or duplicated, and the partition column intact
    got = tx_read(spark, log.path)
    assert got.count() == 300
    assert got.select(F.sum("id")).collect()[0][0] == 300 * 299 // 2
    per = {
        r["p"]: r["n"]
        for r in got.groupBy("p").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"0": 100, "1": 100, "2": 100}
