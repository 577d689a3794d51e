"""txlog as a Spark data source (sources/pyds.py): batch/time-travel
reads, metadata file pruning behind pushFilters, and the commit-version-
offset streaming tail."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.sources.pyds import (
    TxLogBatchReader,
    TxLogDataSource,
    TxLogPruningBatchReader,
    _file_survives,
    register_txlog_source,
)
from cars_bids_data_pipeline_v0__spark.sources.txlog import (
    TransactionLog,
    tx_append_partitioned,
    tx_read,
)
from pyspark.sql.datasource import EqualTo, GreaterThan, In, LessThanOrEqual


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_txlog_source(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"doc{i}", i % 3) for i in range(lo, hi)],
        "id long, s string, p int",
    )


def test_batch_read_equals_tx_read_and_time_travels(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 10), t, partition_by="p")
    tx_append_partitioned(spark, _mk(spark, 10, 15), t, partition_by="p")

    got = spark.read.format("txlog").option("path", t).load()
    ref = tx_read(spark, t)
    assert got.schema == ref.schema
    assert _rows(got) == _rows(ref) and got.count() == 15

    old = spark.read.format("txlog").option("path", t).option("version", 0).load()
    assert _rows(old) == _rows(tx_read(spark, t, version=0))
    assert old.count() == 10


def test_batch_partitions_are_per_file_and_filters_correct(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 30), t, partition_by="p")
    df = (
        spark.read.format("txlog")
        .option("path", t)
        .option("partitionColumn", "p")
        .load()
    )
    got = df.filter((F.col("p") == 1) & (F.col("id") >= 10))
    expect = [(i, f"doc{i}", 1) for i in range(10, 30) if i % 3 == 1]
    assert _rows(got) == sorted(expect)


def test_file_survives_prunes_on_partition_and_zone_maps():
    act = {"partition": "2", "stats": {"id": [10, 19]}}
    # partition equality prunes
    assert not _file_survives(act, [EqualTo(("p",), 1)], "p")
    assert _file_survives(act, [EqualTo(("p",), 2)], "p")
    assert not _file_survives(act, [In(("p",), (0, 1))], "p")
    # zone maps prune ranges
    assert not _file_survives(act, [EqualTo(("id",), 25)], "p")
    assert _file_survives(act, [EqualTo(("id",), 12)], "p")
    assert not _file_survives(act, [GreaterThan(("id",), 19)], "p")
    assert _file_survives(act, [GreaterThan(("id",), 18)], "p")
    assert not _file_survives(act, [LessThanOrEqual(("id",), 9)], "p")
    # missing metadata keeps the file (conservative), as do unknown
    # columns and incomparable types
    assert _file_survives({}, [EqualTo(("id",), 25)], "p")
    assert _file_survives(act, [EqualTo(("other",), 1)], "p")
    assert _file_survives(act, [EqualTo(("id",), "not-an-int")], "p")


def test_pushdown_prunes_files_without_changing_results(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # three commits → three files per partition value bucket; stats on id
    for lo, hi in [(0, 10), (10, 20), (20, 30)]:
        log = TransactionLog(t)
        adds = log.stage_dataframe(
            _mk(spark, lo, hi), partition_by="p", stats_cols=["id"]
        )
        log.try_commit(log.version() + 1, adds, [], op="append")

    reader = TxLogPruningBatchReader({"path": t, "partitioncolumn": "p"})
    n_before = len(reader._live)
    unhandled = list(reader.pushFilters([EqualTo(("p",), 1), GreaterThan(("id",), 19)]))
    assert len(unhandled) == 2  # everything handed back to Spark
    assert reader._pruned > 0 and len(reader._live) < n_before
    # what survives is exactly partition p=1 of the last commit
    for act in reader._live.values():
        assert act["partition"] == "1" and act["stats"]["id"][1] > 19

    # end-to-end: same query through the planner returns the right rows
    df = (
        spark.read.format("txlog")
        .option("path", t)
        .option("partitionColumn", "p")
        .load()
        .filter((F.col("p") == 1) & (F.col("id") > 19))
    )
    assert _rows(df) == sorted(
        (i, f"doc{i}", 1) for i in range(20, 30) if i % 3 == 1
    )


def test_reader_degrades_without_pushdown_session(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx_append_partitioned(spark, _mk(spark, 0, 3), t, partition_by="p")
    ds = TxLogDataSource({"path": t})
    assert isinstance(ds.reader(None), TxLogPruningBatchReader)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    try:
        r = ds.reader(None)
        assert isinstance(r, TxLogBatchReader)
        assert not isinstance(r, TxLogPruningBatchReader)
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def test_stream_tail_is_exactly_once_across_restarts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    seen: list[tuple[int, list[int]]] = []

    def sink(df, bid):
        seen.append((bid, sorted(r["id"] for r in df.collect())))

    def run():
        q = (
            spark.readStream.format("txlog")
            .option("path", t)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    tx_append_partitioned(spark, _mk(spark, 0, 5), t, partition_by="p")
    run()
    assert seen == [(0, [0, 1, 2, 3, 4])]
    run()  # nothing new: no batch at all, or an empty one
    assert [ids for _, ids in seen if ids] == [[0, 1, 2, 3, 4]]
    tx_append_partitioned(spark, _mk(spark, 5, 8), t, partition_by="p")
    tx_append_partitioned(spark, _mk(spark, 8, 9), t, partition_by="p")
    run()  # both new commits, delivered once, never the old rows again
    delivered = [i for _, ids in seen for i in ids]
    assert sorted(delivered) == list(range(9))
    assert len(delivered) == 9


def test_stream_refuses_compacted_history_unless_opted_in(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.txlog import tx_compact

    t = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    tx_append_partitioned(spark, _mk(spark, 0, 4), t, partition_by="p")
    tx_append_partitioned(spark, _mk(spark, 4, 8), t, partition_by="p")
    # rewrites history → remove actions in the log
    tx_compact(spark, t, partition_by="p")

    def run(**opts):
        reader = (
            spark.readStream.format("txlog").option("path", t)
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises(Exception, match="append-only|remove actions"):
        run()
    run(ignoreDeletes="true")  # opted in: succeeds


def test_schema_inference_matches_tx_read_with_timestamps(spark, tmp_path):
    t = str(tmp_path / "ts tbl")  # space in path too
    df = spark.createDataFrame(
        [("a", "2024-05-01 10:00:00", [1.0, 2.0])],
        "k string, d string, arr array<double>",
    ).select(
        "k",
        F.to_timestamp("d").alias("ts"),
        F.to_date("d").alias("dt"),
        "arr",
        F.lit(1).alias("p"),
    )
    tx_append_partitioned(spark, df, t, partition_by="p")
    got = spark.read.format("txlog").option("path", t).load()
    ref = tx_read(spark, t)
    assert got.schema == ref.schema
    assert _rows(got) == _rows(ref)
