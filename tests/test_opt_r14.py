"""Round-14 optimization internals: the append-path write-parallelism
row estimate (`_scan_exact_rows`) and its wiring through
`tx_append_partitioned(expected_rows=)`."""

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.sources.txlog import (
    TransactionLog,
    _scan_exact_rows,
    tx_append_partitioned,
    tx_read,
)


def test_scan_exact_rows_pure_parquet_scan(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(1234).select(
        "id", (F.col("id") % 5).cast("string").alias("p")
    ).write.parquet(src)
    df = spark.read.parquet(src)
    assert _scan_exact_rows(df) == 1234
    # a projection (select / withColumn) keeps the row count exact
    assert _scan_exact_rows(df.select("id")) == 1234
    assert _scan_exact_rows(df.withColumn("x", F.col("id") + 1)) == 1234


def test_scan_exact_rows_refuses_non_scan_shapes(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(100).select(
        "id", (F.col("id") % 5).cast("string").alias("p")
    ).write.parquet(src)
    df = spark.read.parquet(src)
    # a filter makes footer rows an overcount — must return None
    assert _scan_exact_rows(df.filter("id < 10")) is None
    # post-shuffle shapes (aggregate, dropDuplicates) — None
    assert _scan_exact_rows(df.groupBy("p").count()) is None
    assert _scan_exact_rows(df.dropDuplicates(["id"])) is None
    # a non-parquet source (in-memory) — None
    assert _scan_exact_rows(spark.range(10)) is None


def test_append_auto_estimate_subsplits_bulk_load(spark, tmp_path):
    """A pure parquet-scan append whose footers exceed the sub-split
    threshold must run >1 encode chunk per partition value.  The
    threshold itself is a 2M-row production constant; here the frame is
    small, so the bound is exercised through the explicit hint on one
    table and the footer-derived estimate (monkeypatched threshold would
    reach into stage internals) on none — the estimate path's contract
    is _scan_exact_rows() above plus this hint pass-through."""
    from cars_bids_data_pipeline_v0__spark.session import scoped_conf

    src = str(tmp_path / "src")
    spark.range(300).select(
        "id", (F.col("id") % 3).cast("string").alias("p")
    ).write.parquet(src)
    df = spark.read.parquet(src)

    # explicit hint above the threshold: sub-split fires
    with scoped_conf(
        spark,
        {"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    ):
        t1 = str(tmp_path / "t_hint")
        tx_append_partitioned(
            spark, df, t1, partition_by="p", expected_rows=5_000_000
        )
    files = TransactionLog(t1).live_files()
    assert len(files) > 3
    # every file still keys on exactly one partition value
    assert set(files.values()) == {"0", "1", "2"}
    got = tx_read(spark, t1)
    assert got.count() == 300
    assert got.select(F.sum("id")).collect()[0][0] == 300 * 299 // 2

    # no hint, small scan: the footer estimate (300) stays below the
    # threshold — classic compact layout, one file per value
    t2 = str(tmp_path / "t_auto")
    tx_append_partitioned(spark, df, t2, partition_by="p")
    files2 = TransactionLog(t2).live_files()
    assert len(files2) == 3
    assert tx_read(spark, t2).count() == 300
