"""Small-file compaction: fragmented partitions get rewritten into few
files, data survives byte-identical, healthy partitions are untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.sources.compaction import (
    compact_partitions,
    compacted_copy,
    fragmented_partitions,
    partition_stats,
)


def _files(table, part):
    d = os.path.join(table, part)
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


def _write_fragmented(spark, table, dates, files_each):
    """files_each appends of one row per date → files_each files/partition."""
    for i in range(files_each):
        df = spark.createDataFrame(
            [(d, i, f"row-{d}-{i}") for d in dates],
            "dt string, batch long, payload string",
        )
        df.repartition(1).write.mode("append").partitionBy("dt").parquet(
            table
        )


def test_partition_stats_and_fragmentation_census(spark, tmp_path):
    table = str(tmp_path / "lake")
    _write_fragmented(spark, table, ["2024-01-01", "2024-01-02"], 6)
    stats = {s.partition: s for s in partition_stats(table)}
    assert set(stats) == {"dt=2024-01-01", "dt=2024-01-02"}
    assert all(s.n_files == 6 for s in stats.values())
    victims = fragmented_partitions(
        list(stats.values()), target_file_bytes=1 << 20,
        max_files_per_partition=4,
    )
    assert len(victims) == 2
    # raising the allowed file count exempts them
    assert not fragmented_partitions(
        list(stats.values()), 1 << 20, max_files_per_partition=8
    )


def test_compact_rewrites_victims_only_and_preserves_data(spark, tmp_path):
    table = str(tmp_path / "lake")
    frag_dates = ["2024-01-01", "2024-01-02"]
    _write_fragmented(spark, table, frag_dates, 6)
    # one healthy partition: a single decent file
    spark.createDataFrame(
        [("2024-02-01", 99, "healthy")], "dt string, batch long, payload string"
    ).coalesce(1).write.mode("append").partitionBy("dt").parquet(table)
    healthy_before = set(_files(table, "dt=2024-02-01"))
    before = sorted(
        map(str, spark.read.parquet(table).collect())
    )

    after_counts = compact_partitions(
        spark, table, target_file_bytes=1 << 20,
        max_files_per_partition=4,
    )
    assert set(after_counts) == {f"dt={d}" for d in frag_dates}
    for part, n in after_counts.items():
        assert n == 1  # tiny partitions compact to a single file
        assert len(_files(table, part)) == 1
    # healthy partition byte-untouched (same file names)
    assert set(_files(table, "dt=2024-02-01")) == healthy_before
    after = sorted(map(str, spark.read.parquet(table).collect()))
    assert after == before
    # second run: nothing fragmented → no-op
    assert compact_partitions(
        spark, table, 1 << 20, max_files_per_partition=4
    ) == {}


def test_compacted_copy_bounds_files_per_partition(spark, tmp_path):
    table = str(tmp_path / "out")
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("dt"), "id"
    )
    compacted_copy(df, "dt", files_per_partition=2).write.mode(
        "overwrite"
    ).partitionBy("dt").parquet(table)
    for part in ("dt=0", "dt=1", "dt=2"):
        assert 1 <= len(_files(table, part)) <= 2


def test_csv_permissive_roundtrip_and_corrupt_audit(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.ingest import (
        read_csv_table,
    )

    p = tmp_path / "in.csv"
    p.write_text("id,name,amount\n1,a,10.5\n2,b,20.0\nbad-row-no-commas\n")
    # cache: Spark disallows querying only the corrupt-record column of a
    # raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = read_csv_table(
        spark, str(p), schema="id long, name string, amount double"
    ).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert "bad-row-no-commas" in bad.collect()[0]["_corrupt_record"]


def test_orc_roundtrip_preserves_rows(spark, tmp_path):
    from cars_bids_data_pipeline_v0__spark.sources.ingest import (
        read_table,
        write_read_orc,
    )

    nation = read_table(spark, "/root/testdata/sf0.001", "nation")
    back = write_read_orc(nation, str(tmp_path / "nation_orc"))
    assert sorted(map(str, back.collect())) == sorted(
        map(str, nation.collect())
    )


def test_register_views_enables_plain_sql(spark):
    from cars_bids_data_pipeline_v0__spark.sources import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert len(names) == 10
    # cross-table SQL straight through the catalog surface
    row = spark.sql(
        """
        SELECT n.n_name, round(sum(l.l_extendedprice), 2) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name ORDER BY rev DESC LIMIT 1
        """
    ).collect()[0]
    assert row["rev"] > 0
    # the events normalization (nanos ts -> timestamp) carries into SQL
    ts_type = dict(spark.table("events").dtypes)["ts"]
    assert ts_type in ("timestamp", "timestamp_ntz")
    assert spark.sql("SELECT max(ts) FROM events").collect()[0][0].year == 2024
