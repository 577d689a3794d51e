"""Golden end-to-end: raw JSON (both vintages) → bronze → F1 split →
silver → S5 merge sink → gold star schema; plus idempotence (M1-M3) and
keep-latest (D1) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.plans.gold import (
    GoldStore,
    build_star_schema,
    seed_state_dim,
)
from cars_bids_data_pipeline_v0__spark.plans.silver import transform_records
from cars_bids_data_pipeline_v0__spark.schemas import SILVER, STAGING_COLUMNS
from cars_bids_data_pipeline_v0__spark.sources.ingest import read_raw_auctions
from cars_bids_data_pipeline_v0__spark.sources.sinks import (
    merge_write_partitioned,
    write_text_queue,
)

from .fixtures import write_raw_files


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    rawdir = tmp_path_factory.mktemp("raw")
    meta = write_raw_files(str(rawdir))
    records = read_raw_auctions(spark, str(rawdir))
    silver, rescrape = transform_records(records)
    return silver.persist(), rescrape, meta


def test_schema_is_silver(pipeline_out):
    silver, _, _ = pipeline_out
    assert [f.name for f in silver.schema.fields] == STAGING_COLUMNS
    # types match; engine nullability may be stricter (e.g. fillna(0) cols)
    assert [(f.name, f.dataType) for f in silver.schema.fields] == [
        (f.name, f.dataType) for f in SILVER.fields
    ]


def test_validity_split_routes_invalid_to_rescrape(pipeline_out):
    _, rescrape, meta = pipeline_out
    urls = [r[0] for r in rescrape.collect()]
    assert urls == meta["rescrape_expected"]


def test_keep_latest_dedup(pipeline_out):
    silver, _, _ = pipeline_out
    rows = {r["auction_id"]: r for r in silver.collect()}
    # 4 auctions scraped, 1 invalid, aaa111 duplicated → 3 silver rows
    assert sorted(rows) == ["aaa111", "bbb222", "ddd444"]
    # D1: the re-scrape of aaa111 (2024-03-05, 2 bids) won
    a = rows["aaa111"]
    assert str(a["auction_date"]).startswith("2024-03-05")
    assert a["bids"] == [25000, 24000]
    assert a["auction_status"] == "Sold buyer2"  # C8 substring replace
    assert a["reserve_met"] is False  # 'sold buyer2' != 'sold'


def test_transform_column_semantics(pipeline_out):
    silver, _, _ = pipeline_out
    rows = {r["auction_id"]: r for r in silver.collect()}
    a, b, d = rows["aaa111"], rows["bbb222"], rows["ddd444"]
    assert a["mileage"] == 87000
    assert a["highest_bid_value"] == 20750.0
    assert a["view_count"] == 12345 and a["watcher_count"] == 678
    assert a["model"] == "M3"  # first line only
    assert a["seller"] == "sellerguy"  # 'Follow' dropped
    assert a["title_status_cleaned"] == "Clean" and a["title_state"] == "FL"
    assert a["city"] == "Seattle" and a["state"] == "WA"
    assert a["transmission_type"] == "Manual" and a["gears"] == 6
    assert a["drivetrain"] == "RWD"
    assert a["manufacture_year"] == 2014
    # C18 on the deduped winner: [25000, 24000]
    assert a["max_bid"] == 25000 and a["min_bid"] == 24000
    assert a["mean_bid"] == pytest.approx(24500.0)
    assert a["median_bid"] == pytest.approx(24500.0)
    assert a["bid_range"] == 1000
    # b: full-value reserve replace hit exactly
    assert b["auction_status"] == "Reserve not met"
    # list-vintage highlight/service drift still lands
    assert b["highlight_count"] == 2 and b["service_count"] == 1
    # d: C11 all-or-nothing → [] → C18 all null
    assert d["bids"] == []
    assert d["max_bid"] is None and d["median_bid"] is None


def test_merge_sink_and_idempotence(spark, pipeline_out, tmp_path):
    silver, rescrape, _ = pipeline_out
    table = str(tmp_path / "silver_lake")
    touched = merge_write_partitioned(spark, silver, table)
    assert touched == ["2024-03-02", "2024-03-04", "2024-03-05"]
    lake1 = spark.read.parquet(table)
    assert lake1.count() == 3
    # merge the same batch again → unchanged (M5 idempotence)
    merge_write_partitioned(spark, silver, table)
    lake2 = spark.read.parquet(table)
    assert lake2.count() == 3
    # late update for one auction: newer date → new partition; the stale
    # row stays in the old partition (reference parity) and latest-only
    # read shadows it (load-path D1)
    upd = silver.filter(F.col("auction_id") == "bbb222").withColumn(
        "auction_date", F.to_timestamp(F.lit("2024-03-09 01:00:00"))
    )
    merge_write_partitioned(spark, upd, table)
    assert spark.read.parquet(table).count() == 4  # stale row physically kept
    from cars_bids_data_pipeline_v0__spark.sources.ingest import read_silver_lake

    lake3 = read_silver_lake(spark, table)
    assert lake3.count() == 3
    got = lake3.filter(F.col("auction_id") == "bbb222").collect()
    assert len(got) == 1 and str(got[0]["auction_date"]).startswith("2024-03-09")
    # S9 work queue
    qdir = str(tmp_path / "queue")
    write_text_queue(rescrape, qdir)
    lines = [r[0] for r in spark.read.text(qdir).collect()]
    assert lines == ["https://carsandbids.com/auctions/ccc333/2014-ford-x"]


def test_gold_star_schema_and_idempotence(spark, pipeline_out, tmp_path):
    silver, _, _ = pipeline_out
    store = GoldStore(spark, str(tmp_path / "gold"))
    states = spark.createDataFrame(
        [(1, "Washington", "WA"), (2, "Florida", "FL")],
        "id long, state string, state_abbr string",
    )
    seed_state_dim(store, states)
    CHECK = ("auction_status_dim", "city_dim", "vehicle_make_dim",
             "vehicle_model_dim", "vehicle_dim", "auction_fact")

    def snapshot(tables):
        # eager copy: overwrites invalidate lazy parquet-backed frames
        return {n: sorted(str(r) for r in tables[n].collect()) for n in CHECK}

    gold = build_star_schema(store, silver)
    fact = {r["auction_id"]: r for r in gold["auction_fact"].collect()}
    assert len(fact) == 3
    a = fact["aaa111"]
    # joins resolved: state via title_state abbr, city composite, dims
    assert a["auction_state"] == 2  # title_state FL
    assert a["vehicle_id"] is not None
    assert a["auction_status"] is not None and a["seller_type"] is not None
    # city_dim J1 OR-join: Seattle matched WA by abbr → state_id 1
    city = {(r["city_name"], r["state_id"]) for r in gold["city_dim"].collect()}
    assert ("Seattle", 2) in city or ("Seattle", 1) in city
    # vehicle_dim payload
    v = gold["vehicle_dim"].filter(F.col("auction_id") == "aaa111").collect()[0]
    assert v["gear_count"] == 6 and v["title_status"] == "Clean"
    snap1 = snapshot(gold)
    # rerun the whole load → identical tables (M1-M3 idempotence)
    gold2 = build_star_schema(store, silver)
    snap2 = snapshot(gold2)
    for name in CHECK:
        assert snap1[name] == snap2[name], name
    # update path (M2): change a vehicle attribute, same (vin, auction_id)
    upd = silver.withColumn(
        "engine", F.when(F.col("auction_id") == "aaa111", "SWAPPED V8")
        .otherwise(F.col("engine"))
    )
    gold3 = build_star_schema(store, upd)
    v3 = gold3["vehicle_dim"].filter(F.col("auction_id") == "aaa111").collect()[0]
    assert v3["engine"] == "SWAPPED V8"
    assert v3["vehicle_id"] == v["vehicle_id"]  # surrogate id stable
    assert gold3["auction_fact"].count() == 3  # fact insert-ignore


def test_malformed_and_empty_raw_files_do_not_fail(spark, tmp_path):
    """PERMISSIVE ingest (SURVEY §1.3): unparseable files drop out; the
    valid file's records survive untouched."""
    import os

    from cars_bids_data_pipeline_v0__spark.plans.silver import transform_records
    from cars_bids_data_pipeline_v0__spark.sources.ingest import read_raw_auctions

    from .fixtures import write_raw_files

    rawdir = str(tmp_path / "raw")
    write_raw_files(rawdir)
    with open(os.path.join(rawdir, "broken.json"), "w") as f:
        f.write("{this is not json")
    with open(os.path.join(rawdir, "empty.json"), "w") as f:
        f.write("")
    records = read_raw_auctions(spark, rawdir)
    silver, rescrape = transform_records(records)
    # same outcome as without the junk files: 4 distinct auctions,
    # 3 valid post-dedup, 1 rescrape
    assert silver.count() == 3
    assert rescrape.count() == 1
