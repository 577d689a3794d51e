"""Unit tests for the scalar expression library (SURVEY §2.4) — one test per
operator, pinned to the reference's pandas semantics including the sharp
edges called out in SURVEY §7's risk register."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.functions import scalar as S


def one(spark, expr, value, schema="v string"):
    return spark.createDataFrame([(value,)], schema).select(expr.alias("r")).collect()[0]["r"]


def many(spark, expr, values, schema="v string"):
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r["r"] for r in df.select(expr.alias("r")).collect()]


def test_extract_auction_id(spark):
    # C2: url.strip().split('/')[4] (transform_lambda/main.py:143-146)
    vals = many(
        spark,
        S.extract_auction_id("v"),
        [
            "  https://carsandbids.com/auctions/3mOrZeq6/2014-bmw \n",
            "https://a/b",  # short: ref raises; engine yields null
            None,
        ],
    )
    assert vals == ["3mOrZeq6", None, None]


def test_clean_first_line(spark):
    vals = many(spark, S.clean_first_line("v"),
                ["530i xDrive\nSave", "  M3  ", None, "one\ntwo\nthree"])
    assert vals == ["530i xDrive", "M3", None, "one"]


def test_extract_mileage(spark):
    # C4: first run of digits/commas; '' no-match → null
    # 'TMU, ~55000' → first match is the bare comma → ref raises int('');
    # engine yields null (try_cast) — the non-crashing analogue.
    vals = many(spark, S.extract_mileage("v"),
                ["87,000 miles", "~55000 shown", "no digits", None,
                 "1,2,3 then 9", "TMU, ~55000 shown"])
    assert vals == [87000, 55000, None, None, 123, None]


def test_parse_money(spark):
    vals = many(spark, S.parse_money("v"), ["$12,345", "$1,234.56", None, "junk"])
    assert vals == [12345.0, 1234.56, None, None]


def test_to_int_coerce_and_default0(spark):
    assert many(spark, S.to_int_coerce("v"), ["42", "x", None]) == [42, None, None]
    assert many(spark, S.to_int_coerce_default0("v"), ["1,234", "x", None]) == [1234, 0, 0]


def test_canon_status_substring_vs_fullvalue(spark):
    # C8 quirk: 'Sold to' is substring-replaced, but the reserve form is a
    # full-value replace — partial reserve strings stay unchanged.
    vals = many(
        spark,
        S.canon_status("v"),
        [
            "Sold to winner99",
            "Reserve not met, bid to",
            "Reserve not met, bid to $5,000",
            "Cancelled",
            None,
        ],
    )
    assert vals == [
        "Sold winner99",
        "Reserve not met",
        "Reserve not met, bid to $5,000",
        "Cancelled",
        None,
    ]


def test_reserve_met_null_is_false(spark):
    vals = many(spark, S.reserve_met("v"), ["Sold", "SOLD", "Reserve not met", None])
    assert vals == [True, True, False, False]


def test_clean_bids_all_or_nothing(spark):
    # C11: any failing element (or null input) empties the WHOLE list
    expr = S.clean_bids("v")
    schema = "v array<string>"
    assert one(spark, expr, ["$1,000", "$2,500"], schema) == [1000, 2500]
    assert one(spark, expr, ["$1,000", "oops"], schema) == []
    assert one(spark, expr, ["$1,000", None], schema) == []
    assert one(spark, expr, ["$12.50"], schema) == []  # int('12.50') raises
    assert one(spark, expr, [], schema) == []
    assert one(spark, expr, None, schema) == []


def test_title_status_regexes(spark):
    assert many(spark, S.title_status_cleaned("v"),
                ["Clean (FL)", "Salvage (MN, Odometer rollback)", "Clean", None]) == \
        ["Clean", "Salvage", None, None]
    assert many(spark, S.title_state("v"),
                ["Clean (FL)", "Salvage (MN, Odometer rollback)", "Clean", None]) == \
        ["FL", "MN, Odometer rollback", None, None]


def test_extract_city_state(spark):
    # C14: rsplit(',', 1); state = first space-token of right side
    cases = [
        ("Seattle, WA 98101", "Seattle", "WA"),
        ("San Jose, CA", "San Jose", "CA"),
        ("Toronto, ON, Canada", "Toronto, ON", "Canada"),
        ("Berlin", "Berlin", None),
        (None, None, None),
    ]
    city = many(spark, S.extract_city("v"), [c[0] for c in cases])
    state = many(spark, S.extract_state("v"), [c[0] for c in cases])
    assert city == [c[1] for c in cases]
    assert state == [c[2] for c in cases]


def test_transmission(spark):
    # C15/C16: ''/null → (null, null); manual precedes auto
    vals = many(spark, S.transmission_type("v"),
                ["Automatic (8-Speed)", "6-Speed Manual", "Automanual", "CVT", "", None])
    assert vals == ["Automatic", "Manual", "Manual", "Other", None, None]
    gears = many(spark, S.extract_gears("v"),
                 ["Automatic (8-Speed)", "6-Speed Manual", "CVT", "", None])
    assert gears == [8, 6, None, None, None]


def test_drivetrain_precedence(spark):
    # C17: exact branch order (clean_drivetrain, main.py:245-264)
    vals = many(
        spark,
        S.canon_drivetrain("v"),
        [
            "4WD/AWD system",        # both → 4WD/AWD
            "4WD with front bias",   # front beats 4wd
            "Rear-wheel drive",
            "All-wheel drive (AWD)",
            "Four-wheel drive",
            "FWD",                   # 'front' absent, no keywords → Other
            "",
            None,
        ],
    )
    assert vals == ["4WD/AWD", "FWD", "RWD", "AWD", "4WD", "Other", "Other", "Other"]


def test_bid_features_numpy_median_parity(spark):
    feats = S.bid_features(F.col("v"))
    df = spark.createDataFrame(
        [([100, 200, 50, 400],), ([3, 1, 2],), ([5],), ([],), (None,)],
        "v array<long>",
    )
    out = df.select(*[c.alias(n) for n, c in feats.items()]).collect()
    even = out[0]
    assert (even["max_bid"], even["min_bid"], even["bid_range"]) == (400, 50, 350)
    assert even["mean_bid"] == pytest.approx(187.5)
    assert even["median_bid"] == pytest.approx(150.0)  # mean of middle two
    odd = out[1]
    assert odd["median_bid"] == pytest.approx(2.0)
    for r in out[2:]:
        assert all(r[n] is None for n in feats)


def test_count_list(spark):
    vals = many(spark, S.count_list("v"), [["a", "b"], [], None], "v array<string>")
    assert vals == [2, 0, None]


def test_manufacture_year(spark):
    vals = many(
        spark,
        S.extract_manufacture_year("v"),
        [
            " https://carsandbids.com/auctions/abc/2014-bmw-m3 ",
            "https://carsandbids.com/auctions/abc/notayear-bmw",
            None,
        ],
    )
    assert vals == [2014, None, None]


def test_timestamp_roundtrip(spark):
    df = spark.createDataFrame([("2024-03-01 10:30:00",)], "v string")
    out = df.select(
        S.to_timestamp_utc("v").alias("ts"),
    ).select(
        F.col("ts"),
        S.epoch_millis_encode("ts").alias("ms"),
        S.auction_saving_date("ts").alias("d"),
    ).select(
        "ts", "ms", "d", S.epoch_millis_decode("ms").alias("back")
    ).collect()[0]
    assert out["ms"] == 1709289000000
    assert out["back"] == out["ts"]
    assert str(out["d"]) == "2024-03-01"


def test_norm_keys(spark):
    assert one(spark, S.norm_key_lower("v"), "  SoLD  ") == "sold"
    assert one(spark, S.norm_key_upper("v"), " awd ") == "AWD"
