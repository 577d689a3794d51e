"""Explicit StructType schemas for the three engine layers.

The reference has no declared schema — pandas infers dtypes and columns
materialize by assignment (transform_lambda/main.py:105-108, 319-325).  The
engine replaces that with three explicit layers (SURVEY §1.3):

* ``RAW``    — nested, permissive; shape of the scraped auction JSON
               (src/rescrape/scrape_auction.py:29-76).
* ``SILVER`` — flat, typed; the 45-column frame produced by the reference's
               transform stage (transform_lambda/main.py:136-316; insert list
               load_lambda/main.py:84-92).
* ``GOLD``   — star schema: 9 dimensions + 1 fact
               (src/lambdas/load_lambda/update_dims.sql:8-223).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# RAW — one record per auction as scraped (scrape_auction.py:29-76).
# All leaves arrive as strings ("12,345 miles", "$1,234"); silver parses.
# --------------------------------------------------------------------------

AUCTION_STATS = T.StructType(
    [
        T.StructField("reserve_status", T.StringType()),
        T.StructField("auction_status", T.StringType()),
        T.StructField("highest_bid_value", T.StringType()),
        T.StructField("buyer_username", T.StringType()),
        T.StructField("seller_username", T.StringType()),
        T.StructField("bid_count", T.StringType()),
        T.StructField("view_count", T.StringType()),
        T.StructField("watcher_count", T.StringType()),
        T.StructField("auction_date", T.StringType()),
        T.StructField("bids", T.ArrayType(T.StringType())),
    ]
)

AUCTION_QUICK_FACTS = T.StructType(
    [
        T.StructField("Make", T.StringType()),
        T.StructField("Model", T.StringType()),
        T.StructField("Mileage", T.StringType()),
        T.StructField("VIN", T.StringType()),
        T.StructField("Title Status", T.StringType()),
        T.StructField("Location", T.StringType()),
        T.StructField("Seller", T.StringType()),
        T.StructField("Engine", T.StringType()),
        T.StructField("Drivetrain", T.StringType()),
        T.StructField("Transmission", T.StringType()),
        T.StructField("Body Style", T.StringType()),
        T.StructField("Exterior Color", T.StringType()),
        T.StructField("Interior Color", T.StringType()),
        T.StructField("Seller Type", T.StringType()),
    ]
)

# Fields that drift between null | [items] | {description, items/bullet_points}
# across file vintages (extract_list_field, transform_lambda/main.py:52-61).
DESC_ITEMS = T.StructType(
    [
        T.StructField("description", T.StringType()),
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("bullet_points", T.ArrayType(T.StringType())),
    ]
)

RAW_AUCTION = T.StructType(
    [
        T.StructField("auction_url", T.StringType()),
        T.StructField("auction_title", T.StringType()),
        T.StructField("auction_subtitle", T.StringType()),
        T.StructField("auction_stats", AUCTION_STATS),
        T.StructField("auction_quick_facts", AUCTION_QUICK_FACTS),
        T.StructField("dougs_take", T.StringType()),
        T.StructField("auction_highlights", DESC_ITEMS),
        T.StructField("services", DESC_ITEMS),
        T.StructField("service_history", DESC_ITEMS),
        T.StructField("auction_equipment", T.ArrayType(T.StringType())),
        T.StructField("modifications", T.ArrayType(T.StringType())),
        T.StructField("known_flaws", T.ArrayType(T.StringType())),
        T.StructField("included_items", T.ArrayType(T.StringType())),
        T.StructField("ownership_history", T.StringType()),
        T.StructField("seller_notes", T.ArrayType(T.StringType())),
        T.StructField("auction_videos", T.ArrayType(T.StringType())),
    ]
)

# --------------------------------------------------------------------------
# SILVER — the 45 columns the warehouse loader inserts
# (load_lambda/main.py:84-92), typed per transform_lambda/main.py:136-325.
# --------------------------------------------------------------------------

SILVER = T.StructType(
    [
        T.StructField("auction_date", T.TimestampType()),
        T.StructField("auction_id", T.StringType()),
        T.StructField("vin", T.StringType()),
        T.StructField("seller_type", T.StringType()),
        T.StructField("reserve_status", T.StringType()),
        T.StructField("reserve_met", T.BooleanType()),
        T.StructField("auction_status", T.StringType()),
        T.StructField("auction_title", T.StringType()),
        T.StructField("auction_subtitle", T.StringType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("exterior_color", T.StringType()),
        T.StructField("interior_color", T.StringType()),
        T.StructField("body_style", T.StringType()),
        T.StructField("mileage", T.LongType()),
        T.StructField("engine", T.StringType()),
        T.StructField("drivetrain", T.StringType()),
        T.StructField("transmission", T.StringType()),
        T.StructField("transmission_type", T.StringType()),
        T.StructField("gears", T.IntegerType()),
        T.StructField("title_status_cleaned", T.StringType()),
        T.StructField("title_state", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("bid_count", T.LongType()),
        T.StructField("view_count", T.LongType()),
        T.StructField("watcher_count", T.LongType()),
        T.StructField("highest_bid_value", T.DoubleType()),
        T.StructField("max_bid", T.LongType()),
        T.StructField("min_bid", T.LongType()),
        T.StructField("mean_bid", T.DoubleType()),
        T.StructField("median_bid", T.DoubleType()),
        T.StructField("bid_range", T.LongType()),
        T.StructField("bids", T.ArrayType(T.LongType())),
        T.StructField("highlight_count", T.IntegerType()),
        T.StructField("equipment_count", T.IntegerType()),
        T.StructField("mod_count", T.IntegerType()),
        T.StructField("flaw_count", T.IntegerType()),
        T.StructField("service_count", T.IntegerType()),
        T.StructField("included_items_count", T.IntegerType()),
        T.StructField("video_count", T.IntegerType()),
        T.StructField("manufacture_year", T.IntegerType()),
        T.StructField("location", T.StringType()),
        T.StructField("auction_url", T.StringType()),
        T.StructField("seller", T.StringType()),
    ]
)

# P6 — fixed insert order (load_lambda/main.py:84-92).
STAGING_COLUMNS = [f.name for f in SILVER.fields]

# Extra columns silver carries beyond the staging insert list (present in the
# NDJSON lake but projected away by P6): the title_status raw field and the
# intermediate list columns survive in the reference's lake files too.
SILVER_EXTRA = ["title_status", "auction_highlights", "services_list"]

# --------------------------------------------------------------------------
# GOLD — star schema (update_dims.sql).  Order matters: M6 runs the six
# independent dims, then city (needs state), make, model (needs make),
# vehicle (needs 5 dims), fact (needs everything)
# (load_lambda/main.py:16-28).
# --------------------------------------------------------------------------

STATE_DIM = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("state", T.StringType()),
        T.StructField("state_abbr", T.StringType()),
    ]
)

GOLD_TABLE_ORDER = [
    "auction_status_dim",
    "body_style_dim",
    "reserve_status_dim",
    "transmission_dim",
    "drivetrain_dim",
    "seller_type_dim",
    "city_dim",
    "vehicle_make_dim",
    "vehicle_model_dim",
    "vehicle_dim",
    "auction_fact",
]
