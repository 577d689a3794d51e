"""Entry point A — the bronze→silver transform plan (SURVEY §3.1).

The reference's ``clean_and_transform`` (transform_lambda/main.py:136-316)
materializes a new pandas frame after every step; here the whole chain is
**one lazy projection** over the normalized bronze frame — Catalyst
collapses C1-C20 into a single WholeStageCodegen stage, and the only
shuffle is D1's window partitionBy(auction_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import track
from ..functions import scalar as S
from ..operators.dedup import keep_latest
from ..operators.split import validity_split
from ..schemas import SILVER


def clean_and_transform(df: DataFrame) -> DataFrame:
    """C1-C20 + D1, in the reference's step order
    (transform_lambda/main.py:136-316).  Input: normalized bronze frame
    (sources.ingest.normalize_raw).  Output: typed silver frame."""
    # Each ``withColumns`` call is ONE Project node; a per-step
    # ``withColumn`` chain would stack ~30 fifty-column Projects and make
    # Catalyst analysis itself a bottleneck (analysis cost grows with
    # chain depth × width — measurable at 2k rows, worse per-microbatch).
    # C1 — parse timestamps first; D1's recency ordering needs it (:139-140)
    # C2 + D1 — id extraction then keep-latest (:143-150); deterministic
    # tiebreak on auction_url (pandas relies on implicit prior order)
    df = df.withColumns({
        "auction_date": S.to_timestamp_utc("auction_date"),
        "auction_id": S.extract_auction_id("auction_url"),
    })
    df = keep_latest(
        df, "auction_id", order_by="auction_date",
        tiebreakers=[F.col("auction_url").asc_nulls_last()],
    )
    canon = S.canon_status("auction_status")
    df = df.withColumns({
        "model": S.clean_first_line("model"),                      # C3
        "mileage": S.extract_mileage("mileage"),                   # C4
        "highest_bid_value": S.parse_money("highest_bid_value"),   # C5
        "bid_count": S.to_int_coerce("bid_count"),                 # C6
        "view_count": S.to_int_coerce_default0("view_count"),      # C7
        "watcher_count": S.to_int_coerce_default0("watcher_count"),
        "auction_status": canon,                                   # C8
        "reserve_met": S.reserve_met(canon),  # C9 — over the CANON value
        "seller": S.clean_first_line("seller"),                    # C10
        "bids": S.clean_bids("bids"),                              # C11
        "title_status_cleaned": S.title_status_cleaned("title_status"),  # C12
        "title_state": S.title_state("title_status"),              # C13
        "city": S.extract_city("location"),                        # C14
        "state": S.extract_state("location"),
        "transmission_type": S.transmission_type("transmission"),  # C15
        "gears": S.extract_gears("transmission"),                  # C16
        "drivetrain": S.canon_drivetrain("drivetrain"),            # C17
        "highlight_count": S.count_list("auction_highlights"),     # C19
        "equipment_count": S.count_list("auction_equipment"),
        "mod_count": S.count_list("modifications"),
        "flaw_count": S.count_list("known_flaws"),
        "service_count": S.count_list("services"),
        "included_items_count": S.count_list("included_items"),
        "video_count": S.count_list("auction_videos"),
        "manufacture_year": S.extract_manufacture_year("auction_url"),  # C20
    })
    # C18 — bid features read the *cleaned* array (:289), so they go in a
    # second projection over the C11 output column
    df = df.withColumns(S.bid_features(F.col("bids")))
    return enforce_silver_types(df)


def enforce_silver_types(df: DataFrame) -> DataFrame:
    """P6 + P7 — project to the 45 staging columns in insert order with
    enforced types (enforce_column_types transform_lambda/main.py:319-325;
    column list load_lambda/main.py:84-92).  try_cast keeps
    ``errors='coerce'`` semantics."""
    out = []
    for field in SILVER.fields:
        if field.name in df.columns:
            c = F.col(field.name)
            if isinstance(field.dataType, (T.StringType, T.TimestampType,
                                           T.BooleanType, T.ArrayType)):
                c = c.cast(field.dataType)
            else:
                c = c.try_cast(field.dataType)
        else:
            c = F.lit(None).cast(field.dataType)
        out.append(c.alias(field.name))
    return df.select(*out)


def transform_records(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The full entry-point-A plan shared by the batch and rescrape paths
    (the reference duplicates it across transform_lambda/main.py and
    rescrape/transform_load.py; the engine implements it once — SURVEY
    header note).

    Input: exploded raw records from ``read_raw_auctions``.
    Returns ``(silver, rescrape_urls)`` — two outputs off one scan (F1).
    """
    from ..sources.ingest import normalize_raw

    # Both outputs (silver write + rescrape write) hang off this frame;
    # persist so the raw read + variant explode runs ONCE, not per action
    # (SURVEY §4.1 caching row).  MEMORY_AND_DISK default: evictable, safe
    # for arbitrarily large batches.
    bronze = track(normalize_raw(records).persist())
    valid, rescrape = validity_split(bronze)  # F1 before cleaning (:436)
    return clean_and_transform(valid), rescrape
