"""Engine function registry: scalar / array expression library.

Every function here compiles to native Catalyst expressions (no Python UDFs)
so the whole transform stage stays inside WholeStageCodegen — SURVEY §2.11
policy.
"""

from .scalar import (
    auction_saving_date,
    bid_features,
    canon_drivetrain,
    canon_status,
    clean_bids,
    clean_first_line,
    count_list,
    epoch_millis_decode,
    epoch_millis_encode,
    extract_auction_id,
    extract_city,
    extract_gears,
    extract_manufacture_year,
    extract_mileage,
    extract_state,
    norm_key_lower,
    norm_key_upper,
    parse_money,
    regex_group,
    reserve_met,
    title_state,
    title_status_cleaned,
    to_int_coerce,
    to_int_coerce_default0,
    to_timestamp_utc,
    transmission_type,
)

__all__ = [
    "auction_saving_date",
    "bid_features",
    "canon_drivetrain",
    "canon_status",
    "clean_bids",
    "clean_first_line",
    "count_list",
    "epoch_millis_decode",
    "epoch_millis_encode",
    "extract_auction_id",
    "extract_city",
    "extract_gears",
    "extract_manufacture_year",
    "extract_mileage",
    "extract_state",
    "norm_key_lower",
    "norm_key_upper",
    "parse_money",
    "regex_group",
    "reserve_met",
    "title_state",
    "title_status_cleaned",
    "to_int_coerce",
    "to_int_coerce_default0",
    "to_timestamp_utc",
    "transmission_type",
]
