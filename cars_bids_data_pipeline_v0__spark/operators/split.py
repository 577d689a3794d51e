"""F1 — validity split: one scan, two outputs (valid rows + rescrape list).

Reference: regex ``sold|reserve not met|canceled|cancelled`` on the
lowercased ``auction_status``; NA → invalid; valid rows continue, invalid
rows' URLs exit as the rescrape work-queue
(extract_invalid_auctions, transform_lambda/main.py:110-132).

Spark-first: build the mask once; return two lazily-filtered frames off the
same parent.  Callers that trigger both outputs should ``persist()`` the
parent (see plans.silver) so the scan runs once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_STATUS_RE = "sold|reserve not met|canceled|cancelled"


def validity_mask(status: Column | str = "auction_status") -> Column:
    col = F.col(status) if isinstance(status, str) else status
    # pandas `.str.contains(..., na=False)`: null status → invalid
    return F.coalesce(F.lower(col).rlike(VALID_STATUS_RE), F.lit(False))


def validity_split(
    df: DataFrame,
    status_col: str = "auction_status",
    url_col: str = "auction_url",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(valid_rows, rescrape_urls)`` — the anti-side projected to
    the URL column, mirroring the reference's work-queue payload."""
    mask = validity_mask(status_col)
    valid = df.filter(mask)
    rescrape = df.filter(~mask).select(url_col)
    return valid, rescrape
