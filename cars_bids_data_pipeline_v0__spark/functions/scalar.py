"""Scalar / array column expressions (SURVEY §2.4, C1-C23).

The reference implements each of these as a row-at-a-time pandas
``.apply``/``.str`` closure; here each is a pure Column expression so Catalyst
sees it (pushdown, folding, codegen).  Docstrings cite the reference
implementation whose semantics — including null/coerce sharp edges — are
reproduced exactly.

All expressions are ANSI-safe: ``try_cast``/``try_element_at``/``try_to_timestamp``
instead of raising casts, so behavior is identical whether or not the session
runs with ``spark.sql.ansi.enabled``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def try_cast(c: Column | str, dtype: str) -> Column:
    """`pd.to_numeric(errors='coerce')`-style cast: null on failure."""
    return _col(c).try_cast(dtype)


# ---------------------------------------------------------------------------
# C1 / C22 / C23 — timestamps
# ---------------------------------------------------------------------------


def to_timestamp_utc(c: Column | str) -> Column:
    """C1 — parse string datetime to UTC timestamp.

    Reference: ``pd.to_datetime(df['auction_date'], utc=True)``
    (transform_lambda/main.py:139).  Session timezone is pinned UTC by
    `session.get_session`; unparseable strings yield null (coerce-style).
    """
    return F.try_to_timestamp(_col(c))


def epoch_millis_encode(c: Column | str) -> Column:
    """Timestamp → epoch-milliseconds, the reference's NDJSON wire format
    (``to_json`` serialization, transform_lambda/main.py:368).  Accepts
    TIMESTAMP_NTZ too (parquet default) — interpreted in the session TZ
    (pinned UTC)."""
    return F.unix_millis(_col(c).cast("timestamp"))


def epoch_millis_decode(c: Column | str) -> Column:
    """C22 — epoch-millis → timestamp; reference decodes in SQL via
    ``TO_TIMESTAMP(s.auction_date / 1000)`` (update_dims.sql:188)."""
    return F.timestamp_millis(_col(c).cast("long"))


def auction_saving_date(c: Column | str) -> Column:
    """C23 — timestamp → date partition key
    (``auction_date.dt.date``, transform_lambda/main.py:363)."""
    return F.to_date(_col(c))


# ---------------------------------------------------------------------------
# C2 / C20 — URL path parsing
# ---------------------------------------------------------------------------


def extract_auction_id(url: Column | str) -> Column:
    """C2 — 5th path segment: ``url.strip().split("/")[4]``
    (transform_lambda/main.py:143-146).

    The reference raises on short URLs; the engine yields null instead
    (``try_element_at``) while keeping the index-4 contract.
    """
    return F.try_element_at(F.split(F.trim(_col(url)), "/"), F.lit(5))


def extract_manufacture_year(url: Column | str) -> Column:
    """C20 — last URL path segment, token before first ``-``, as int;
    any failure → null (transform_lambda/main.py:306-314)."""
    last_seg = F.element_at(F.split(F.trim(_col(url)), "/"), -1)
    return F.split(last_seg, "-").getItem(0).try_cast("int")


# ---------------------------------------------------------------------------
# C3 / C10 — first-line cleanup
# ---------------------------------------------------------------------------


def clean_first_line(c: Column | str) -> Column:
    """C3/C10 — first line, trimmed: ``.str.split('\\n').str[0].str.strip()``
    (model transform_lambda/main.py:153; seller :189)."""
    return F.trim(F.split(_col(c), "\n").getItem(0))


# ---------------------------------------------------------------------------
# C4-C7 — numeric coercion
# ---------------------------------------------------------------------------


def extract_mileage(c: Column | str) -> Column:
    """C4 — first run of digits/commas, commas stripped, as long; null when
    absent or input null (transform_lambda/main.py:157-165).

    ``regexp_extract`` returns ``''`` on no-match, hence the ``nullif``.
    """
    digits = F.regexp_extract(_col(c), r"[\d,]+", 0)
    return F.nullif(F.regexp_replace(digits, ",", ""), F.lit("")).try_cast("long")


def parse_money(c: Column | str) -> Column:
    """C5 — strip ``$`` and ``,`` → double
    (``.str.replace('$','').str.replace(',','').astype(float)``,
    transform_lambda/main.py:169)."""
    return F.regexp_replace(_col(c), r"[$,]", "").try_cast("double")


def to_int_coerce(c: Column | str) -> Column:
    """C6 — ``pd.to_numeric(errors='coerce')`` (transform_lambda/main.py:172)."""
    return _col(c).try_cast("long")


def to_int_coerce_default0(c: Column | str) -> Column:
    """C7 — str-cast, strip commas, coerce, ``fillna(0)``
    (view_count/watcher_count, transform_lambda/main.py:175-180).
    Null input → 0 (pandas: ``str(None)`` coerces to NaN → filled)."""
    stripped = F.regexp_replace(_col(c).cast("string"), ",", "")
    return F.coalesce(stripped.try_cast("long"), F.lit(0).cast("long"))


# ---------------------------------------------------------------------------
# C8 / C9 — status canonicalization
# ---------------------------------------------------------------------------


def canon_status(c: Column | str) -> Column:
    """C8 — substring-replace ``'Sold to'→'Sold'`` then **full-value**
    replace ``'Reserve not met, bid to'→'Reserve not met'``
    (transform_lambda/main.py:183).

    The second replace is ``Series.replace`` (exact value match), not a
    substring replace — a value like ``'Reserve not met, bid to $5,000'``
    is intentionally left unchanged, matching the reference quirk.
    """
    substr_replaced = F.regexp_replace(_col(c), "Sold to", "Sold")
    return F.when(
        substr_replaced == F.lit("Reserve not met, bid to"), F.lit("Reserve not met")
    ).otherwise(substr_replaced)


def reserve_met(status: Column | str) -> Column:
    """C9 — ``lower(auction_status) == 'sold'``; null status → False
    (pandas ``.str.lower().eq('sold')`` maps NaN → False,
    transform_lambda/main.py:186, bool-enforced :324)."""
    return F.coalesce(F.lower(_col(status)) == F.lit("sold"), F.lit(False))


# ---------------------------------------------------------------------------
# C11 — all-or-nothing bid list cleaning
# ---------------------------------------------------------------------------


def clean_bids(c: Column | str) -> Column:
    """C11 — each ``"$12,345"`` → long; **any element failing (or a null
    input) empties the whole list** (the try/except wraps the full list
    comprehension, transform_lambda/main.py:192-198).

    The parsed array is LET-BOUND through a single-element ``transform``
    (the `word_shingles` discipline): referencing ``cleaned`` twice in
    one CASE makes CollapseProject inline it into BOTH branches, so the
    regex + try_cast ran 2× per element (visible as two ``transform``
    copies in q28's physical plan — round-13 optimization pass)."""
    col = _col(c)
    empty = F.array().cast(T.ArrayType(T.LongType()))
    bound = F.element_at(
        F.transform(
            F.array(
                F.transform(
                    col,
                    lambda x: F.regexp_replace(x, r"[$,]", "")
                    .try_cast("long"),
                )
            ),
            lambda cleaned: F.when(
                F.exists(cleaned, lambda x: x.isNull()), empty
            ).otherwise(cleaned),
        ),
        1,
    )
    return F.when(col.isNull(), empty).otherwise(bound)


# ---------------------------------------------------------------------------
# C12 / C13 — regex group extraction
# ---------------------------------------------------------------------------


def regex_group(c: Column | str, pattern: str, group: int = 1) -> Column:
    """``Series.str.extract`` equivalent: group match or null (pandas yields
    NaN on no-match; Spark's ``regexp_extract`` yields ``''``, hence nullif)."""
    return F.nullif(F.regexp_extract(_col(c), pattern, group), F.lit(""))


def title_status_cleaned(c: Column | str) -> Column:
    """C12 — ``.str.extract(r'^(.*?) \\(')`` (transform_lambda/main.py:202)."""
    return regex_group(c, r"^(.*?) \(", 1)


def title_state(c: Column | str) -> Column:
    """C13 — ``.str.extract(r'\\((.*?)\\)')`` (transform_lambda/main.py:203)."""
    return regex_group(c, r"\((.*?)\)", 1)


# ---------------------------------------------------------------------------
# C14 — location rsplit into (city, state)
# ---------------------------------------------------------------------------


def extract_city(c: Column | str) -> Column:
    """C14a — ``location.rsplit(',', 1)[0].strip()``; no comma → whole
    trimmed (extract_city_state, transform_lambda/main.py:207-221)."""
    col = _col(c)
    return F.when(
        col.contains(","), F.trim(F.regexp_extract(col, r"^(.*),[^,]*$", 1))
    ).otherwise(F.trim(col))


def extract_state(c: Column | str) -> Column:
    """C14b — right side of the last comma, trimmed, first space-token;
    no comma → null (transform_lambda/main.py:207-221)."""
    col = _col(c)
    right = F.trim(F.regexp_extract(col, r",([^,]*)$", 1))
    return F.when(col.contains(","), F.split(right, " ").getItem(0))


# ---------------------------------------------------------------------------
# C15 / C16 — transmission
# ---------------------------------------------------------------------------


def _null_or_empty(col: Column) -> Column:
    # reference guard: `if not trans_str or not isinstance(trans_str, str)`
    # — both None and '' are falsy (transform_lambda/main.py:226-227).
    return col.isNull() | (col == F.lit(""))


def transmission_type(c: Column | str) -> Column:
    """C15 — lowercase contains: manual→Manual elif auto→Automatic else
    Other; null/empty → null (clean_transmission,
    transform_lambda/main.py:225-242)."""
    col = _col(c)
    low = F.lower(col)
    return (
        F.when(_null_or_empty(col), F.lit(None).cast("string"))
        .when(low.contains("manual"), F.lit("Manual"))
        .when(low.contains("auto"), F.lit("Automatic"))
        .otherwise(F.lit("Other"))
    )


def extract_gears(c: Column | str) -> Column:
    """C16 — regex ``(\\d+)-speed`` on the lowercased string → int, else
    null; null/empty input → null (transform_lambda/main.py:236-237)."""
    col = _col(c)
    g = regex_group(F.lower(col), r"(\d+)-speed", 1).try_cast("int")
    return F.when(~_null_or_empty(col), g)


# ---------------------------------------------------------------------------
# C17 — drivetrain canonicalization (precedence-sensitive)
# ---------------------------------------------------------------------------


def canon_drivetrain(c: Column | str) -> Column:
    """C17 — precedence: 4wd&awd → ``4WD/AWD``; front → ``FWD``; rear →
    ``RWD``; awd|all-wheel → ``AWD``; 4wd|four-wheel → ``4WD``; else (and
    null/empty) → ``Other`` (clean_drivetrain,
    transform_lambda/main.py:245-264).  The exact branch order is load-
    bearing: e.g. "4WD front" → FWD, not 4WD."""
    col = _col(c)
    low = F.lower(col)
    return (
        F.when(_null_or_empty(col), F.lit("Other"))
        .when(low.contains("4wd") & low.contains("awd"), F.lit("4WD/AWD"))
        .when(low.contains("front"), F.lit("FWD"))
        .when(low.contains("rear"), F.lit("RWD"))
        .when(low.contains("awd") | low.contains("all-wheel"), F.lit("AWD"))
        .when(low.contains("4wd") | low.contains("four-wheel"), F.lit("4WD"))
        .otherwise(F.lit("Other"))
    )


# ---------------------------------------------------------------------------
# C18 — per-row array statistics over the cleaned bids
# ---------------------------------------------------------------------------


def bid_features(c: Column | str) -> dict[str, Column]:
    """C18 — max/min/mean/median/range over an ``array<long>``; all null
    when the array is null or has fewer than 2 elements
    (extract_bid_features, transform_lambda/main.py:267-290).

    Median matches NumPy exactly: even-length → mean of the two middle
    elements of the sorted array; odd → middle element (as double).
    """
    b = _col(c)
    n = F.size(b)
    guard = b.isNotNull() & (n >= 2)
    mx = F.array_max(b)
    mn = F.array_min(b)
    total = F.aggregate(b, F.lit(0).cast("long"), lambda acc, x: acc + x)
    mid = (n / 2).cast("int")  # 0-based upper-middle index
    # array_sort is LET-BOUND through a single-element ``transform`` (the
    # `word_shingles` discipline): the median CASE references the sorted
    # array up to 3× and CollapseProject inlines each reference, so the
    # full sort ran 3× per row (visible in q28's physical plan —
    # round-13 optimization pass).
    median = F.element_at(
        F.transform(
            F.array(F.array_sort(b)),
            lambda srt: F.when(
                n % 2 == 1, F.element_at(srt, mid + 1).cast("double")
            ).otherwise(
                (F.element_at(srt, mid) + F.element_at(srt, mid + 1))
                / F.lit(2.0)
            ),
        ),
        1,
    )
    return {
        "max_bid": F.when(guard, mx),
        "min_bid": F.when(guard, mn),
        "mean_bid": F.when(guard, total / n),
        "median_bid": F.when(guard, median),
        "bid_range": F.when(guard, mx - mn),
    }


# ---------------------------------------------------------------------------
# C19 — list length with null guard
# ---------------------------------------------------------------------------


def count_list(c: Column | str) -> Column:
    """C19 — ``len(x)`` if list else null (count_list,
    transform_lambda/main.py:293-302).  ``when``-guarded because legacy
    ``size(null)`` may return -1."""
    col = _col(c)
    return F.when(col.isNotNull(), F.size(col))


# ---------------------------------------------------------------------------
# C21 — dimension key normalization
# ---------------------------------------------------------------------------


def norm_key_lower(c: Column | str) -> Column:
    """C21 — ``TRIM(LOWER(x))`` (update_dims.sql:9,21,32,43,54)."""
    return F.trim(F.lower(_col(c)))


def norm_key_upper(c: Column | str) -> Column:
    """C21 — ``TRIM(UPPER(x))`` (update_dims.sql:65)."""
    return F.trim(F.upper(_col(c)))
