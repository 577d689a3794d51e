"""D1 — keep-latest dedup, the reference pipeline's signature operator.

Reference (used 3×): sort by ``auction_date`` DESC then
``drop_duplicates('auction_id', keep='first')`` — keeps the *latest* record
per auction (transform_lambda/main.py:140+150, :385-386;
load_lambda/main.py:96-97).

Spark-first: a ``row_number`` window, **not** ``dropDuplicates`` (which is
nondeterministic about the surviving row).  At scale this is one shuffle on
the key; AQE coalesces the post-shuffle partitions.  pandas' ``keep='first'``
tiebreak depends on prior file order, which has no distributed analogue, so
callers pass explicit ``tiebreakers`` for a deterministic survivor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    key: str | list[str],
    order_by: str | Column = "auction_date",
    tiebreakers: list[Column] | None = None,
) -> DataFrame:
    """Keep exactly one row per ``key``: the one sorting first by
    ``order_by`` DESC (+ deterministic tiebreakers)."""
    keys = [key] if isinstance(key, str) else list(key)
    order_col = F.col(order_by) if isinstance(order_by, str) else order_by
    ordering = [order_col.desc_nulls_last(), *(tiebreakers or [])]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
