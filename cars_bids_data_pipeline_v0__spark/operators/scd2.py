"""Type-2 slowly-changing-dimension (SCD2) history from an event/update log.

The reference's warehouse keeps only current dimension rows
(``insert-if-absent`` / upsert — load_lambda/main.py:16-28,33-47); an
analytics engine at scale also needs the *history* form: for each key, the
sequence of distinct tracked values with ``[valid_from, valid_to)``
intervals and an ``is_current`` flag.  This builds that snapshot in one
pass:

1. window ``lag(tracked) OVER (PARTITION BY key ORDER BY order, tie)`` —
   flag rows where the tracked value actually changed (run starts);
2. drop non-changes (consecutive duplicates collapse);
3. ``lead(valid_from)`` over the same window → ``valid_to``.

Change detection is NULL-safe (``<=>``): a value→NULL transition opens a
NULL-valued interval and a NULL→value transition closes it, so nullable
tracked columns produce correct history.  The first row per key is kept
via an explicit ``row_number() == 1`` marker rather than ``_prev IS
NULL`` (which cannot distinguish "no previous row" from "previous value
was NULL").

Both windows and the final shape share ONE hash partitioning on ``key`` —
Catalyst reuses the exchange, so the whole history build is a single
shuffle regardless of history length.  No driver-side iteration, no
UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_snapshot(
    df: DataFrame,
    key: str,
    tracked: str,
    order_col: str,
    tie_col: str | None = None,
    keep_tie: bool = False,
) -> DataFrame:
    """Collapse an update log into SCD2 rows.

    Returns ``(key, tracked, valid_from, valid_to, is_current)`` where
    ``valid_to`` is NULL for the open (current) interval.  ``tie_col``
    makes the ordering total when ``order_col`` has duplicates —
    required for deterministic output (oracle rule: never window over a
    partial order).  With ``keep_tie=True`` the run-opening row's tie
    value is kept as an extra output column so incremental maintenance
    (``scd2_apply``) can replay history with its real tiebreakers.
    """
    order_cols = [order_col] + ([tie_col] if tie_col else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    changed = (
        df.withColumn("_prev", F.lag(tracked).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1) | ~F.col(tracked).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_rn")
    )
    # re-window over the collapsed runs (same partitioning: exchange reuse)
    w2 = Window.partitionBy(key).orderBy(*order_cols)
    return changed.select(
        key,
        tracked,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w2).alias("valid_to"),
        F.lead(order_col).over(w2).isNull().alias("is_current"),
        *([tie_col] if keep_tie and tie_col else []),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: str,
    order_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Merge a batch of updates into an existing SCD2 table.

    ``current`` is a prior ``scd2_snapshot`` output; ``updates`` is a new
    log batch ``(key, tracked, order_col[, tie_col])``.  Rebuilds history
    for touched keys only — work is proportional to the update batch plus
    the history of the keys it touches, never the full dimension (the
    untouched partition is passed through with zero shuffle beyond the
    semi-join routing).

    When ``tie_col`` is given and ``current`` carries it (i.e. it was
    built with ``keep_tie=True``), history rows replay with their real
    tie values and the output keeps the column — fully deterministic
    even when ``order_col`` has duplicates within a key.  If ``current``
    lacks the column, history tie values are unknown (replayed as NULL,
    which sorts first): ``order_col`` must then be unique per key for
    the rebuilt intervals to be deterministic.
    """
    keep_tie = tie_col is not None and tie_col in current.columns
    touched = updates.select(key).distinct()
    untouched = current.join(touched, key, "left_anti")
    touched_hist = (
        current.join(touched, key, "left_semi")
        .select(
            key, tracked, F.col("valid_from").alias(order_col),
            *(
                [F.col(tie_col)] if keep_tie
                else [F.lit(None).alias(tie_col)] if tie_col
                else []
            ),
        )
    )
    cols = [key, tracked, order_col] + ([tie_col] if tie_col else [])
    log = touched_hist.select(*cols).unionByName(
        updates.select(*cols), allowMissingColumns=False
    )
    rebuilt = scd2_snapshot(
        log, key, tracked, order_col, tie_col, keep_tie=keep_tie
    )
    return untouched.unionByName(rebuilt)
