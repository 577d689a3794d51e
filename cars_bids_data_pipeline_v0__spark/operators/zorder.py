"""Z-order (Morton-curve) clustering for multi-column data skipping.

Partitioning prunes on ONE hierarchy (the partition column).  Sorting the
files prunes on ONE more column.  Z-ordering interleaves the bits of
several columns into a single sort key, so every file ends up with a
NARROW min/max range on EVERY z-column — parquet row-group stats then
skip most of the table for a predicate on any of them.  This is Delta's
``OPTIMIZE ZORDER BY`` re-expressed as plain DataFrame ops:

1. rank-normalize each column to a ``bits``-wide integer (min/max linear
   scaling for numerics; at petabyte scale swap in approx-quantile ranks
   for skew resistance — the interleave below is unchanged);
2. interleave the bits (Morton code) — a pure shift/mask expression
   chain, whole-stage codegen, no UDF;
3. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value so
   each output file covers one compact z-range.

Everything is one extra shuffle at write time; reads need no changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Linear min/max scaling into [0, 2^bits).  Constant inputs scale
    to 0 (range collapse is fine: the column then contributes nothing)."""
    span = cmax - cmin
    if span <= 0:
        return F.lit(0).cast("long")
    return F.least(
        F.lit((1 << bits) - 1),
        F.floor(
            (col.cast("double") - F.lit(cmin))
            / F.lit(span)
            * ((1 << bits) - 1)
        ),
    ).cast("long")


def morton_interleave(scaled: list[Column], bits: int) -> Column:
    """Bit-interleave n already-scaled integer columns into one z-value.

    Pure shift/mask expression tree (n·bits terms) — stays inside
    whole-stage codegen."""
    n = len(scaled)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12
) -> tuple[DataFrame, str]:
    """Attach a Morton key over ``cols`` (numeric/timestamp) under a
    collision-proof generated column name (a user table may own
    ``__z``; review finding).

    One small stats job computes min/max per column (the only action);
    the key itself is a pure expression.  An all-NULL or empty column
    yields ``None`` stats and contributes 0 to the interleave — the
    same degenerate handling as a constant column."""
    import uuid as _uuid

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).collect()[0]

    def safe_scaled(c):
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None:
            return F.lit(0).cast("long")
        return _scaled(F.col(c), lo, hi, bits)

    scaled = [safe_scaled(c) for c in cols]
    z = f"__z_{_uuid.uuid4().hex[:8]}"
    return df.withColumn(z, morton_interleave(scaled, bits)), z


def zorder_cluster(
    df: DataFrame, cols: list[str], num_files: int, bits: int = 12
) -> DataFrame:
    """The shared clustering chain: Morton key → range repartition into
    ``num_files`` → sort within partitions → drop the key.  Both
    `zorder_write` and the txlog's OPTIMIZE ZORDER path call this, so a
    future clustering change (e.g. skew-resistant quantile ranks) lands
    in one place."""
    keyed, z = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(num_files, F.col(z))
        .sortWithinPartitions(z)
        .drop(z)
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` z-ordered by ``cols`` into ``num_files`` range-
    partitioned files: each file covers one compact z-range, so its
    parquet footer carries tight min/max for EVERY z-column."""
    zorder_cluster(df, cols, num_files, bits).write.mode(
        "overwrite"
    ).parquet(path)
