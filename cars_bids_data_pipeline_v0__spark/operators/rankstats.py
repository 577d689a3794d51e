"""Rank/CDF statistics without a global window — distributed prefix sums.

Kolmogorov–Smirnov and Mann–Whitney both reduce to "cumulative counts
over the sorted distinct values" — a prefix sum, which the naive SQL
formulation computes with an UNPARTITIONED ordered window (one task sees
every row: the plan shape this repo's registry-wide audit forbids).

:func:`prefix_sums_by_value` does it in two fully-parallel phases sharing
one range exchange — the same pattern as the surrogate-key assigner
(``operators/keys.py``): local cumulative sums within range partitions
(keyed window on the materialized partition id), plus per-partition
totals turned into broadcast start offsets via a triangular join over
the tiny partition-count frame.  Identical results to the single-reducer
window whenever the value order is total over distinct values (it is —
they're distinct); every stage parallel at any scale.

Reference parity: none (the reference computes no statistics at all);
this extends the drift/AB-test family (q106/q116/q149, operators/drift.py)
with the standard nonparametric two-sample tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track_persist

_PID = "__rs_pid"


def prefix_sums_by_value(
    counts: DataFrame, value_col: str, sum_cols: list[str]
) -> DataFrame:
    """Add ``cum_<c>`` = inclusive prefix sum of each ``sum_cols`` entry
    over rows sorted by ``value_col`` — no single-partition stage.

    ``counts`` must hold one row per distinct value (the caller's
    group-by guarantees it); output keeps all input columns.
    """
    # persist the range-partitioned frame with its materialized partition
    # ids: both downstream branches (local cumsums, per-partition totals)
    # must observe the SAME value→partition assignment, and relying on
    # Spark re-using the exchange for that is an optimizer artifact, not a
    # contract — with nondeterministic input the two branches could range-
    # sample differently and misalign the broadcast offsets silently.
    part = track_persist(
        counts.repartitionByRange(F.col(value_col).asc()).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.select(
        "*",
        *[F.sum(c).over(w_local).alias(f"__loc_{c}") for c in sum_cols],
    )
    totals = part.groupBy(_PID).agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in sum_cols]
    )
    lo = totals.select(
        F.col(_PID).alias("__lo_pid"),
        *[F.col(f"__tot_{c}").alias(f"__lo_{c}") for c in sum_cols],
    )
    offsets = (
        totals.join(lo, F.col("__lo_pid") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(
            *[
                F.coalesce(F.sum(f"__lo_{c}"), F.lit(0)).alias(f"__off_{c}")
                for c in sum_cols
            ]
        )
    )
    out = local.join(F.broadcast(offsets), _PID)
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"__loc_{c}") + F.col(f"__off_{c}")
        )
    return out.drop(
        _PID, *[f"__loc_{c}" for c in sum_cols],
        *[f"__off_{c}" for c in sum_cols],
    )


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, g1, g2
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: one row
    ``(n1, n2, ks_d)`` with D = sup over observed values of
    |F1(v) − F2(v)| (empirical CDFs evaluated at every distinct value,
    which is where the sup of step functions is attained)."""
    counts = (
        df.filter(F.col(group_col).isin(g1, g2))
        .groupBy(value_col)
        .agg(
            F.sum((F.col(group_col) == g1).cast("long")).alias("n1v"),
            F.sum((F.col(group_col) == g2).cast("long")).alias("n2v"),
        )
    )
    cum = prefix_sums_by_value(counts, value_col, ["n1v", "n2v"])
    # totals come from the CHEAP pre-prefix frame: aggregating `cum`
    # would re-run the whole two-phase prefix-sum subplan for two
    # numbers derivable before it
    tot = counts.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum("n2v").cast("long").alias("n2"),
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            "n1",
            "n2",
            F.abs(
                F.col("cum_n1v") / F.col("n1")
                - F.col("cum_n2v") / F.col("n2")
            ).alias("__d"),
        )
        .groupBy("n1", "n2")
        .agg(F.max("__d").alias("ks_d"))
    )


def mann_whitney_u(
    df: DataFrame, value_col: str, group_col: str, g1, g2
) -> DataFrame:
    """Mann–Whitney U (rank-sum) with tie-corrected normal approximation:
    one row ``(n1, n2, u1, z)``.

    Average ranks come from the distinct-value prefix sums: a value with
    ``t`` total occurrences whose predecessors total ``c`` spans ranks
    ``c+1 … c+t`` → average rank ``c + (t+1)/2``.  R1 = Σ n1(v)·avgrank;
    U1 = R1 − n1(n1+1)/2; σ carries the standard tie correction
    Σ(t³−t)/((n)(n−1)) — every term a plain aggregate of the same
    prefix-summed frame."""
    counts = (
        df.filter(F.col(group_col).isin(g1, g2))
        .groupBy(value_col)
        .agg(
            F.sum((F.col(group_col) == g1).cast("long")).alias("n1v"),
            F.count(F.lit(1)).alias("tv"),
        )
    )
    cum = prefix_sums_by_value(counts, value_col, ["tv"])
    avgrank = F.col("cum_tv") - F.col("tv") + (F.col("tv") + 1) / 2.0
    agg = cum.agg(
        F.sum("n1v").cast("long").alias("n1"),
        (F.sum("tv") - F.sum("n1v")).cast("long").alias("n2"),
        F.sum(F.col("n1v") * avgrank).alias("r1"),
        F.sum(F.col("tv") * F.col("tv") * F.col("tv") - F.col("tv")).alias(
            "tie_term"
        ),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    sigma = F.sqrt(
        (n1 * n2 / 12.0)
        * ((n + 1) - F.col("tie_term") / (n * (n - 1)))
    )
    return agg.select(
        "n1",
        "n2",
        u1.alias("u1"),
        ((u1 - mu) / sigma).alias("z"),
    )
