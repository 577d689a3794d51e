"""Table diff / reconciliation — the audit face of the merge operators.

The reference trusts its loads blindly (no post-load verification anywhere
in load_lambda).  A warehouse at scale needs the inverse operation: given
two snapshots of a table (yesterday/today, source/replica, pre/post
migration), report exactly what changed.

Spark-first: ONE full-outer join on the key, then pure projections —
``added`` (key only in new), ``removed`` (key only in old), ``changed``
(key in both, any compared column differing under null-safe comparison),
with the list of differing columns per row.  One shuffle per side, no
row-multiplying comparisons, no driver-side anything; at 100 TB both
sides hash-partition on the key once and the join streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level reconciliation of two table snapshots.

    Returns ``(*keys, change_type, changed_cols)`` where ``change_type``
    ∈ {'added', 'removed', 'changed'[, 'unchanged']} and ``changed_cols``
    is the sorted list of differing column names (empty unless
    'changed').  Comparison is null-safe (``<=>``): NULL→value and
    value→NULL count as changes, NULL→NULL does not.
    """
    cols = compare_cols or [c for c in old.columns if c not in keys]
    missing = [c for c in cols if c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols missing from new side: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(1).alias("__in_o"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(1).alias("__in_n"),
    )
    # Null-safe key equality: a NULL-keyed row present in both snapshots
    # must COMPARE, not split into a spurious removed+added pair.  (<=>
    # still hash-partitions like a plain equi-join — no plan downgrade.)
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, on=cond, how="full_outer").select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        *[F.col(f"__o_{c}") for c in cols],
        *[F.col(f"__n_{c}") for c in cols],
        "__in_o",
        "__in_n",
    )
    in_o = F.col("__in_o").isNotNull()
    in_n = F.col("__in_n").isNotNull()
    changed_cols = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in sorted(cols)
            ]
        )
    )
    change_type = (
        F.when(~in_o, F.lit("added"))
        .when(~in_n, F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        change_type.alias("change_type"),
        F.when(in_o & in_n, changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def diff_summary(diff: DataFrame) -> DataFrame:
    """``(change_type, n_rows)`` rollup of a :func:`table_diff` output."""
    return diff.groupBy("change_type").agg(F.count("*").alias("n_rows"))
