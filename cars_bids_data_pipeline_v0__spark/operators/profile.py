"""Table profiling — per-column statistics in ONE aggregation pass.

Data-quality triage over a 100 TB table cannot afford a job per column:
``profile`` builds every column's null count, distinct count, and min/max
as expressions inside a single ``agg`` (one scan, one reduce), then
unpivots driver-side (the result is #columns rows — trivially small).

Exact distinct counts over multiple columns trigger Catalyst's Expand
rewrite (one row replica per distinct-aggregated column — row amplification
×(1+#cols), still one scan); pass ``approx_distinct=True`` to swap in HLL
sketches (±2–5%), which drops the Expand entirely and keeps the whole
profile a single map-side-mergeable Aggregate — the right default at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """``(column, n_nulls, n_distinct, min_value, max_value)`` per column —
    min/max rendered as strings so heterogeneous column types fit one
    result schema."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}")
        )
        aggs.append(
            (
                F.approx_count_distinct(c)
                if approx_distinct
                else F.count_distinct(F.col(c))
            ).alias(f"__d_{c}")
        )
        # min/max on the NATIVE type (string-cast inputs would order "10" <
        # "9"), rendered to string only after aggregation
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__hi_{c}"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"__n_{c}"),
            F.col(f"__d_{c}"),
            F.col(f"__lo_{c}"),
            F.col(f"__hi_{c}"),
        ]
    return wide.select(
        F.stack(
            F.lit(len(cols)),
            *stack_args,
        ).alias("column", "n_nulls", "n_distinct", "min_value", "max_value")
    )
