"""M4 — surrogate key generation.

Reference: Postgres ``SERIAL`` ids referenced as ``sd.id``, ``vmd.id``, etc.
(update_dims.sql:80,108,128-130).

Spark-first: ``row_number`` over a deterministic ordering of the *new* rows,
offset by the existing max — NOT ``monotonically_increasing_id`` (partition-
dependent, non-reproducible; SURVEY §7 risk 8).  The window is global
(single partition) but only runs over the small new-keys slice of a
dimension, never the fact table, so the single-reducer stage is bounded by
dim cardinality, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_surrogate_key(
    new_rows: DataFrame,
    order_by: list[str],
    id_col: str = "id",
    start_at: int = 1,
) -> DataFrame:
    """Assign dense ids ``start_at, start_at+1, …`` in ``order_by`` order."""
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return new_rows.withColumn(
        id_col, (F.row_number().over(w) + F.lit(start_at - 1)).cast("long")
    )


def next_id_start(existing: DataFrame | None, id_col: str = "id") -> int:
    """max(id)+1 over the existing dimension (1 when empty/absent)."""
    if existing is None:
        return 1
    row = existing.agg(F.max(id_col).alias("m")).collect()[0]
    return int(row["m"] or 0) + 1
