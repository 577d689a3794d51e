"""M1-M3 — warehouse merge operators (insert-if-absent, upsert).

Reference: Postgres ``INSERT … ON CONFLICT DO NOTHING`` for 8 dims + the
fact (update_dims.sql:8-114, 185-223) and ``DO UPDATE SET`` for vehicle_dim
(update_dims.sql:122-177).

Spark-first: this container has no Delta, so merges are expressed as
DataFrame set algebra with the same idempotence guarantees under the
single-writer assumption the reference already makes
(transform_lambda/main.py:373-392):

* M1/M3 insert-if-absent  →  ``new ⟕anti existing``  then append.
* M2 upsert               →  keep-latest union (existing ∪ new, new wins).

At cluster scale both sides shuffle on the merge key once; dims are tiny so
Catalyst broadcasts the existing side of the anti-join automatically.  With
Delta/Iceberg available these become real ``MERGE INTO`` statements with
partition pruning; the operator signatures are sink-agnostic on purpose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def insert_if_absent(
    existing: DataFrame | None, new_rows: DataFrame, key: list[str]
) -> DataFrame:
    """M1/M3 — rows of ``new_rows`` whose key is not in ``existing``.

    Equivalent of ``ON CONFLICT (key) DO NOTHING``: returns only the rows to
    append.  ``new_rows`` is deduped on the key first (a batch can carry the
    same key twice; Postgres would reject the second insert in-statement).
    """
    fresh = new_rows.dropDuplicates(key)
    if existing is None:
        return fresh
    return fresh.join(existing.select(*key).distinct(), on=key, how="left_anti")


def upsert_overwrite(
    existing: DataFrame | None,
    new_rows: DataFrame,
    key: list[str],
    prefer_new: bool = True,
) -> DataFrame:
    """M2 — full-table upsert: ``ON CONFLICT (key) DO UPDATE SET *``.

    Returns the merged table: unmatched existing rows + all new rows (new
    payload wins on key collision).  Column sets must match; extra/missing
    columns are aligned by name (union-by-name with nulls).
    """
    new_rows = new_rows.dropDuplicates(key)
    if existing is None:
        return new_rows
    new_marked = new_rows.withColumn("__is_new", F.lit(1 if prefer_new else 0))
    old_marked = existing.withColumn("__is_new", F.lit(0 if prefer_new else 1))
    unioned = old_marked.unionByName(new_marked, allowMissingColumns=True)
    from .dedup import keep_latest

    return keep_latest(unioned, key, order_by=F.col("__is_new")).drop("__is_new")
