"""Data-quality expectations — declarative row validation with quarantine.

The reference's F1 is one hard-coded validity predicate whose failures exit
as a rescrape work-list (transform_lambda/main.py:110-132).  This operator
generalizes that shape: named boolean expectations evaluated in ONE pass,
failing rows quarantined WITH the list of expectations they broke (the
dead-letter pattern every production pipeline grows eventually).

All expectations evaluate inside a single projection — one scan, no
per-rule jobs — and the pass/fail split is two filters off the same parent
(persist the parent when triggering both outputs, as with F1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAILED_COL = "failed_expectations"


def check(
    df: DataFrame, expectations: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Evaluate named expectations; return ``(good, quarantined)``.

    A row passes when EVERY expectation is true (null counts as failure —
    same NA-means-invalid stance as F1).  Quarantined rows carry
    ``failed_expectations: array<string>`` naming each broken rule.
    """
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(expr, F.lit(False)), F.lit(name))
                for name, expr in expectations.items()
            ]
        )
    )
    tagged = df.withColumn(FAILED_COL, failed)
    good = tagged.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    quarantined = tagged.filter(F.size(FAILED_COL) > 0)
    return good, quarantined
