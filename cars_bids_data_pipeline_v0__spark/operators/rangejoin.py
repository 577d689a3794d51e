"""Range join — point-in-interval joins without the theta-join explosion.

Catalyst plans ``l.val BETWEEN r.lo AND r.hi`` as BroadcastNestedLoopJoin
(every left row × every interval) — fatal when neither side broadcasts.
The scalable formulation buckets the value domain: left rows key by
``floor(val / width)``, each interval explodes to the buckets it covers,
and the join becomes an EQUI-join on bucket followed by the exact interval
filter.  Cost O(L + R·avg_span/width + matches): pick ``bucket_width``
near the typical interval span so each interval covers O(1) buckets.

Interval semantics are closed-open ``[lo, hi)`` — the histogram/banding
convention.  Rows-identical to the plain theta join (oracle q63; direct
differential in tests/test_rangejoin.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each left row to every right interval with
    ``lo <= left_val < hi`` (plus optional equi-keys) via bucket indexing."""
    keys = extra_keys or []
    w = float(bucket_width)
    l_b = left.withColumn(
        "__bucket", F.floor(F.col(left_val) / F.lit(w)).cast("long")
    )
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(w)).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge does not
                # reach into the next bucket
                F.floor(
                    (F.col(right_hi) - F.lit(1e-9)) / F.lit(w)
                ).cast("long"),
            )
        ),
    )
    joined = l_b.join(r_b, on=[*keys, "__bucket"], how="inner").filter(
        (F.col(left_val) >= F.col(right_lo))
        & (F.col(left_val) < F.col(right_hi))
    )
    return joined.drop("__bucket")
