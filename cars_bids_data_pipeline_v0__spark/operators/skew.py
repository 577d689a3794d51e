"""Skew mitigation: salted two-phase aggregation and replicated salted joins.

The reference never meets skew (one pandas process, one file per run), but a
100 TB corpus does: a handful of hot keys (one dominant event_type, one
mega-seller) concentrate a shuffle partition onto one executor.  Two standard
remedies, both expressed as plain DataFrame transforms so Catalyst/AQE stay
in control of the physical plan:

* **salted two-phase aggregation** — groupBy(key, salt) computes partial
  aggregates across ``num_salts``-way fan-out, then a second tiny groupBy(key)
  folds the partials.  Exact for algebraic aggregates (count/sum/min/max and
  avg via sum+count).  Spark's partial aggregation already does this *within*
  a partition; explicit salting also splits a hot key *across reducers*.
* **replicated salted join** — the skewed fact side gets a deterministic
  salt in [0, num_salts); the dimension side is replicated num_salts× with
  every salt value; the join key becomes (key, salt).  A hot key's rows land
  on num_salts reducers instead of one.  Use when the dimension is too big to
  broadcast but small enough to replicate; otherwise prefer AQE's runtime
  skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  `session.get_session`).

Salts are derived with ``pmod(xxhash64(salt_from), num_salts)`` — never
random — so plans stay deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# metric -> (partial aggregate, final fold of the partials)
_ALGEBRAIC = {
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def deterministic_salt(salt_from: Column | str, num_salts: int) -> Column:
    col = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return F.pmod(F.xxhash64(col), F.lit(num_salts)).cast("int")


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    salt_from: Column | str,
    num_salts: int = 32,
) -> DataFrame:
    """Exact groupBy(keys) aggregation computed as salt-partitioned partials.

    ``metrics`` maps output column name -> (fn, input column) with fn in
    {count, sum, min, max, avg}.  avg decomposes into sum+count partials
    (never avg-of-avgs).  Result equals the direct groupBy bit-for-bit for
    integral inputs; double sums may differ in summation order, so round
    presentation columns as usual.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for out, (fn, col) in metrics.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__s_{out}"))
            partials.append(F.count(col).alias(f"__c_{out}"))
            finals.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        else:
            part, fold = _ALGEBRAIC[fn]
            partials.append(part(col).alias(f"__p_{out}"))
            finals.append(fold(F.col(f"__p_{out}")).alias(out))
    salted = df.withColumn("__salt", deterministic_salt(salt_from, num_salts))
    return (
        salted.groupBy(*keys, "__salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )


def replicate_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_from: Column | str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the skewed side is salted and the dimension side is
    replicated across every salt value.  Same rows as ``skewed.join(dim, on,
    how)`` for inner/left joins (each dim row matches exactly one salt per
    skewed row)."""
    s = skewed.withColumn("__salt", deterministic_salt(salt_from, num_salts))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return s.join(d, on=[*on, "__salt"], how=how).drop("__salt")
