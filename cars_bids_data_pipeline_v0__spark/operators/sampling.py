"""Deterministic sampling and dataset splits for training-data pipelines.

Random sampling is useless at 100 TB if it isn't reproducible: re-runs must
select the SAME rows (splits must never leak between train and eval across
pipeline versions).  Everything here derives from a hash of the row id —
no RNG state, no seed plumbing, stable under repartitioning and re-runs:

* ``hash_bucket`` — uniform bucket in [0, n) from ``xxhash64`` (8-byte,
  JVM-native: the scale path).
* ``md5_bucket`` — the same idea over two md5 hex chars (256 buckets);
  slower, but md5 is bit-identical across engines, so md5-based sampling
  and splits are DuckDB-oracle-checkable (q19/q45).
* ``deterministic_sample`` — keep rows whose bucket < frac·n; a fixed,
  re-runnable systematic sample (no sampleBy variance).
* ``train_val_test_split`` — label each row train/val/test by bucket
  range; disjoint and exhaustive by construction.

``df.sample``/``sampleBy`` remain the right tool for quick approximate
sampling; these operators are for pipeline lineage, where membership must
be a pure function of the row id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(c: Column | str, num_buckets: int) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def md5_bucket(c: Column | str) -> Column:
    """Bucket in [0, 256) from the first two md5 hex chars of the value's
    string form — engine-portable (md5 is md5 everywhere)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 2), 16, 10).cast(
        "int"
    )


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, portable: bool = True
) -> DataFrame:
    """Keep ≈``fraction`` of rows, membership a pure function of the id."""
    n = 256 if portable else 1 << 16
    bucket = (
        md5_bucket(id_col) if portable else hash_bucket(id_col, 1 << 16)
    )
    return df.filter(bucket < int(round(fraction * n)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    portable: bool = True,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ≈``fractions[stratum]`` of
    each stratum's rows, membership a pure function of the row id.

    The reproducible analogue of ``df.sampleBy`` — rebalancing a training
    mix (e.g. downsample 'en' to 30%, keep 'fr' at 100%) must select the
    same rows on every run and every partitioning.  One scan, no shuffle:
    the per-stratum threshold is a CASE expression on the stratum column
    compared against the row-id hash bucket.
    """
    n = 256 if portable else 1 << 16
    bucket = (
        md5_bucket(id_col) if portable else hash_bucket(id_col, 1 << 16)
    )
    thresh = F.lit(int(round(default_fraction * n)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * n)))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
    portable: bool = True,
) -> DataFrame:
    """Add ``split`` ∈ {train, val, test} by hash-bucket range — disjoint,
    exhaustive, stable across runs and repartitioning.

    Boundaries round CUMULATIVE fractions (``round(train·n)``,
    ``round((train+val)·n)``), not per-split widths — width-rounding
    accumulates error into the later splits (caught by the sf0.1 oracle
    sweep: bucket 230 of 256 flipped splits between engines; no sf0.01
    doc happened to hash there).
    """
    n = 256 if portable else 1 << 16
    bucket = (
        md5_bucket(id_col) if portable else hash_bucket(id_col, 1 << 16)
    )
    t_hi = int(round(train * n))
    v_hi = int(round((train + val) * n))
    return df.withColumn(
        split_col,
        F.when(bucket < t_hi, F.lit("train"))
        .when(bucket < v_hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def md5_unit(c: Column | str) -> Column:
    """Uniform double in [0, 1) from four md5 hex chars of the value's
    string form (65536 grains) — engine-portable like :func:`md5_bucket`
    but fine-grained enough for mixture rates."""
    col = F.col(c) if isinstance(c, str) else c
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        / F.lit(65536.0)
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic multi-corpus mixture: sample each source so the output
    proportions match ``weights``, keeping as many rows as possible.

    With source sizes ``n_s`` the binding source is the one with the
    smallest ``n_s / w_s``; every source keeps ``rate_s = w_s·C / n_s``
    of its rows (``C = min_s n_s/w_s``), so the binding source keeps 100%
    and the output mixture is ∝ ``weights``.  Membership is a pure
    function of the row id (md5 thresholding) — stable across runs,
    partitionings, and engines.  Sources absent from ``weights`` are
    dropped.  One count aggregation (bounded: one row per source) plus
    one filtered scan; no shuffle of the kept rows.
    """
    counts = {
        r[source_col]: r["__n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    present = {s: w for s, w in weights.items() if w > 0 and counts.get(s)}
    if not present:
        return df.filter(F.lit(False))
    c = min(counts[s] / w for s, w in present.items())
    thresh = F.lit(None).cast("double")
    for s in sorted(present):
        rate = (present[s] * c) / counts[s]
        thresh = F.when(F.col(source_col) == s, F.lit(rate)).otherwise(thresh)
    return df.filter(md5_unit(id_col) < thresh)


def systematic_weighted_sample(
    df: DataFrame,
    weight_col: str,
    target: int,
    id_col: str = "doc_id",
    num_shards: int = 1,
) -> DataFrame:
    """Deterministic weighted sampling without RNG or floating point.

    Systematic (grid) sampling over the integer cumulative-weight line:
    order rows deterministically by id, take every ``step =
    total_weight // target``-th weight unit — a row is selected iff a
    grid point lands inside its weight interval, i.e. ``floor(cum/step)
    > floor((cum - w)/step)``.  Selection probability is proportional to
    weight, heavy rows (w ≥ step) are always selected, and everything is
    integer arithmetic — bit-identical on every engine and run.

    Count contract: at most ``floor(total/step)`` rows are selected; the
    count lands at ≈``target`` only while ``total_weight ≫ target``
    (grid points then rarely share a row).  When ``total_weight ≤
    target`` the step clamps to 1 and EVERY positive-weight row is
    selected, and a row heavier than ``step`` absorbs several grid
    points into one selection — callers sizing downstream budgets must
    budget on the returned rows, not on ``target``.

    The cumulative sum is one window over the id order; at cluster scale
    partition the grid per hash shard (``num_shards``) so no global
    window exists — each shard samples ``target/num_shards`` rows from
    its own weight line (the same two-phase shape as
    ``operators/keys.py``).
    """
    from pyspark.sql import Window

    # the shard key stays a hash expression even at num_shards=1 (always
    # 0) — a literal would be constant-folded out of the window partition
    # spec, leaving an unpartitioned-window plan
    shard = F.pmod(md5_bucket(id_col), F.lit(num_shards))
    target = max(1, target // num_shards)
    base = df.withColumn("__shard", shard).withColumn(
        "__w", F.col(weight_col).cast("long")
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("__w").over(w)
    totals = base.groupBy("__shard").agg(F.sum("__w").alias("__total"))
    return (
        base.withColumn("__cum", cum)
        .join(F.broadcast(totals), "__shard")
        # `div` keeps everything in exact integer arithmetic — long `/`
        # would be double division (and DuckDB's bigint cast ROUNDS)
        .withColumn(
            "__step", F.greatest(F.expr(f"__total div {target}"), F.lit(1))
        )
        .filter(
            F.expr("(__cum div __step) > ((__cum - __w) div __step)")
        )
        .drop("__shard", "__w", "__cum", "__total", "__step")
    )
