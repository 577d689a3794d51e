"""Incremental materialized-view maintenance — partial aggregates that
merge.

The reference recomputes its warehouse aggregates from scratch on every
load; at 100 TB a grouped aggregate over the full fact is a full-scan +
full-shuffle every batch.  The standard fix: store the view as MERGEABLE
PARTIALS (count / sum / min / max — every algebraic aggregate), fold each
delta batch into partials of its own (delta-sized work), and merge — the
historical data is never re-scanned.  Averages and other derived measures
are finalized from the partials at read time.

Generalizes q87's daily→weekly rollup into a reusable operator; pairs
with sketch.py's mergeable HLL partials for approx-distinct measures.

Shapes: ``matview_partials`` is one grouped aggregate over its input
(map-side combine applies — partial rows per group per partition merge
before the shuffle).  ``matview_merge`` shuffles only |groups| rows per
side.  ``matview_finalize`` is a projection.

Column contract: partial columns are ``n_rows`` and ``{sum,min,max,cnt}_
{col}``; ``matview_partials`` REJECTS grouping keys whose names collide
with those prefixes, so downstream merges can classify columns from the
schema alone.  ``cnt_{col}`` is the per-measure NON-NULL count — ``avg``
finalizes as ``sum/cnt``, not ``sum/n_rows`` (``F.sum`` skips NULLs, so
dividing by the all-rows count would be wrong on nullable measures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COUNT = "n_rows"
_MERGEABLE = ("sum", "min", "max", "cnt")
_RESERVED_PREFIXES = tuple(f"{fn}_" for fn in _MERGEABLE)


def matview_partials(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, ...]],
) -> DataFrame:
    """Grouped partials: ``n_rows`` plus ``{fn}_{col}`` for every
    requested mergeable function.  ``avg`` is accepted and recorded as
    its ``sum`` + non-null ``cnt`` partials (finalized later)."""
    for k in keys:
        if k == _COUNT or k.startswith(_RESERVED_PREFIXES):
            raise ValueError(
                f"grouping key {k!r} collides with the partial-column "
                f"naming contract ({_COUNT}, {'/'.join(_RESERVED_PREFIXES)}*)"
            )
    aggs = [F.count(F.lit(1)).alias(_COUNT)]
    for col, fns in measures.items():
        wanted = set(fns)
        if "avg" in wanted:
            wanted.discard("avg")
            wanted.update({"sum", "cnt"})
        unknown = wanted - set(_MERGEABLE)
        if unknown:
            raise ValueError(f"non-mergeable aggregate(s) {sorted(unknown)}")
        for fn in sorted(wanted):
            agg = F.count(col) if fn == "cnt" else getattr(F, fn)(col)
            aggs.append(agg.alias(f"{fn}_{col}"))
    return df.groupBy(*keys).agg(*aggs)


def matview_compact(partials: DataFrame) -> DataFrame:
    """Re-merge a frame holding MANY partial rows per group (e.g. one set
    per delta batch) into one row per group: counts and sums add,
    mins/maxes fold.  Associative and commutative — any number of delta
    batches, in any order, yield the same view.  Columns are classified
    by the naming contract ``matview_partials`` enforces."""
    partial_cols = [
        c
        for c in partials.columns
        if c == _COUNT or c.startswith(_RESERVED_PREFIXES)
    ]
    keys = [c for c in partials.columns if c not in partial_cols]
    aggs = []
    for c in partial_cols:
        fn = "sum" if c == _COUNT or c.startswith("cnt_") else c.split("_", 1)[0]
        aggs.append(getattr(F, fn)(c).alias(c))
    return partials.groupBy(*keys).agg(*aggs)


def matview_merge(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two partial tables with identical schemas."""
    if set(existing.columns) != set(delta.columns):
        raise ValueError(
            f"partial schemas differ: {existing.columns} vs {delta.columns}"
        )
    return matview_compact(existing.unionByName(delta))


def matview_finalize(
    partials: DataFrame, avg_of: list[str] | None = None
) -> DataFrame:
    """Append ``avg_{col} = sum_{col} / cnt_{col}`` for each requested
    measure — the read-time face of the view.  NULL when the group holds
    no non-null values (cnt = 0), matching ``F.avg``."""
    out = partials
    for col in avg_of or []:
        out = out.withColumn(
            f"avg_{col}",
            F.when(
                F.col(f"cnt_{col}") > 0,
                F.col(f"sum_{col}") / F.col(f"cnt_{col}"),
            ),
        )
    return out


def matview_apply_changes(
    view: DataFrame,
    changes: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, ...]],
    base: DataFrame | None = None,
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Fold a Change-Data-Feed batch (``txlog.tx_changes`` / the txlog
    stream source's ``readChangeFeed`` rows) into a partial-aggregate
    view — the missing piece between the CDF and `matview_merge`: deltas
    with DELETES, not just appends.

    Counts and sums are SUBTRACTABLE, so they fold signed: each change
    row contributes weight +1 (insert) / -1 (delete) and the delta batch
    becomes one grouped aggregate of ``w``, ``w*x`` — exactly as cheap
    as the insert-only path, delta-sized shuffle only.

    ``min``/``max`` are NOT subtractable (deleting the current minimum
    needs the runner-up).  Groups touched by any delete are therefore
    recomputed from ``base`` (the CURRENT table snapshot, e.g.
    ``tx_read``) — but only those groups, via a semi-join-scoped scan,
    so the recompute cost is proportional to the deleted groups, not the
    table.  Requesting min/max without ``base`` raises; insert-only
    change batches never need it.

    Groups whose ``n_rows`` falls to 0 are dropped from the view (the
    grouped-aggregate semantics: a group with no rows does not exist).
    """
    wanted_by_col = {}
    needs_minmax = False
    for col, fns in measures.items():
        w = set(fns)
        if "avg" in w:
            w.discard("avg")
            w.update({"sum", "cnt"})
        unknown = w - set(_MERGEABLE)
        if unknown:
            raise ValueError(f"non-mergeable aggregate(s) {sorted(unknown)}")
        wanted_by_col[col] = w
        needs_minmax |= bool(w & {"min", "max"})

    has_deletes = changes.filter(
        F.col(change_type_col) == "delete"
    ).limit(1).count() > 0
    if needs_minmax and has_deletes and base is None:
        raise ValueError(
            "min/max maintenance under deletes needs base= (the current "
            "snapshot) for touched-group recompute"
        )

    w = F.when(F.col(change_type_col) == "delete", F.lit(-1)).otherwise(
        F.lit(1)
    )
    aggs = [F.sum(w).cast("long").alias(_COUNT)]
    for col, fns in wanted_by_col.items():
        for fn in sorted(fns):
            if fn == "sum":
                aggs.append(
                    F.sum(
                        F.when(F.col(col).isNotNull(), w * F.col(col))
                    ).alias(f"sum_{col}")
                )
            elif fn == "cnt":
                aggs.append(
                    F.sum(
                        F.when(F.col(col).isNotNull(), w).otherwise(F.lit(0))
                    )
                    .cast("long")
                    .alias(f"cnt_{col}")
                )
            else:  # min / max: inserts can still tighten the fold; the
                # delete-touched groups get overwritten from base below
                aggs.append(
                    getattr(F, fn)(
                        F.when(F.col(change_type_col) != "delete", F.col(col))
                    ).alias(f"{fn}_{col}")
                )
    delta = changes.groupBy(*keys).agg(*aggs)
    merged = matview_merge(view, delta)
    # a group whose membership went to zero leaves the view entirely
    merged = merged.filter(F.col(_COUNT) > 0)

    if not (needs_minmax and has_deletes):
        return merged
    # overwrite min/max (ONLY) for groups any delete touched, from base
    touched = (
        changes.filter(F.col(change_type_col) == "delete")
        .select(*keys)
        .distinct()
    )
    minmax_measures = {
        col: tuple(sorted(fns & {"min", "max"}))
        for col, fns in wanted_by_col.items()
        if fns & {"min", "max"}
    }
    recomputed = matview_partials(
        base.join(touched, keys, "left_semi"), keys, minmax_measures
    )
    mm_cols = [
        f"{fn}_{col}"
        for col, fns in minmax_measures.items()
        for fn in fns
    ]
    patch = recomputed.select(
        *keys, *[F.col(c).alias(f"__new_{c}") for c in mm_cols]
    )
    out = merged.join(patch, keys, "left")
    for c in mm_cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(f"__new_{c}").isNotNull(), F.col(f"__new_{c}")
            ).otherwise(F.col(c)),
        )
    return out.drop(*[f"__new_{c}" for c in mm_cols])
