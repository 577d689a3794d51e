"""Connected components over near-duplicate pair edges.

Near-dup dedup needs clusters, not pairs: if A~B and B~C are above the
threshold but A~C is not, the three documents are still one duplicate
cluster and exactly one representative should survive.  Pairs → clusters is
connected components.

Implementation is iterative min-label propagation: every vertex starts
labeled with its own id; each round every vertex takes the min of its label
and its neighbors' labels; converged when a round changes nothing.  Rounds
are plain join+groupBy (2 shuffles each), so AQE sizes the exchanges, and
the labels frame is ``localCheckpoint``-ed per round to cut the growing
lineage (standard practice for iterative DataFrame algorithms).  Round
count is bounded by the cluster diameter — near-dup clusters are shallow
(dups of dups of one source), so convergence is fast; a ``max_iter``
safety bound guards pathological chains.  For truly adversarial graphs swap
in the large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") — the propagation loop below is the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """``(id, component)`` for every vertex in ``pairs``; component = min
    vertex id reachable through the pair edges."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, on="id", how="left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
                (
                    F.coalesce("nbr_component", "component") < F.col("component")
                ).alias("__changed"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def _sym(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    return (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """``(id, component)`` via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the adversarial-graph escape hatch `connected_components`'s
    docstring promises.

    Min-label propagation needs O(diameter) rounds: fine for shallow
    near-dup clusters, hopeless for long chains.  Large-star hangs every
    vertex's bigger neighbors onto the minimum of its neighborhood;
    small-star re-parents the smaller neighbors — each round roughly
    halves tree heights, so convergence is O(log² n) rounds worst-case
    (O(log n) observed) regardless of diameter.  Every round is two
    groupBy-min + join rounds over the edge set — the same shuffle shapes
    AQE already sizes — and the edge frame monotonically contracts toward
    a star per component.

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge (unlike
    `connected_components`, which silently returns its best labels —
    here non-convergence means wrong labels, not loose ones).
    """
    e = (
        _sym(pairs, id_a, id_b)
        .select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # large-star over the SYMMETRIC closure: for each u,
        # m = min(N(u) ∪ {u}); emit (v, m) ∀ v ∈ N(u), v > u
        esym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            esym.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least("a", "mb").alias("m"))
        )
        # symmetry makes this complete: u itself is re-parented inside the
        # reduce of its smallest neighbor (where u is the bigger side)
        large = (
            esym.join(mins, on="a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient (big, small); m = min closed nbhd; re-parent
        oriented = (
            large.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        smins = oriented.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            oriented.join(smins, on="a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(smins.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
        converged = (
            small.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(small).limit(1).count() == 0
        )
        e = small
        if converged:
            # star fixpoint: every edge is (member, root)
            return (
                e.select(F.col("a").alias("id"), F.col("b").alias("component"))
                .union(
                    e.select(F.col("b").alias("id"), F.col("b").alias("component"))
                )
                .groupBy("id")
                .agg(F.min("component").alias("component"))
            )
    raise RuntimeError(
        f"large-star/small-star did not converge in {max_iter} rounds"
    )


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one representative (min id) per duplicate cluster: rows absent
    from any pair survive untouched; within a cluster only the min-id row
    survives.  A left-anti join against the non-representative members —
    no row of ``df`` is ever widened."""
    cc = connected_components(pairs, id_a, id_b)
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
