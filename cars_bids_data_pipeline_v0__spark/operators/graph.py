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
