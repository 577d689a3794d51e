"""Sequence packing — fill fixed token budgets with document chunks.

After :mod:`chunking` splits documents into token windows, training wants
fixed-size batches: concatenate chunks until a token budget is reached.
Exact first-fit packing is inherently sequential; the scalable compromise
(standard in pretraining pipelines) packs WITHIN parallel shards and lets
a pack overflow by at most one chunk (the trainer truncates or pads the
boundary).

Spark-first: shard by a deterministic hash of the document id (parallel,
engine-portable md5), order within the shard by (doc_id, chunk_idx) —
a total order, so output is stable across runs — then one window
cumulative sum assigns each chunk to the budget-bucket where its run
starts.  One shuffle (the shard/window exchange), no driver-side packing
loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import md5_bucket


def pack_chunks(
    chunks: DataFrame,
    budget: int = 256,
    num_shards: int = 8,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "chunk_tokens",
) -> DataFrame:
    """Assign ``(shard, pack_id)`` to every chunk row.

    A chunk joins the pack in which its cumulative token run starts, so
    every non-final pack's token count is within one chunk of the budget
    (short by at most the previous pack's overflow, over by at most one
    chunk — the trainer pads/truncates the boundary).  Membership is a
    pure function of the data — stable across runs and partitionings."""
    shard = F.pmod(md5_bucket(id_col), F.lit(num_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn("shard", shard)
        .withColumn(
            "pack_id",
            (
                F.coalesce(F.sum(tokens_col).over(w), F.lit(0)) / budget
            ).cast("long"),
        )
    )


def pack_manifest(packed: DataFrame, tokens_col: str = "chunk_tokens") -> DataFrame:
    """Per-pack rollup ``(shard, pack_id, n_chunks, n_tokens)`` — the
    shard manifest a training loader consumes."""
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(tokens_col).cast("long").alias("n_tokens"),
    )
