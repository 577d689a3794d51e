"""Document chunking — pretraining/RAG shard preparation.

The reference never splits documents; a training-data pipeline must:
context windows are fixed-size, so every document becomes overlapping
token-window chunks before tokenization/packing.

Spark-first: tokenize once (`split`), then ``sequence`` generates the
chunk starts and ``posexplode`` fans out to one row per chunk — all
native generators, no UDF, no shuffle (a narrow map; row amplification
is ``ceil(n_tokens / stride)``, the physics of the operation).  The
trailing chunk may be shorter than ``chunk_size`` (kept — losing
document tails would bias the corpus); a document shorter than one
stride yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (document, chunk): ``(id_col, chunk_idx, chunk_start,
    chunk_tokens, chunk_text)``.  ``chunk_start`` is the 1-based token
    offset; consecutive chunks share ``overlap`` tokens."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    exploded = (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
        )
        .withColumn(
            "__starts",
            F.sequence(
                F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(stride)
            ),
        )
        .select(
            id_col,
            "__toks",
            F.posexplode("__starts").alias("chunk_idx", "chunk_start"),
        )
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_start"), chunk_size)
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_start",
        F.size(chunk).alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
