"""Document chunking — pretraining/RAG shard preparation.

The reference never splits documents; a training-data pipeline must:
context windows are fixed-size, so every document becomes overlapping
token-window chunks before tokenization/packing.

Spark-first: tokenize once (`split`), then ``sequence`` generates the
chunk starts and ``posexplode`` fans out to one row per chunk — all
native generators, no UDF, no shuffle (a narrow map; row amplification
is ``ceil(n_tokens / stride)``, the physics of the operation).  The
trailing chunk may be shorter than ``chunk_size`` (kept — losing
document tails would bias the corpus), but chunk starts stop at
``n_tokens - overlap``: a start past that point would emit a pure
suffix of the previous chunk (every token already covered), duplicating
text into the corpus.  A document shorter than one stride yields exactly
one chunk; empty / whitespace-only documents yield none.
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
    # split('\s+') leaves an empty token before a leading separator (and
    # IS the whole result for an empty string) — filter them so token
    # counts are honest and empty docs vanish
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    exploded = (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
        )
        .filter(F.size("__toks") > 0)
        .withColumn(
            "__starts",
            F.sequence(
                F.lit(1),
                F.greatest(F.size("__toks") - overlap, F.lit(1)),
                F.lit(stride),
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
