"""Binary-file source — the ingestion edge of the multimodal path.

The reference only ever ingests JSON text; a training-data pipeline also
ingests opaque media (images/audio/video).  Spark's built-in
``binaryFile`` format reads whole files as rows of ``(path,
modificationTime, length, content binary)`` — each file is one row, files
fan out across executors, and ``pathGlobFilter`` prunes by extension at
the listing (files that don't match are never opened).

Pair with ``operators.multimodal``: ``read_binary_files →
to_media_frame → decode/byte-histogram`` is the full
bytes-on-disk → features path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Whole-file binary read: one row per file.

    ``glob`` (e.g. ``"*.png"``) filters at file listing — unmatched files
    are never read.  ``recursive`` descends into subdirectories.  NOTE:
    each file must fit in executor memory (whole-file rows); for huge
    media use a chunking manifest instead.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def to_media_frame(
    files: DataFrame, media_type: str = "application/octet-stream"
) -> DataFrame:
    """Normalize a ``binaryFile`` frame to the multimodal media schema
    (``operators.multimodal``): stable ``doc_id`` from the path hash,
    ``media`` bytes, typed ``media_meta``."""
    return files.select(
        F.xxhash64("path").alias("doc_id"),
        F.col("path"),
        F.col("content").alias("media"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.col("length").cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("media_meta"),
    )
