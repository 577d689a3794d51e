"""WebDataset-style tar shards: the multimodal training-data wire format.

Large multimodal corpora ship as numbered ``.tar`` shards whose members
are ``<key>.<ext>`` files (``000123.jpg`` + ``000123.txt`` + …) — the
WebDataset convention most vision/audio training loaders consume.  The
engine's parquet shard writer (``sinks.write_training_shards``) covers
the tabular side; this module covers the tar side with NOTHING but the
stdlib ``tarfile``:

* :func:`read_tar_shards` — ``binaryFile`` scan over the shards, then an
  Arrow-batched ``mapInPandas`` unpacks members into rows
  ``(shard, key, ext, payload, n_bytes)``.  One task per shard file (the
  natural parallelism unit: shards are sized for exactly this), no
  driver-side I/O, no Python-row hot path outside the codec boundary —
  the same posture as the PNG/audio decoders (operators/multimodal.py).
* :func:`write_tar_shards` — repartition rows by shard id so each shard
  lands wholly in one task, write one tar per shard (members sorted by
  key — byte-deterministic output), and return a manifest DataFrame.

Reference parity: none (the reference never touches binary media); this
completes the multimodal plumbing: synth → decode → feature-extract →
dedup already exist, and shards are how such corpora enter and leave.
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

READ_SCHEMA = (
    "shard string, key string, ext string, payload binary, n_bytes long"
)
MANIFEST_SCHEMA = "shard string, path string, n_members long, n_bytes long"


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Rows ``(shard, key, ext, payload, n_bytes)`` from every member of
    every tar under ``path`` (member ``a/b/000123.txt`` → key
    ``a/b/000123``, ext ``txt``)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for _, row in b.iterrows():
                shard = os.path.basename(row["path"])
                out = {"shard": [], "key": [], "ext": [], "payload": [],
                       "n_bytes": []}
                with tarfile.open(
                    fileobj=io.BytesIO(row["content"]), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        data = tf.extractfile(m).read()
                        stem, dot, ext = m.name.rpartition(".")
                        out["shard"].append(shard)
                        out["key"].append(stem if dot else m.name)
                        out["ext"].append(ext if dot else "")
                        out["payload"].append(data)
                        out["n_bytes"].append(len(data))
                yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(
        unpack, schema=READ_SCHEMA
    )


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    key_col: str = "key",
    ext_col: str = "ext",
    payload_col: str = "payload",
) -> DataFrame:
    """Write one ``<shard>.tar`` per distinct ``shard_col`` value under
    ``out_dir``; returns the manifest ``(shard, path, n_members,
    n_bytes)``.

    Rows repartition by the shard id, so every shard is assembled by
    exactly one task (shards parallelize across tasks); members are
    written in sorted-key order with zeroed mtimes, so a shard's bytes
    are a pure function of its rows.  ``out_dir`` must be a filesystem
    visible to the executors (local/NFS here; object stores upload the
    local tar in the same task at cluster scale)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {}
        for b in batches:
            for _, r in b.iterrows():
                rows.setdefault(str(r[shard_col]), []).append(
                    (str(r[key_col]), str(r[ext_col]), bytes(r[payload_col]))
                )
        out = {"shard": [], "path": [], "n_members": [], "n_bytes": []}
        for shard, members in rows.items():
            members.sort(key=lambda t: (t[0], t[1]))
            path = os.path.join(out_dir, f"{shard}.tar")
            # unique-per-attempt temp name: a speculative duplicate or a
            # zombie task retrying the same shard must never interleave
            # writes into one temp file (same temp-then-rename discipline
            # as sources/txlog.py); os.replace keeps publish atomic and
            # last-writer-wins with byte-identical content either way
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            with tarfile.open(tmp, mode="w") as tf:
                for key, ext, payload in members:
                    name = f"{key}.{ext}" if ext else key
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    info.mtime = 0  # deterministic bytes
                    tf.addfile(info, io.BytesIO(payload))
            os.replace(tmp, path)
            out["shard"].append(shard)
            out["path"].append(path)
            out["n_members"].append(len(members))
            out["n_bytes"].append(os.path.getsize(path))
        yield pd.DataFrame(out)

    return (
        df.select(shard_col, key_col, ext_col, payload_col)
        .repartition(F.col(shard_col))
        .mapInPandas(pack, schema=MANIFEST_SCHEMA)
    )
