"""WebDataset-style tar shard source/sink (sources/tarshard.py)."""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.sources.tarshard import (
    read_tar_shards,
    write_tar_shards,
)


def _sample(spark, n=20, shards=3):
    import numpy as np

    from cars_bids_data_pipeline_v0__spark.operators.png import encode_png

    rows = []
    for i in range(n):
        # each sample = a paired .png + .txt member (the multimodal pair
        # convention); 2x2 RGB deterministic pixels through the REAL codec
        px = np.array(
            [((i * 37 + j) % 256) for j in range(12)], dtype=np.uint8
        ).reshape(2, 2, 3)
        rows.append(
            (f"shard-{i % shards:03d}", f"{i:06d}", "png", encode_png(px)),
        )
        rows.append(
            (f"shard-{i % shards:03d}", f"{i:06d}", "txt",
             f"caption {i}".encode()),
        )
    return spark.createDataFrame(
        rows, "shard string, key string, ext string, payload binary"
    )


def test_tar_shard_roundtrip_and_manifest(spark, tmp_path):
    df = _sample(spark)
    out = str(tmp_path / "shards")
    manifest = {r["shard"]: r for r in write_tar_shards(df, out).collect()}
    assert len(manifest) == 3
    # 20 samples over 3 shards -> 7/7/6 pairs -> 14/14/12 members
    assert sorted(r["n_members"] for r in manifest.values()) == [12, 14, 14]
    assert all(os.path.isfile(r["path"]) for r in manifest.values())

    back = read_tar_shards(spark, out + "/*.tar")
    want = {
        (r["shard"] + ".tar", r["key"], r["ext"]): bytes(r["payload"])
        for r in df.collect()
    }
    got = {
        (r["shard"], r["key"], r["ext"]): bytes(r["payload"])
        for r in back.collect()
    }
    assert got == want
    assert back.count() == 40


def test_tar_bytes_are_deterministic(spark, tmp_path):
    df = _sample(spark)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    # different row order into the writer → identical shard bytes
    write_tar_shards(df, a).collect()
    write_tar_shards(df.orderBy(F.desc("key"), "ext"), b).collect()
    for name in os.listdir(a):
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name


def test_decode_flows_from_tar_members(spark, tmp_path):
    # the unpacked payload column feeds the existing multimodal decoders
    from cars_bids_data_pipeline_v0__spark.operators.png import decode_png

    df = _sample(spark, n=6, shards=2)
    out = str(tmp_path / "shards")
    write_tar_shards(df, out).collect()
    pngs = read_tar_shards(spark, out + "/*.tar").filter(
        F.col("ext") == "png"
    )
    assert pngs.count() == 6
    one = pngs.orderBy("key").first()
    arr = decode_png(bytes(one["payload"]))
    assert arr.shape == (2, 2, 3)


def test_members_without_extension(spark, tmp_path):
    df = spark.createDataFrame(
        [("s", "README", "", b"hello")],
        "shard string, key string, ext string, payload binary",
    )
    out = str(tmp_path / "noext")
    write_tar_shards(df, out).collect()
    with tarfile.open(os.path.join(out, "s.tar")) as tf:
        assert [m.name for m in tf.getmembers()] == ["README"]
    r = read_tar_shards(spark, out + "/*.tar").collect()[0]
    assert (r["key"], r["ext"], bytes(r["payload"])) == ("README", "", b"hello")


def test_multimodal_capstone_tar_to_perceptual_dedup(spark, tmp_path):
    """The full multimodal chain on REAL bytes: synth PNGs → tar shards
    on disk → binaryFile scan + unpack → perceptual dHash dedup.  The
    planted duplicate images must pair up after the round-trip."""
    import numpy as np

    from cars_bids_data_pipeline_v0__spark.operators.multimodal import (
        image_near_dup_pairs,
    )
    from cars_bids_data_pipeline_v0__spark.operators.png import encode_png

    rng_rows = []
    for i in range(12):
        # strongly distinct base images (per-image frequency pattern)
        px = np.fromfunction(
            lambda y, x, c: (x * (i + 2) * 13 + y * (i + 3) * 7 + c * 11)
            % 256,
            (16, 16, 3),
        ).astype(np.uint8)
        rng_rows.append((f"shard-{i % 2}", f"{i:06d}", "png", encode_png(px)))
        if i % 4 == 0:  # plant an exact duplicate under a new key
            rng_rows.append(
                (f"shard-{(i + 1) % 2}", f"{i + 100:06d}", "png",
                 encode_png(px))
            )
    df = spark.createDataFrame(
        rng_rows, "shard string, key string, ext string, payload binary"
    )
    out = str(tmp_path / "imgshards")
    write_tar_shards(df, out).collect()

    imgs = read_tar_shards(spark, out + "/*.tar").select(
        F.col("key").cast("long").alias("doc_id"),
        F.col("payload").alias("media"),
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(imgs, max_hamming=2).collect()
    }
    planted = {(i, i + 100) for i in range(12) if i % 4 == 0}
    assert planted <= pairs
