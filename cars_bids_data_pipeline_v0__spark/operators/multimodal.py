"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions.

The Spark-side architecture here is the real deliverable — schema contract,
Arrow batch shape, partition-size control — while the codec step is stubbed
(this container ships no image/audio libraries): `decode_image` raises
``NotImplementedError`` unless ``fake=True``, in which case a clearly-marked
deterministic fake decoder parses our own header format so the plumbing is
testable end-to-end.

Scale notes:
* binary payloads ride in the same parquet row groups as their metadata —
  co-partitioned by construction, no extra shuffle to join bytes to labels;
* ``mapInPandas`` streams Arrow record batches — set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (or repartition by target
  payload bytes) so a batch of decoded frames fits executor memory;
* feature extraction emits fixed-size vectors → downstream joins/ANN reuse
  the similarity operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried next to every binary payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)

_MAGIC = b"FAKEIMG1"

# ---------------------------------------------------------------------------
# pluggable codec registry, keyed by magic-byte prefix
# ---------------------------------------------------------------------------

# magic-byte prefix -> callable(bytes) -> ndarray-like of shape (H, W[, C]).
# The engine never hard-codes a format list: a deployment with PIL/opencv
# (or a GPU decoder) plugs its formats in at startup without touching
# engine code.  PNG is pre-registered with the pure-stdlib decoder, so a
# bare container still decodes real pixels.  Decoders must be PICKLABLE
# (top-level functions, not lambdas/closures over sessions): the registry
# is snapshotted into the ``mapInPandas`` closure at plan-construction
# time and shipped to executors with it.
_IMAGE_CODECS: dict[bytes, object] = {}


def register_image_codec(magic: bytes, decode) -> None:
    """Register ``decode(payload_bytes) -> array (H, W[, C])`` for payloads
    starting with ``magic``.  Longest matching prefix wins at decode time."""
    if not isinstance(magic, bytes) or not magic:
        raise ValueError("magic must be non-empty bytes")
    _IMAGE_CODECS[magic] = decode


def unregister_image_codec(magic: bytes) -> None:
    _IMAGE_CODECS.pop(magic, None)


def registered_image_codecs() -> dict[bytes, object]:
    """Snapshot of the current registry (copy — mutations don't leak in)."""
    return dict(_IMAGE_CODECS)


def _register_builtin_codecs() -> None:
    from .png import PNG_SIGNATURE, decode_png

    _IMAGE_CODECS.setdefault(PNG_SIGNATURE, decode_png)


_register_builtin_codecs()


def synthesize_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Manufacture a deterministic binary 'image' per row: an 8-byte magic,
    a packed (width, height) header derived from the id, then the utf-8
    text as payload.  Stands in for reading real bytes from
    ``spark.read.format('binaryFile')`` or a parquet binary column."""
    k = F.col(id_col)
    width = (k % 64 + 16).cast("int")
    height = (k % 48 + 16).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        _int_be(width), _int_be(height),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    data = F.concat(header, payload)
    return df.select(
        k.alias(id_col),
        data.alias("media"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.length(data).cast("long").alias("n_bytes"),
            width.alias("width"),
            height.alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("media_meta"),
    )


def _int_be(c: F.Column) -> F.Column:
    """4-byte big-endian encoding of a non-negative int column (expression-
    level; keeps synthesis JVM-side): unhex of the zero-padded hex form."""
    return F.unhex(F.lpad(F.hex(c), 8, "0"))


def _dispatch_decode(b: bytes, codecs: dict, by_len: list, Image):
    """Registry-FIRST payload dispatch (round-6 ADVICE): a registered
    codec whose magic prefix matches owns the format unconditionally —
    PIL is only the fallback for unmatched prefixes, and a PIL failure
    becomes the loud codec gate rather than a raw PIL traceback.
    Module-level so the ordering contract is unit-testable without a
    PIL-equipped worker."""
    magic = next((m for m in by_len if b.startswith(m)), None)
    if magic is not None:
        return codecs[magic](b)
    if Image is not None:
        import io

        import numpy as np

        try:
            return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        except Exception as exc:
            raise NotImplementedError(
                "PIL could not decode payload with prefix "
                f"{b[:8]!r} ({exc!r}) and no registered codec matches; "
                f"registered magics: {sorted(by_len)} — "
                "register_image_codec() a decoder, or pass fake=True "
                "for the stub"
            ) from exc
    raise NotImplementedError(
        "no registered codec matches payload prefix "
        f"{b[:8]!r}; registered magics: "
        f"{sorted(by_len)} — register_image_codec() a "
        "decoder (or install PIL), or pass fake=True "
        "for the stub"
    )


def decode_image(df: DataFrame, media_col: str = "media",
                 id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Decode binary images to (width, height, n_pixels, mean_byte) rows via
    ``mapInPandas`` (Arrow-batched — the correct shape for a real codec).

    ``fake=False`` (the real path) decodes per payload, on the executors:

    * the CODEC REGISTRY dispatches FIRST, on magic-byte prefix (longest
      match wins) — PNG is pre-registered with the pure-stdlib codec in
      `operators.png` (zlib scanline inflate + unfilter), and deployments
      `register_image_codec()` their own formats without touching this
      function.  Registry-before-PIL is deliberate: a custom/GPU decoder
      registered for a format must stay in charge of it even on a
      PIL-equipped cluster (round-6 ADVICE);
    * unmatched prefixes fall back to Pillow when importable (a real
      cluster's default for the long tail of formats);
    * no matching codec and no PIL (or PIL fails) →
      ``NotImplementedError`` naming the registered magics — the
      documented codec gate, pluggable.

    ``fake=True`` keeps the deterministic stub that parses the
    `synthesize_media` header — STUB, clearly marked, for plumbing tests
    that don't care about pixel content.
    """
    sel = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))
    # snapshot NOW: the registry state at plan construction rides to the
    # executors inside this closure (registrations after this call don't
    # retroactively change an already-built plan — same discipline as a
    # broadcast codebook)
    codecs = registered_image_codecs()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # optional; absent in this container
        except ImportError:
            Image = None

        by_len = sorted(codecs, key=len, reverse=True)  # longest match wins

        def real_decode(b: bytes):
            arr = _dispatch_decode(b, codecs, by_len, Image)
            h, w = arr.shape[0], arr.shape[1]
            return w, h, w * h, round(float(arr.mean()), 6)

        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                if fake:
                    if not b.startswith(_MAGIC):
                        out.append((doc_id, None, None, None, None))
                        continue
                    w, h = struct.unpack(">ii", b[8:16])
                    payload = b[16:]
                    mean = (sum(payload) / len(payload)) if payload else 0.0
                    out.append((doc_id, w, h, w * h, round(mean, 6)))
                else:
                    out.append((doc_id, *real_decode(b)))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "n_pixels", "mean_byte"]
            )

    return sel.mapInPandas(decode_batches, schema=DECODED_IMAGE_SCHEMA)


def byte_histogram_features(df: DataFrame, media_col: str = "media",
                            id_col: str = "doc_id", buckets: int = 16) -> DataFrame:
    """Real (non-stub) feature extraction: a ``buckets``-bin byte histogram
    per payload as ``array<double>`` — Arrow-batched Pandas, no external
    libs.  Output feeds the ANN/similarity operators directly."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    sel = df.select(F.col(id_col).alias("doc_id"), F.col(media_col).alias("media"))

    def hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, feats = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr >> (8 - buckets.bit_length() + 1),
                                   minlength=buckets)[:buckets]
                total = hist.sum() or 1
                ids.append(doc_id)
                feats.append((hist / total).round(6).tolist())
            yield pd.DataFrame({"doc_id": ids, "features": feats})

    return sel.mapInPandas(hist_batches, schema=schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30,
                      id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index,
    computed from metadata only (no decode) — ``(doc_id, frame_idx)``.
    Pairs with `decode_image` over a per-frame payload column in a real
    deployment; here it demonstrates the explode-by-expression shape that
    keeps sampling JVM-side."""
    n_frames = (F.col("media_meta.n_bytes") / 1024).cast("int") + 1
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Symmetric int8 quantization of an ``array<float>`` column.

    The storage/transfer workhorse of large embedding corpora: 4×
    smaller vectors, dot products within ~0.5% for unit-norm inputs.
    Per-vector scale = max(|x|)/127, codes = round(x/scale) ∈ [-127,127]
    as ``array<tinyint>`` (1 logical byte/dim) + a float scale — all pure
    Spark expressions (higher-order TRANSFORM), no Python in the row
    path.
    """
    v = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),
    ) / F.lit(127.0)
    codes = F.transform(
        v,
        lambda x: F.round(x.cast("double") / scale)
        .cast("int")
        .cast("byte"),
    )
    return df.withColumn(scale_col, scale.cast("float")).withColumn(
        out_col, codes
    )


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q8",
    scale_col: str = "q8_scale",
    out_col: str = "embedding_dq",
) -> DataFrame:
    """Inverse of ``quantize_embeddings`` (codes × scale), for on-the-fly
    rescoring after a quantized first pass."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda c: (c.cast("double") * F.col(scale_col)).cast("float"),
        ),
    )


# ---------------------------------------------------------------------------
# audio: 16-bit PCM — real DSP via numpy inside Arrow batches, no codec libs
# ---------------------------------------------------------------------------

AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("is_silence", T.BooleanType()),
    ]
)


def synthesize_audio(df: DataFrame, id_col: str = "doc_id",
                     sample_rate: int = 16000,
                     duration_ms: int = 200) -> DataFrame:
    """Manufacture deterministic 16-bit little-endian PCM per row: a sine
    whose frequency derives from the id, amplitude-gated so the first and
    last quarters are near-silence (exercises silence trimming).  Stands in
    for ``spark.read.format('binaryFile')`` over .wav/.pcm objects — the
    bytes are REAL PCM, processed by real DSP downstream."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("audio", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )
    sel = df.select(F.col(id_col).cast("long").alias("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = sample_rate * duration_ms // 1000
        t = np.arange(n, dtype=np.float64) / sample_rate
        gate = np.zeros(n)
        gate[n // 4: 3 * n // 4] = 1.0  # voiced middle half
        for pdf in batches:
            ids, blobs = [], []
            for doc_id in pdf["doc_id"]:
                freq = 200.0 + (int(doc_id) % 17) * 50.0
                wave = 0.5 * np.sin(2 * np.pi * freq * t) * gate
                pcm = (wave * 32767).astype("<i2").tobytes()
                ids.append(doc_id)
                blobs.append(pcm)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "audio": blobs,
                    "sample_rate": [sample_rate] * len(ids),
                }
            )

    return sel.mapInPandas(synth, schema=schema)


def audio_frame_energy(df: DataFrame, audio_col: str = "audio",
                       id_col: str = "doc_id", sample_rate: int = 16000,
                       frame_ms: int = 25,
                       silence_rms: float = 0.01) -> DataFrame:
    """Per-frame RMS energy + silence flags over 16-bit PCM — the feature
    extraction stage of every speech-data pipeline (VAD, silence trimming,
    loudness normalization all start here).  Real numpy DSP in Arrow
    batches; one output row per ``frame_ms`` frame.

    Scale: payloads never shuffle — frames are emitted from the same
    partition that holds the bytes, and only the (id, frame, rms) rows
    (a ~100× reduction) flow downstream."""
    frame_len = sample_rate * frame_ms // 1000
    sel = df.select(
        F.col(id_col).alias("doc_id"), F.col(audio_col).alias("audio")
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_id, out_fi, out_rms, out_sil = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["audio"]):
                x = np.frombuffer(bytes(blob), dtype="<i2").astype(
                    np.float64
                ) / 32768.0
                n_frames = len(x) // frame_len
                if n_frames == 0:
                    continue
                fr = x[: n_frames * frame_len].reshape(n_frames, frame_len)
                rms = np.round(np.sqrt((fr * fr).mean(axis=1)), 6)
                out_id.extend([doc_id] * n_frames)
                out_fi.extend(range(n_frames))
                out_rms.extend(rms.tolist())
                # flag derived from the SAME rounded value that is emitted,
                # so consumers recomputing it from the rms column agree on
                # boundary frames
                out_sil.extend((rms < silence_rms).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": out_id,
                    "frame_idx": out_fi,
                    "rms": out_rms,
                    "is_silence": out_sil,
                }
            )

    return sel.mapInPandas(frames, schema=AUDIO_FRAME_SCHEMA)


def silence_trim_stats(frame_df: DataFrame) -> DataFrame:
    """Aggregate `audio_frame_energy` output into per-clip trim decisions:
    first/last voiced frame, voiced fraction, and whether the clip is
    droppable (all-silence) — pure expressions over the frame rows, so the
    trim plan composes with any filter/join without touching bytes again."""
    voiced = F.when(~F.col("is_silence"), F.col("frame_idx"))
    return frame_df.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.min(voiced).alias("first_voiced"),
        F.max(voiced).alias("last_voiced"),
        F.round(
            F.avg(F.when(F.col("is_silence"), 0.0).otherwise(1.0)), 6
        ).alias("voiced_frac"),
        (F.max(voiced).isNull()).alias("droppable"),
    )


# ---------------------------------------------------------------------------
# perceptual image dedup: dHash over REAL decoded pixels + banded
# Hamming pairing (the multimodal member of the dedup family)
# ---------------------------------------------------------------------------

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _pool_sums(gray_int, rows: int, cols: int):
    """Pixel-bucket SUMS and COUNTS (exact int64) of an integer (h, w)
    array pooled to (rows, cols).  Means are never materialized: callers
    compare cell means by integer cross-multiplication
    (sum_a * cnt_b < sum_b * cnt_a), which is EXACT — float means with
    unequal cell sizes can flip a tied comparison by one ulp under a
    uniform brightness shift (caught by the invariance test)."""
    import numpy as np

    h, w = gray_int.shape
    r_idx = (np.arange(h) * rows) // h
    c_idx = (np.arange(w) * cols) // w
    out = np.zeros((rows, cols), dtype=np.int64)
    cnt = np.zeros((rows, cols), dtype=np.int64)
    np.add.at(out, (r_idx[:, None], c_idx[None, :]), gray_int)
    np.add.at(cnt, (r_idx[:, None], c_idx[None, :]), 1)
    return out, cnt


def perceptual_dhash(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id",
) -> DataFrame:
    """64-bit difference hash per image: decode via the codec registry
    (PNG pre-registered — real pixels from the stdlib codec in
    operators/png.py; other formats via register_image_codec), collapse
    to grayscale, mean-pool to an
    8x9 grid (integer sums + counts, compared by exact
    cross-multiplication — no float ties), and take the 8x8
    horizontal-gradient sign bits.  EXACTLY invariant to uniform
    brightness shifts (the shift term cancels in the cross-multiplied
    comparison), which byte-level hashing (q52's fingerprint) is
    maximally fragile to.  ``mapInPandas`` Arrow batches — the codec is
    the only Python in the pipeline; everything downstream (banding,
    pairing) is native expression code.  Undecodable payloads are
    dropped (the caller's quarantine split handles them — same contract
    as decode_image's codec gate)."""
    import numpy as np

    sel = df.select(
        F.col(id_col).alias("doc_id").cast("long"),
        F.col(media_col).alias("media"),
    )
    codecs = registered_image_codecs()  # snapshot (see decode_image)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_len = sorted(codecs, key=len, reverse=True)

        for pdf in it:
            ids, sigs = [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                magic = next((m for m in by_len if b.startswith(m)), None)
                if magic is None:
                    continue
                try:
                    arr = np.asarray(codecs[magic](b))
                except Exception:
                    continue
                a = arr.astype(np.int64)
                # channel SUM, not mean: the /channels factor cancels in
                # the cross-multiplied comparisons below
                gray = a.sum(axis=2) if a.ndim == 3 else a
                s, c = _pool_sums(gray, 8, 9)
                # mean_right < mean_left, exactly:
                bits = s[:, 1:] * c[:, :-1] < s[:, :-1] * c[:, 1:]
                sig = 0
                for i, bit in enumerate(bits.flatten()):
                    if bit:
                        sig |= 1 << i
                if sig >= 1 << 63:
                    sig -= 1 << 64
                ids.append(int(doc_id))
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": ids, "dhash": sigs})

    return sel.mapInPandas(batches, schema=DHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash signatures, then the
    SimHash block-permutation pigeonhole (dedup_docs.py) — any pair
    within the Hamming ball shares ≥1 exact 16-bit block, so candidates
    come from equality joins, never an all-pairs scan.  Returns
    (id_a, id_b, hamming)."""
    from .dedup_docs import hamming64

    assert blocks > max_hamming, "pigeonhole requires blocks > max_hamming"
    width = 64 // blocks
    mask = (1 << width) - 1
    sig = perceptual_dhash(df, media_col, id_col)
    chunks = sig.select(
        F.col("doc_id").alias("id"),
        F.col("dhash").alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("dhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bc"),
    ).select("id", "sig", "bc.blk", "bc.chunk")
    return (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["blk", "chunk"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            hamming64(F.col("x.sig"), F.col("y.sig")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
