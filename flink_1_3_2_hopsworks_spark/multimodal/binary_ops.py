"""Multimodal (image/audio/video) column plumbing.

North-star extension (SURVEY.md §2.14). Media rides as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched functions over ``mapInPandas`` so each executor
processes media in columnar batches without ever materializing rows on the
driver.

Uncompressed 24-bit BMP and PCM-16 WAV decode for REAL in-container
(pure numpy/stdlib — multimodal/codecs.py), giving genuine end-to-end
pixel/sample pipelines for those formats. Other codecs (PIL/librosa/
ffmpeg) are NOT in this container: for them ``decode_image``/
``decode_audio`` raise NotImplementedError unless ``fake=True``, in which
case a deterministic fake (md5-seeded) stands in. The Spark-side plumbing
— schema, batch iteration, partitioning — is identical either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real encoder: md5-seeded pseudo-features.
    Replace with the real decode+model call where codecs are available."""
    digest = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload. Uncompressed 24-bit BMP decodes for REAL
    in-container (pure numpy, multimodal/codecs.py) to an (H, W, 3) uint8
    array; other formats need PIL/opencv (absent here) — pass fake=True
    for the deterministic feature stand-in."""
    from flink_1_3_2_hopsworks_spark.multimodal import codecs

    if codecs.is_bmp(payload):
        try:
            return codecs.decode_bmp(payload)
        except Exception:
            # Sniffed as BMP but malformed (truncated pixel data, variant
            # header): fake=True must stay TOTAL over arbitrary bytes.
            if not fake:
                raise
            return _fake_features(payload)
    if fake:
        return _fake_features(payload)
    raise NotImplementedError(
        "non-BMP image codecs (PIL/opencv) are not available in this "
        "container; pass fake=True for the deterministic stand-in"
    )


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload. PCM-16 WAV decodes for REAL in-container
    (stdlib wave + numpy) to float32 mono samples in [-1, 1]; other formats
    need librosa/ffmpeg (absent here) — pass fake=True for the stand-in."""
    from flink_1_3_2_hopsworks_spark.multimodal import codecs

    if codecs.is_wav(payload):
        try:
            return codecs.decode_wav(payload)[0]
        except Exception:
            # RIFF/WAVE header but not PCM-16 (float/8-bit variants):
            # fake=True must stay total over arbitrary bytes.
            if not fake:
                raise
            return _fake_features(payload)
    if fake:
        return _fake_features(payload)
    raise NotImplementedError(
        "non-WAV audio codecs (librosa/ffmpeg) are not available in this "
        "container; pass fake=True for the deterministic stand-in"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Feature-extract every media row: mapInPandas over Arrow batches.

    Scale notes: a narrow map — no shuffle; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory is
    bounded regardless of payload sizes. Partition by file/size beforehand
    if payloads are heavily skewed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # RichFunction.open() analogue: per-task setup happens here, once.
        from flink_1_3_2_hopsworks_spark.multimodal import codecs

        def feat(p: bytes) -> np.ndarray:
            # Real in-container decodes take precedence over the stand-in:
            # BMP → grayscale-thumbnail features, WAV → segment-RMS features.
            # fake=True stays total: a sniffed-but-malformed payload falls
            # back to the stand-in instead of failing the stage.
            try:
                if codecs.is_bmp(p):
                    return codecs.image_features(codecs.decode_bmp(p), FEATURE_DIM)
                if codecs.is_wav(p):
                    return codecs.audio_features(
                        codecs.decode_wav(p)[0], FEATURE_DIM
                    )
            except Exception:
                if not fake:
                    raise
                return _fake_features(p)
            if fake:
                return _fake_features(p)
            raise NotImplementedError(
                "payload is neither BMP nor WAV and fake=False — external "
                "codecs are unavailable in this container"
            )

        for pdf in batches:
            feats = [feat(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests: fabricate media records from the documents
    table (text bytes as payload) so the plumbing is exercised without
    real codecs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).cast("long").alias("width"),
        F.lit(64).cast("long").alias("height"),
        F.lit(None).cast("long").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real resize: output LENGTH scales with
    the target area (so batch-memory behavior is realistic), content is an
    md5 keystream of the input (so it is payload-dependent and stable)."""
    target = max(1, (w * h) // 8)
    out = bytearray()
    digest = hashlib.md5(payload or b"")
    while len(out) < target:
        digest.update(b"x")
        out.extend(digest.digest())
    return bytes(out[:target])


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize every image payload to (width, height) — mapInPandas, narrow.

    BMP payloads resize for REAL in-container (numpy nearest-neighbor
    decode → resample → re-encode, multimodal/codecs.py); other formats
    need PIL/opencv, so ``fake=True`` substitutes a deterministic payload
    transform with realistic output sizing. The Spark plumbing (schema,
    metadata rewrite, Arrow batching) is identical either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flink_1_3_2_hopsworks_spark.multimodal import codecs

        def one(p: bytes) -> bytes:
            if codecs.is_bmp(p):
                try:
                    return codecs.encode_bmp(
                        codecs.resize_nearest(codecs.decode_bmp(p), width, height)
                    )
                except Exception:
                    if not fake:
                        raise
                    return _fake_resize(p, width, height)
            if fake:
                return _fake_resize(p, width, height)
            raise NotImplementedError(
                "non-BMP image codecs are not available in this container; "
                "pass fake=True for the deterministic stand-in"
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": [one(p) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32, fake: bool = True
) -> DataFrame:
    """Sample frames from video payloads at a fixed stride — one output row
    per (video, frame), the fan-out shape a downstream image pipeline
    (resize_images / extract_features) consumes directly.

    Scale notes: fan-out happens executor-side inside mapInPandas (never on
    the driver); output rows ∝ duration/stride capped by ``max_frames``, so
    a pathological 10-hour video cannot explode a task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs (ffmpeg) are not available in this "
                    "container; pass fake=True for the deterministic stand-in"
                )
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                duration = int(row["duration_ms"] or 0)
                n = min(max_frames, max(1, duration // every_ms))
                for i in range(n):
                    ms = i * every_ms
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(ms)
                    # frame stand-in: keyed off (payload, frame index)
                    out["frame"].append(
                        _fake_resize((row["payload"] or b"") + bytes([i % 256]), 16, 16)
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, FRAMES_SCHEMA
    )


def image_ahash_fingerprints(
    media: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Perceptual 64-bit aHash fingerprint per image: one Arrow-batched
    pass (mapInPandas) decoding each BMP payload with the pure-numpy codec
    and hashing the pixels (codecs.ahash64). Output ``(id, simhash)`` —
    the column is named ``simhash`` because a 64-bit perceptual hash IS a
    simhash-shaped fingerprint: feed the result straight into
    ``dedup.simhash.simhash_star_edges(fingerprints=...)`` for linear
    image near-dup clustering (blocking, Hamming verify, star reduction
    and caps all reused verbatim).

    Scale shape: narrow map over the scan — payload bytes never shuffle;
    the only thing that leaves the kernel is (id, 64-bit hash)."""
    schema = f"{id_col} {dict(media.dtypes)[id_col]}, simhash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flink_1_3_2_hopsworks_spark.multimodal.codecs import ahash64

        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = [
                ahash64(decode_image(bytes(p))) for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": hashes})

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)


def audio_energy_fingerprints(
    media: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Perceptual 64-bit energy fingerprint per audio clip — the WAV twin
    of :func:`image_ahash_fingerprints`: one Arrow pass decoding each
    PCM-16 payload (stdlib codec) and hashing the frame-energy envelope
    (codecs.energyhash64). Output ``(id, simhash)`` feeds
    ``simhash_star_edges(fingerprints=...)`` unchanged."""
    schema = f"{id_col} {dict(media.dtypes)[id_col]}, simhash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
            decode_wav,
            energyhash64,
        )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = [
                energyhash64(decode_wav(bytes(p))[0])
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": hashes})

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)


def video_frame_hashes(
    media: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Per-frame perceptual hashes for BMV1 video payloads: one Arrow pass
    demuxes the container (codecs.decode_bmv), decodes each BMP frame, and
    aHashes it. Output ``(id, frame_idx, simhash)`` — executor-side
    fan-out (the sample_frames shape), frames never reach the driver.
    Feed the distinct per-video hash SETS to exact set-similarity
    (dedup.ngram.item_set_jaccard_pairs) for video near-dup detection:
    re-encodes collide frame-for-frame (aHash brightness invariance) and
    partial copies surface as high frame-set Jaccard."""
    schema = f"{id_col} {dict(media.dtypes)[id_col]}, frame_idx int, simhash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
            ahash64,
            decode_bmp,
            decode_bmv,
        )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, hashes = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                for f, frame in enumerate(decode_bmv(bytes(p))):
                    ids.append(i)
                    idxs.append(f)
                    hashes.append(ahash64(decode_bmp(frame)))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "simhash": hashes}
            )

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)
