"""Deterministic synthetic image corpus — the multimodal twin of
dedup/showcase.py's ``_linified_docs``.

The parquet testdata has no image table, so the image near-dup gate
derives one deterministically from the documents ids: doc ``i`` carries a
32×32 24-bit BMP of pattern ``k = i % n_patterns`` in variant
``v = (i // n_patterns) % 3``:

- v0: the base pattern — pixel (y, x) = 40 + (x·(k+3) + y·(2k+1)) mod 156
  (grayscale, range [40, 195]);
- v1: v0 + 20 brightness (no clipping) — a re-encoded/levels-adjusted
  copy whose aHash is IDENTICAL (the hash is mean-relative);
- v2: v0 with the top-left 4×4 block forced to 255 — a local edit whose
  aHash differs by a small, pattern-dependent Hamming distance (1–10 bits
  over the 16 patterns; some v2s are near-dups at max_distance=3, some
  are not — both behaviors exercised and frozen in the oracle).

Because the payload depends only on (k, v), the 48 possible aHash values
are a FROZEN model table (``frozen_ahash_table`` — same discipline as
similarity/gate_model.py's centroids): the oracle joins ids to the frozen
fingerprints and replays blocking/Hamming/closure in SQL, while the Spark
side really encodes the BMP bytes, decodes them with the pure-numpy BMP
codec, and hashes the pixels in an Arrow kernel — a hash match proves the
whole binary round-trip.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.multimodal.codecs import ahash64, encode_bmp


def synth_image(k: int, v: int) -> np.ndarray:
    """The deterministic (32, 32, 3) uint8 pattern for (pattern k, variant
    v) — see the module docstring for the variant semantics."""
    y, x = np.mgrid[0:32, 0:32]
    base = (40 + (x * (k + 3) + y * (2 * k + 1)) % 156).astype(np.uint8)
    if v == 1:
        base = base + 20
    elif v == 2:
        base = base.copy()
        base[0:4, 0:4] = 255
    return np.repeat(base[:, :, None], 3, axis=2)


def frozen_ahash_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, ahash64)] for every synthetic (pattern, variant) — the
    frozen fingerprint model the oracle joins against. Pure numpy; cheap
    enough to regenerate at import (48 tiny images)."""
    return [
        (k, v, ahash64(synth_image(k, v)))
        for k in range(n_patterns)
        for v in range(n_variants)
    ]


def frozen_image_stats_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, mean_brightness, contrast, ahash64, n_bytes)] for every
    synthetic (pattern, variant) — the frozen quality+fingerprint model
    the multimodal-curation oracle joins against. Stats come from the
    SAME shared definition the live kernel uses
    (codecs.image_quality_stats), through the same BMP encode→decode
    round-trip, so live values match these literals bit-for-bit."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        decode_bmp,
        image_quality_stats,
    )

    rows = []
    for k in range(n_patterns):
        for v in range(n_variants):
            payload = encode_bmp(synth_image(k, v))
            pixels = decode_bmp(payload)
            mean, std = image_quality_stats(pixels)
            rows.append((k, v, mean, std, ahash64(pixels), len(payload)))
    return rows


def frozen_descriptor_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, descriptor)] for every synthetic (pattern, variant) through
    the REAL BMP encode→decode round-trip — the frozen embedding model the
    similarity-search oracle joins against (same discipline as
    frozen_ahash_table). v1 brightness copies produce IDENTICAL descriptors
    (centering), v2 local edits land nearby in cosine — the planted
    neighbor structure the recall pytest pins."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        decode_bmp,
        image_descriptor,
    )

    return [
        (
            k,
            v,
            [float(x) for x in image_descriptor(
                decode_bmp(encode_bmp(synth_image(k, v)))
            )],
        )
        for k in range(n_patterns)
        for v in range(n_variants)
    ]


def image_twin(
    ids: DataFrame, id_col: str, n_patterns: int = 16, n_variants: int = 3
) -> DataFrame:
    """(id, payload) — the deterministic BMP per id, encoded in an
    Arrow-batched kernel (binary column plumbing: payload bytes ride
    Arrow, never the driver)."""
    schema = f"{id_col} {dict(ids.dtypes)[id_col]}, payload binary"
    # 48 distinct payloads: encode each (k, v) once per batch, not per row.
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                k = int(i) % n_patterns
                v = (int(i) // n_patterns) % n_variants
                if (k, v) not in cache:
                    cache[(k, v)] = encode_bmp(synth_image(k, v))
                payloads.append(cache[(k, v)])
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return ids.select(id_col).mapInPandas(kernel, schema)


AUDIO_RATE = 8000
_FRAME = AUDIO_RATE // 64


def synth_audio(k: int, v: int) -> np.ndarray:
    """The deterministic 1-second mono clip for (pattern k, variant v) —
    a 440 Hz carrier under a k-dependent 64-frame amplitude ENVELOPE (the
    audio transliteration of synth_image's pixel formula; a stationary
    tone has constant frame energy and would collide across patterns):

    - v0: amplitude of frame f = 0.1 + 0.8·((f·(k+3) + 2k+1) mod 156)/156;
    - v1: v0 at half gain — a remastered/normalized copy whose energy
      fingerprint is IDENTICAL (the hash is mean-relative);
    - v2: v0 with the first two frames forced to 0.95 amplitude — a local
      edit flipping 2–7 fingerprint bits over the 16 patterns (some
      variants cluster at max_distance=4, some correctly don't).
    """
    t = np.arange(AUDIO_RATE) / AUDIO_RATE
    amp = np.repeat(
        0.1 + 0.8 * (((np.arange(64) * (k + 3) + (2 * k + 1)) % 156) / 156.0),
        _FRAME,
    )
    x = amp * np.sin(2 * np.pi * 440.0 * t)
    if v == 1:
        x = 0.5 * x
    elif v == 2:
        x = x.copy()
        x[: 2 * _FRAME] = 0.95 * np.sin(2 * np.pi * 440.0 * t[: 2 * _FRAME])
    return x


def frozen_audiofp_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, energyhash64)] through the REAL PCM-16 encode→decode
    round-trip (quantization included — the frozen values are what the
    pipeline must reproduce, not the pre-quantization ideal)."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        decode_wav,
        encode_wav,
        energyhash64,
    )

    out = []
    for k in range(n_patterns):
        for v in range(n_variants):
            samples, _ = decode_wav(encode_wav(synth_audio(k, v), AUDIO_RATE))
            out.append((k, v, energyhash64(samples)))
    return out


def frozen_audio_descriptor_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, descriptor)] for every synthetic audio (pattern, variant)
    through the REAL PCM-16 encode→decode round-trip — the frozen audio
    embedding model (the audio twin of frozen_descriptor_table). The v1
    half-gain copy normalizes to within quantization noise of v0
    (cosine > 0.999998 on every pattern — NOT bit-identical, PCM-16
    rounding is part of the frozen values), v2's local envelope edit
    lands at cosine 0.97–0.99."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        audio_descriptor,
        decode_wav,
        encode_wav,
    )

    out = []
    for k in range(n_patterns):
        for v in range(n_variants):
            samples, _ = decode_wav(encode_wav(synth_audio(k, v), AUDIO_RATE))
            out.append(
                (k, v, [float(x) for x in audio_descriptor(samples)])
            )
    return out


def audio_twin(
    ids: DataFrame, id_col: str, n_patterns: int = 16, n_variants: int = 3
) -> DataFrame:
    """(id, payload) — the deterministic WAV per id (same (k, v) mapping
    as image_twin), encoded in an Arrow-batched kernel."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import encode_wav

    schema = f"{id_col} {dict(ids.dtypes)[id_col]}, payload binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                k = int(i) % n_patterns
                v = (int(i) // n_patterns) % n_variants
                if (k, v) not in cache:
                    cache[(k, v)] = encode_wav(synth_audio(k, v), AUDIO_RATE)
                payloads.append(cache[(k, v)])
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return ids.select(id_col).mapInPandas(kernel, schema)


VIDEO_FRAMES = 8


def synth_video(k: int, v: int, n_patterns: int = 16) -> list[np.ndarray]:
    """The deterministic frame sequence for (video k, variant v): frame f
    is the synthetic image pattern q = k·VIDEO_FRAMES + f (the image
    formula generalizes to any q, giving each video its own footage):

    - v0: the 8 base frames;
    - v1: every frame brightness-shifted (+20) — a re-encode whose
      per-frame aHashes are IDENTICAL;
    - v2: frame 0 replaced with pattern q = n_patterns·VIDEO_FRAMES + k —
      a partial copy sharing 7 of 8 frames (frame-set Jaccard 7/9 ≈ 0.78).

    A handful of pattern pairs collide in aHash (e.g. videos 4 and 14
    share three frame hashes, Jaccard 0.23) — far below the 0.6 operating
    point, and the oracle replays the SAME frozen hashes, so correctness
    never depends on distinctness.
    """
    qs = [k * VIDEO_FRAMES + f for f in range(VIDEO_FRAMES)]
    if v == 2:
        qs[0] = n_patterns * VIDEO_FRAMES + k
    return [synth_image(q, 1 if v == 1 else 0) for q in qs]


def frozen_video_frame_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, frame_ahash)] — the DISTINCT frame-hash set per synthetic
    video, through the real BMP round-trip (regenerable pure-numpy
    model; the video near-dup oracle joins ids to these sets)."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        ahash64,
        decode_bmp,
        encode_bmp,
    )

    out = []
    for k in range(n_patterns):
        for v in range(n_variants):
            hashes = {
                ahash64(decode_bmp(encode_bmp(fr)))
                for fr in synth_video(k, v, n_patterns)
            }
            out += [(k, v, h) for h in sorted(hashes)]
    return out


def frozen_video_descriptor_table(n_patterns: int = 16, n_variants: int = 3):
    """[(k, v, descriptor)] for every synthetic video (pattern, variant)
    through the REAL BMV demux + BMP round-trip — the frozen video
    embedding model. v1 re-encodes pool to IDENTICAL descriptors (the
    frame descriptor's brightness invariance survives mean-pooling), v2
    partial copies (7 of 8 frames shared) land at cosine 0.76–0.95."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        decode_bmp,
        video_descriptor,
    )

    out = []
    for k in range(n_patterns):
        for v in range(n_variants):
            frames = [
                decode_bmp(encode_bmp(fr))
                for fr in synth_video(k, v, n_patterns)
            ]
            out.append(
                (k, v, [float(x) for x in video_descriptor(frames)])
            )
    return out


def video_twin(
    ids: DataFrame, id_col: str, n_patterns: int = 16, n_variants: int = 3
) -> DataFrame:
    """(id, payload) — the deterministic BMV1 container per id (same
    (k, v) mapping as image_twin/audio_twin), encoded in an Arrow kernel."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        encode_bmp,
        encode_bmv,
    )

    schema = f"{id_col} {dict(ids.dtypes)[id_col]}, payload binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for i in pdf[id_col].astype("int64"):
                k = int(i) % n_patterns
                v = (int(i) // n_patterns) % n_variants
                if (k, v) not in cache:
                    cache[(k, v)] = encode_bmv(
                        [encode_bmp(fr) for fr in synth_video(k, v, n_patterns)]
                    )
                payloads.append(cache[(k, v)])
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return ids.select(id_col).mapInPandas(kernel, schema)
