"""Multimodal → embedding-ANN bridge: image and audio descriptors served
by the EXISTING IVF-PQ stack.

The perceptual-hash family (aHash / energy envelope) connects media to
DEDUP — Hamming/Jaccard on 64-bit fingerprints. This module connects it
to similarity SEARCH: each image decodes to a small float descriptor
(codecs.image_descriptor — block-mean luminance, centered, the continuous
relaxation of aHash) and each audio clip to its energy-envelope twin
(codecs.audio_descriptor — L2-normalized segment RMS, the continuous
relaxation of energyhash64), and the descriptor column feeds the same
IVF-PQ serve path (similarity/pq.py ivfpq_topk) the text-embedding gates
use — "find images/clips like this one" becomes one frozen-model ANN
query, with the corpus pruned to nprobe coarse cells and scored by ADC
lookup sums.

Frozen-model discipline (similarity/gate_model.py, multimodal/synth.py):
the coarse centroids and PQ codebooks are trained ONCE by a deterministic
pure-numpy Lloyd's (first-k init, fixed iterations, argmin ties to the
lower index) on the frozen 48-descriptor table and regenerated at import
— cheap (48 × 16 floats), reproducible bit-for-bit, and the SAME literals
drive the Spark kernels and the DuckDB oracle, so assignment → encode →
ADC → rank hash-match exactly. At 100 TB the models would be trained on a
sample and frozen exactly the same way; serving cost is the audited
ivfpq_topk contract (one fused Arrow kernel over the scan, broadcast
LUT probe, per-query top-k window).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DESCRIPTOR_DIM = 16
_COARSE_K = 4
# 8 subspaces × 16 codes over the unit-normalized descriptors: measured
# (all 144 gate-corpus probes) as the smallest geometry where every
# probe's exact duplicates survive into the top-10 — M=4/K=8 on raw
# coordinates lost them to quantization noise (see
# codecs.image_descriptor's normalization note).
_PQ_M = 8
_PQ_K = 16


def _lloyd(points: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means: init = the first k points in table
    order, Euclidean assignment with argmin-first-occurrence ties, fixed
    iteration count, empty clusters keep their previous centroid. Pure
    float64 numpy — regenerates identically everywhere."""
    cents = points[:k].copy()
    for _ in range(iters):
        d2 = ((points[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = points[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


@lru_cache(maxsize=3)
def _frozen_points(modality: str) -> np.ndarray:
    from flink_1_3_2_hopsworks_spark.multimodal import synth

    table = {
        "image": synth.frozen_descriptor_table,
        "audio": synth.frozen_audio_descriptor_table,
        "video": synth.frozen_video_descriptor_table,
    }[modality]()
    return np.asarray([d for _, _, d in table], dtype=np.float64)


def _coarse(points: np.ndarray) -> tuple:
    cents = _lloyd(points, _COARSE_K)
    return tuple(tuple(float(x) for x in np.round(c, 6)) for c in cents)


def _books(points: np.ndarray) -> tuple:
    d = DESCRIPTOR_DIM // _PQ_M
    books = []
    for s in range(_PQ_M):
        cents = _lloyd(points[:, s * d:(s + 1) * d], _PQ_K)
        books.append(
            tuple(tuple(float(x) for x in np.round(c, 6)) for c in cents)
        )
    return tuple(books)


@lru_cache(maxsize=1)
def mm_coarse_centroids() -> tuple:
    """The frozen IVF coarse quantizer for the image-descriptor space
    (4 cells over the 48-point frozen table), rounded to 6 dp — the
    literals both engines share."""
    return _coarse(_frozen_points("image"))


@lru_cache(maxsize=1)
def mm_codebooks() -> tuple:
    """The frozen PQ codebooks (8 subspaces × 16 codes × 2 dims) trained
    per-subspace on the frozen table's subvectors, rounded to 6 dp."""
    return _books(_frozen_points("image"))


@lru_cache(maxsize=1)
def mm_audio_coarse_centroids() -> tuple:
    """The audio-descriptor-space coarse quantizer (same discipline)."""
    return _coarse(_frozen_points("audio"))


@lru_cache(maxsize=1)
def mm_audio_codebooks() -> tuple:
    """The audio-descriptor-space PQ codebooks (same discipline)."""
    return _books(_frozen_points("audio"))


@lru_cache(maxsize=1)
def mm_video_coarse_centroids() -> tuple:
    """The video-descriptor-space coarse quantizer (same discipline)."""
    return _coarse(_frozen_points("video"))


@lru_cache(maxsize=1)
def mm_video_codebooks() -> tuple:
    """The video-descriptor-space PQ codebooks (same discipline)."""
    return _books(_frozen_points("video"))


def image_embeddings(
    media: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, embedding) — decode each binary image payload and compute its
    descriptor in ONE Arrow-batched kernel (payload bytes ride Arrow,
    never the driver; the decode is the same pure-numpy BMP path the
    near-dup gates audit)."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        decode_bmp,
        image_descriptor,
    )

    schema = (
        f"{id_col} {dict(media.dtypes)[id_col]}, embedding array<double>"
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs = [
                [float(x) for x in image_descriptor(decode_bmp(p))]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)


def audio_embeddings(
    media: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, embedding) — decode each binary WAV payload and compute its
    energy-envelope descriptor in ONE Arrow-batched kernel (the audio
    twin of image_embeddings)."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        audio_descriptor,
        decode_wav,
    )

    schema = (
        f"{id_col} {dict(media.dtypes)[id_col]}, embedding array<double>"
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            embs = [
                [float(x) for x in audio_descriptor(decode_wav(p)[0])]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)


def video_embeddings(
    media: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, embedding) — demux each binary BMV container, decode its
    frames, and pool the per-frame descriptors in ONE Arrow-batched
    kernel (the video twin of image_embeddings; frames never leave the
    executor)."""
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import (
        decode_bmp,
        decode_bmv,
        video_descriptor_batched,
    )

    schema = (
        f"{id_col} {dict(media.dtypes)[id_col]}, embedding array<double>"
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # batched frame-stack descriptor (exact-equality pinned vs
            # the per-frame path) — the descriptor loop was ~80% of this
            # kernel's measured per-video cost
            embs = [
                [
                    float(x)
                    for x in video_descriptor_batched(
                        [decode_bmp(fr) for fr in decode_bmv(p)]
                    )
                ]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)


def _media_topk(
    corpus_emb: DataFrame,
    probe_emb: DataFrame,
    centroids: tuple,
    codebooks: tuple,
    id_col: str,
    k: int,
    nprobe: int,
    query_id: str,
) -> DataFrame:
    from flink_1_3_2_hopsworks_spark.similarity.pq import ivfpq_topk

    return ivfpq_topk(
        corpus_emb,
        probe_emb,
        [list(c) for c in centroids],
        [[list(c) for c in b] for b in codebooks],
        id_col,
        "embedding",
        k=k,
        nprobe=nprobe,
        query_id=query_id,
    )


def image_topk(
    corpus_media: DataFrame,
    probe_media: DataFrame,
    id_col: str,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """Top-k most-similar images per probe image — decode → descriptor →
    the EXISTING IVF-PQ serve path under the frozen descriptor-space
    models. Output: (query_id, id, cosine, rank)."""
    return _media_topk(
        image_embeddings(corpus_media, id_col),
        image_embeddings(probe_media, query_id),
        mm_coarse_centroids(),
        mm_codebooks(),
        id_col, k, nprobe, query_id,
    )


def audio_topk(
    corpus_media: DataFrame,
    probe_media: DataFrame,
    id_col: str,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """Top-k most-similar audio clips per probe clip — the audio twin of
    image_topk under the audio-space frozen models."""
    return _media_topk(
        audio_embeddings(corpus_media, id_col),
        audio_embeddings(probe_media, query_id),
        mm_audio_coarse_centroids(),
        mm_audio_codebooks(),
        id_col, k, nprobe, query_id,
    )


def video_topk(
    corpus_media: DataFrame,
    probe_media: DataFrame,
    id_col: str,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """Top-k most-similar videos per probe video — the video twin of
    image_topk under the video-space frozen models."""
    return _media_topk(
        video_embeddings(corpus_media, id_col),
        video_embeddings(probe_media, query_id),
        mm_video_coarse_centroids(),
        mm_video_codebooks(),
        id_col, k, nprobe, query_id,
    )
