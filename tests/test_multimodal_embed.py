"""Multimodal → embedding-ANN bridge (multimodal/embed.py): descriptor
kernel vs the frozen model table, planted-neighbor retrieval through the
IVF-PQ serve path, and recall vs the exact brute-force baseline."""

from __future__ import annotations

import pyspark.sql.functions as F


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_descriptor_kernel_matches_frozen_table(spark):
    """The live decode→descriptor Arrow kernel reproduces the frozen
    (pattern, variant) → descriptor model bit-for-bit — the contract that
    lets the oracle join literals instead of decoding."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import image_embeddings
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_descriptor_table,
        image_twin,
    )

    frozen = {(k, v): d for k, v, d in frozen_descriptor_table()}
    rows = image_embeddings(
        image_twin(_ids(spark, 48), "doc_id"), "doc_id"
    ).collect()
    assert len(rows) == 48
    for r in rows:
        i = r["doc_id"]
        assert r["embedding"] == frozen[(i % 16, (i // 16) % 3)]


def test_brightness_copy_descriptor_is_identical(spark):
    """Centering makes the descriptor brightness-invariant like aHash:
    v1 (+20 on every pixel) embeds IDENTICALLY to v0, v2 (local edit)
    lands nearby but not identical."""
    import numpy as np

    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_descriptor_table,
    )

    d = {(k, v): np.asarray(dv) for k, v, dv in frozen_descriptor_table()}
    for k in range(16):
        assert (d[(k, 0)] == d[(k, 1)]).all()
        assert not (d[(k, 0)] == d[(k, 2)]).all()
    # The v2 local edit's distance is pattern-dependent (the forced white
    # block dominates low-variance patterns): near for the low-k patterns,
    # far for the high-k ones — both regimes exist, like the aHash gates.
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(d[(0, 0)], d[(0, 2)]) > 0.8
    assert cos(d[(4, 0)], d[(4, 2)]) > 0.8
    assert cos(d[(10, 0)], d[(10, 2)]) < 0.5


def test_planted_exact_neighbors_retrieved(spark):
    """Planted-neighbor recall: ids sharing the probe's image (same
    (pattern, variant) at +48/+96, plus the brightness twins) have cosine
    1.0 and MUST all surface in the IVF-PQ top-10 — identical vectors get
    identical cells and codes, so pruning can never separate them."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import image_topk
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin

    corpus = image_twin(_ids(spark, 144), "doc_id")
    for probe_id in (7, 30):
        k, v = probe_id % 16, (probe_id // 16) % 3
        planted = {
            i
            for i in range(144)
            if i != probe_id
            and i % 16 == k
            and ((i // 16) % 3 == v or {(i // 16) % 3, v} == {0, 1})
        }
        probes = image_twin(
            spark.createDataFrame([(probe_id,)], "query_id long"), "query_id"
        )
        got = {
            r["doc_id"]
            for r in image_topk(corpus, probes, "doc_id", k=10).collect()
        }
        assert planted <= got, f"probe {probe_id}: {planted - got} missing"


def test_ivfpq_recall_vs_bruteforce(spark):
    """Recall@10 of the frozen-model IVF-PQ serve path against the exact
    brute-force cosine baseline on the same descriptors."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import (
        image_embeddings,
        image_topk,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin
    from flink_1_3_2_hopsworks_spark.similarity.knn import brute_force_topk

    corpus_media = image_twin(_ids(spark, 144), "doc_id")
    probe_media = image_twin(
        spark.range(5).select(F.col("id").alias("query_id")), "query_id"
    )
    emb = image_embeddings(corpus_media, "doc_id").withColumnRenamed(
        "doc_id", "vec_id"
    )
    queries = image_embeddings(probe_media, "query_id")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(
            emb, queries, "vec_id", "embedding", k=10
        ).collect()
    }
    approx = {
        (r["query_id"], r["doc_id"])
        for r in image_topk(corpus_media, probe_media, "doc_id", k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall@10 = {recall}"


def test_audio_descriptor_kernel_matches_frozen_table(spark):
    """The audio decode→descriptor kernel reproduces the frozen table
    bit-for-bit (PCM-16 quantization included in both paths)."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import audio_embeddings
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        audio_twin,
        frozen_audio_descriptor_table,
    )

    frozen = {(k, v): d for k, v, d in frozen_audio_descriptor_table()}
    rows = audio_embeddings(
        audio_twin(_ids(spark, 48), "doc_id"), "doc_id"
    ).collect()
    assert len(rows) == 48
    for r in rows:
        i = r["doc_id"]
        assert r["embedding"] == frozen[(i % 16, (i // 16) % 3)]


def test_audio_gain_invariance_within_quantization(spark):
    """L2 normalization makes the descriptor gain-invariant up to PCM-16
    quantization: v1 (half gain) lands at cosine > 0.999998 of v0 — NOT
    bit-identical (the rounding is real and frozen), v2's envelope edit
    at 0.96–0.99."""
    import numpy as np

    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_audio_descriptor_table,
    )

    d = {(k, v): np.asarray(dv) for k, v, dv in frozen_audio_descriptor_table()}
    for k in range(16):
        assert float(d[(k, 0)] @ d[(k, 1)]) > 0.999998
        c2 = float(d[(k, 0)] @ d[(k, 2)])
        assert 0.9 < c2 < 0.9999


def test_audio_planted_neighbors_retrieved(spark):
    """Exact audio copies (same (pattern, variant) at +48/+96) AND the
    half-gain remaster family (v0↔v1, within quantization noise of
    cosine 1.0) must surface in the IVF-PQ top-10 — measured to hold for
    every probe in the 144-id gate corpus offline; pinned here for a
    sample through the full Spark path."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import audio_topk
    from flink_1_3_2_hopsworks_spark.multimodal.synth import audio_twin

    corpus = audio_twin(_ids(spark, 144), "doc_id")
    for probe_id in (7, 30):
        k, v = probe_id % 16, (probe_id // 16) % 3
        planted = {
            i
            for i in range(144)
            if i != probe_id
            and i % 16 == k
            and ((i // 16) % 3 == v or {(i // 16) % 3, v} == {0, 1})
        }
        probes = audio_twin(
            spark.createDataFrame([(probe_id,)], "query_id long"), "query_id"
        )
        got = {
            r["doc_id"]
            for r in audio_topk(corpus, probes, "doc_id", k=10).collect()
        }
        assert planted <= got, f"probe {probe_id}: {planted - got} missing"


def test_video_descriptor_kernel_matches_frozen_table(spark):
    """The demux→decode→pool kernel reproduces the frozen video
    descriptor table bit-for-bit."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import video_embeddings
    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_video_descriptor_table,
        video_twin,
    )

    frozen = {(k, v): d for k, v, d in frozen_video_descriptor_table()}
    rows = video_embeddings(
        video_twin(_ids(spark, 48), "doc_id"), "doc_id"
    ).collect()
    assert len(rows) == 48
    for r in rows:
        i = r["doc_id"]
        assert r["embedding"] == frozen[(i % 16, (i // 16) % 3)]


def test_video_reencode_pools_identically_partial_copy_nearby(spark):
    """Mean-pooling preserves the frame descriptor's brightness
    invariance exactly (v1 ≡ v0 bit-for-bit) and a 7-of-8-frame partial
    copy lands at cosine 0.76–0.95."""
    import numpy as np

    from flink_1_3_2_hopsworks_spark.multimodal.synth import (
        frozen_video_descriptor_table,
    )

    d = {(k, v): np.asarray(dv) for k, v, dv in frozen_video_descriptor_table()}
    for k in range(16):
        assert (d[(k, 0)] == d[(k, 1)]).all()
        c2 = float(d[(k, 0)] @ d[(k, 2)])
        assert 0.7 < c2 < 0.96


def test_video_planted_neighbors_retrieved(spark):
    """Exact video copies AND re-encode twins must surface in the IVF-PQ
    top-10 (all 144 gate-corpus probes hold offline; sampled here
    through the full Spark path)."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import video_topk
    from flink_1_3_2_hopsworks_spark.multimodal.synth import video_twin

    corpus = video_twin(_ids(spark, 144), "doc_id")
    for probe_id in (7, 30):
        k, v = probe_id % 16, (probe_id // 16) % 3
        planted = {
            i
            for i in range(144)
            if i != probe_id
            and i % 16 == k
            and ((i // 16) % 3 == v or {(i // 16) % 3, v} == {0, 1})
        }
        probes = video_twin(
            spark.createDataFrame([(probe_id,)], "query_id long"), "query_id"
        )
        got = {
            r["doc_id"]
            for r in video_topk(corpus, probes, "doc_id", k=10).collect()
        }
        assert planted <= got, f"probe {probe_id}: {planted - got} missing"
