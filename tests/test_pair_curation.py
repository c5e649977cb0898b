"""Cross-modal paired curation (multimodal/pair_curation.py): JOINT
survivorship over (caption, image) pairs — planted mixed failures prove
each stage drops the right pair and that drops PROPAGATE across
modalities (a caption-dup pair's image no longer blocks other images)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.multimodal.pair_curation import (
    STAGES,
    pair_curation_funnel,
    pair_curation_verdicts,
)
from flink_1_3_2_hopsworks_spark.multimodal.synth import (
    frozen_image_stats_table,
    synth_image,
)

# Long base caption so the one-word near-variant estimates 63/64 on the
# portable MinHash (the streaming-funnel tests' NEAR_A discipline).
T1 = (
    "the archive crawler fetched this page on a tuesday and the content "
    "describes migratory birds crossing the northern flyway in autumn"
)
T1_NEAR = T1 + " indeed"
T3 = "completely unrelated corpus text about combustion engines and oil"
T4 = "a standalone document about tide pools and coastal erosion patterns"
T6 = "market gardeners rotate brassica crops to confuse soil pathogens"
T7 = "volcanic soils drain quickly yet hold surprising mineral wealth"
T8 = "medieval scribes recycled parchment by scraping the old ink away"
T9 = "railway gauges diverged for political more than technical reasons"
T10 = "lorem ipsum dolor sit amet the classic boilerplate filler text"


def _img(k: int, v: int) -> bytes:
    from flink_1_3_2_hopsworks_spark.multimodal.codecs import encode_bmp

    return encode_bmp(synth_image(k, v))


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        (1, T1, _img(1, 0)),        # both clean -> survives everything
        (2, T1, _img(2, 0)),        # caption EXACT dup of 1 -> s3 drop
        (3, T3, _img(2, 0)),        # same image as the DROPPED pair 2:
                                    # must survive (joint propagation)
        (4, T4, b"notanimage"),     # corrupt payload -> image_quality drop
        (5, T1_NEAR, _img(3, 0)),   # caption NEAR dup of 1 -> s5 drop
        (6, T6, _img(4, 0)),        # both clean -> survives (near anchor)
        (7, T7, _img(4, 2)),        # image NEAR dup of 6 (Hamming 3) -> s6
        (8, T8, _img(2, 0)),        # image EXACT dup of 3 -> s4 drop
        (9, T9, _img(0, 0)),        # brightness out of range -> s2 drop
        (10, T10, _img(5, 0)),      # caption rules (lorem ipsum) -> s1 drop
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, payload binary"
    )


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_planted_fixture_preconditions():
    """The frozen model backs the planted distances: (4,0)-(4,2) is a
    genuine near dup (1..3 bits), the other quality-passing images used
    are mutually far (> 3 bits), and (0,0) fails the brightness rule."""
    t = {(k, v): (m, s, fp) for k, v, m, s, fp, nb in
         frozen_image_stats_table()}
    used = [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0)]
    for kv in used + [(4, 2)]:
        m, s, _ = t[kv]
        assert 105.0 <= m <= 137.0 and s >= 40.0, kv
    assert 1 <= _ham(t[(4, 0)][2], t[(4, 2)][2]) <= 3
    for i, a in enumerate(used):
        for b in used[i + 1:]:
            assert _ham(t[a][2], t[b][2]) > 3, (a, b)
    m0, s0, _ = t[(0, 0)]
    assert not (105.0 <= m0 <= 137.0 and s0 >= 40.0)


def test_joint_verdicts_per_stage(pairs):
    got = {
        r["doc_id"]: tuple(r[f"s{i}"] for i in range(len(STAGES)))
        for r in pair_curation_verdicts(pairs).collect()
    }

    def upto(n):  # survives stages < n, drops at stage n
        return tuple(i < n for i in range(len(STAGES)))

    alive = (True,) * len(STAGES)
    assert got[1] == alive
    assert got[2] == upto(3)    # caption exact dup
    assert got[3] == alive      # pair 2's drop freed its image
    assert got[4] == upto(2)    # corrupt image
    assert got[5] == upto(5)    # caption near dup
    assert got[6] == alive
    assert got[7] == upto(6)    # image near dup
    assert got[8] == upto(4)    # image exact dup
    assert got[9] == upto(2)    # image quality rule
    assert got[10] == upto(1)   # caption rule


def test_funnel_counts_and_pair_consistent_checksum(pairs):
    rows = {r["stage"]: r for r in pair_curation_funnel(pairs).collect()}
    assert [r for r in STAGES] == sorted(rows, key=lambda s: rows[s]["stage_idx"])
    expected_pairs = {
        "input": 10, "caption_rules": 9, "image_quality": 7,
        "caption_exact_dedup": 6, "image_exact_dedup": 5,
        "caption_near_dedup": 4, "image_near_dedup": 3, "paired_shard": 3,
    }
    assert {s: r["n_pairs"] for s, r in rows.items()} == expected_pairs
    # pair-consistency: swapping two survivors' images keeps every id and
    # every per-modality multiset, but the PAIR binding must change the
    # checksum (ids 1 and 6 both survive with distinct captions/images).
    swapped = pairs.withColumn(
        "payload",
        F.when(F.col("doc_id") == 1, F.lit(_img(4, 0)))
        .when(F.col("doc_id") == 6, F.lit(_img(1, 0)))
        .otherwise(F.col("payload")),
    )
    rows2 = {r["stage"]: r for r in pair_curation_funnel(swapped).collect()}
    assert rows2["paired_shard"]["n_pairs"] == 3
    assert (
        rows2["image_near_dedup"]["pair_checksum"]
        != rows["image_near_dedup"]["pair_checksum"]
    )


def test_caption_to_image_topk_visual_channel_surfaces_unlabeled_twins(spark):
    """Cross-modal retrieval semantics: a pair whose caption never
    matches the text query still surfaces when its IMAGE matches a
    caption hit's image (the visual channel), while the direct caption
    hit accumulates both channels (n_lists == 2) and outranks it."""
    from flink_1_3_2_hopsworks_spark.multimodal.cross_modal import (
        caption_to_image_topk,
    )

    rows = [
        # 1: the direct caption hit for "migratory birds"
        (1, "a photo of migratory birds crossing the flyway", _img(1, 0)),
        # 2: unrelated caption, IDENTICAL image -> visual-only surface
        (2, "untitled upload number two", _img(1, 0)),
        # 3: unrelated caption, unrelated image -> must not rank above 2
        (3, "a completely different scene of machinery", _img(2, 0)),
        # 4: weak text match only
        (4, "birds on a wire at dusk", _img(3, 0)),
    ]
    pairs = spark.createDataFrame(
        rows, "doc_id long, text string, payload binary"
    )
    queries = spark.createDataFrame(
        [(1, "migratory birds flyway")], "query_id int, query_text string"
    )
    out = {
        r["doc_id"]: (r["rank"], r["n_lists"])
        for r in caption_to_image_topk(
            pairs, queries, k=4, bm25_k=2, visual_k=3
        ).collect()
    }
    # doc 1: caption hit + visual self-match -> both channels, rank 1
    assert out[1] == (1, 2)
    # doc 4: the other caption hit, also two channels -> rank 2
    assert out[4] == (2, 2)
    # doc 2: never matched the text, surfaced VISUALLY (cosine 1.0 with
    # hit 1's identical image) -> single channel, ranks above the
    # weak-visual-only doc 3
    assert out[2][1] == 1 and out[2][0] == 3
    assert out.get(3, (99, 1))[0] > out[2][0]


def _word_pairs(spark, n=144):
    """(caption, image) corpus with deterministic vocabulary captions and
    the gate's (pattern, variant) image cycle — enough lexical structure
    for BM25 and enough image repetition for the visual channel."""
    rows = [
        (
            i,
            f"token{i % 7} word{(i // 7) % 5} filler{i % 3} common text",
            _img(i % 16, (i // 16) % 3),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, payload binary"
    )


def test_caption_to_image_ivfpq_recall_vs_brute(spark):
    """The serve='ivfpq' visual expansion against the brute exact-cosine
    arm on the same pair corpus: the LEXICAL channel is identical by
    construction (same BM25 call), and the fused top-k recall stays
    above the floor despite ADC quantization + nprobe cell pruning."""
    from flink_1_3_2_hopsworks_spark.multimodal.cross_modal import (
        caption_to_image_topk,
    )

    pairs = _word_pairs(spark)
    queries = spark.createDataFrame(
        [(1, "token1 word2"), (2, "token3 word0"), (3, "token5 filler1")],
        "query_id int, query_text string",
    )
    brute = caption_to_image_topk(pairs, queries).collect()
    ivf = caption_to_image_topk(pairs, queries, serve="ivfpq").collect()
    bset = {(r["query_id"], r["doc_id"]) for r in brute}
    iset = {(r["query_id"], r["doc_id"]) for r in ivf}
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.5, f"fused top-k recall vs brute = {recall}"
    # both-channel survivors (caption hit + looks-like-itself) are the
    # anchors — every brute n_lists=2 pair must survive the swap
    anchors = {
        (r["query_id"], r["doc_id"]) for r in brute if r["n_lists"] == 2
    }
    assert anchors <= iset


def test_caption_to_image_ivfpq_twin_semantics(spark):
    """The unlabeled-twin scenario holds on the serve path: an identical
    image quantizes to the same cell and codes, so the visual channel
    still surfaces it (ADC self-cosine is maximal)."""
    from flink_1_3_2_hopsworks_spark.multimodal.cross_modal import (
        caption_to_image_topk,
    )

    rows = [
        (1, "a photo of migratory birds crossing the flyway", _img(1, 0)),
        (2, "untitled upload number two", _img(1, 0)),
        (3, "a completely different scene of machinery", _img(2, 0)),
        (4, "birds on a wire at dusk", _img(3, 0)),
    ]
    pairs = spark.createDataFrame(
        rows, "doc_id long, text string, payload binary"
    )
    queries = spark.createDataFrame(
        [(1, "migratory birds flyway")], "query_id int, query_text string"
    )
    out = {
        r["doc_id"]: (r["rank"], r["n_lists"])
        for r in caption_to_image_topk(
            pairs, queries, k=4, bm25_k=2, visual_k=3, serve="ivfpq"
        ).collect()
    }
    assert out[1] == (1, 2)
    assert out[4] == (2, 2)
    assert out[2][1] == 1  # visual-only surface survives the serve swap


def test_caption_to_image_rejects_unknown_serve(spark):
    from flink_1_3_2_hopsworks_spark.multimodal.cross_modal import (
        caption_to_image_topk,
    )

    pairs = _word_pairs(spark, n=4)
    queries = spark.createDataFrame(
        [(1, "token1")], "query_id int, query_text string"
    )
    with pytest.raises(ValueError, match="serve="):
        caption_to_image_topk(pairs, queries, serve="flat")
