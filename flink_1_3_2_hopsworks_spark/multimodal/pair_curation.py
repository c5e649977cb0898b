"""Cross-modal PAIRED curation — joint survivorship over (caption, image)
pairs.

Real multimodal training data is (caption text, image payload)-style PAIRS
whose survivorship must be decided JOINTLY: the pair drops if EITHER side
is a duplicate or fails its modality's quality rules, and every dedup
stage runs over the previous stage's PAIR survivors — so a caption-duplicate
pair's image no longer blocks other images, and vice versa. This module is
pure composition over the individually-oracled modality pieces (curation.py
text rules/fingerprints, multimodal/curation.py's one-pass decode kernel,
the MinHash and simhash star machineries), in the same shape as both
sibling funnels: slim per-pair signal frame pinned once, set-dependent
stages derived from the pin, ONE conditional aggregate emitting the
auditable funnel with PAIR-CONSISTENT checksums (each checksum binds the
pair id to BOTH content fingerprints, so a survivor set that kept the
right ids but mismatched captions to images would not hash-match).

Reference-analogue: the two-input keyed coGroup
(flink-java operators/CoGroupOperator.java) joining two cleaned streams —
here the two cleaned relations are the text-signal and image-signal
projections of one pair table, co-grouped on the pair id.

Scale contract:
- ONE text pass for the slim caption signals (token count, fingerprint,
  C4 rule verdict), ONE Arrow decode pass for the slim image signals
  (decoded, brightness, contrast, aHash, bytes) — both map-reduce the
  heavy column away inside the scan projection; payloads and text never
  shuffle. The joined slim frame (ids + numbers + one 32-char fp) is the
  one pin.
- Caption near-dedup is the one stage that re-reads text (star-edge
  anchors must be survivors — curation.py's documented budget), gated by
  an id semi-join on the SLIM signature table. Image near-dedup reuses
  the pinned aHash column; no second decode.
- Exact dedups are hash-aggregates on the fingerprint; near-dedups are
  the linear star geometries (Θ(pairs × bands) / Θ(pairs × 4 chunks),
  never all-pairs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

STAGES = (
    "input",
    "caption_rules",
    "image_quality",
    "caption_exact_dedup",
    "image_exact_dedup",
    "caption_near_dedup",
    "image_near_dedup",
    "paired_shard",
)


def _caption_rules(text_col: str) -> Column:
    """C4 whole-document rules (curation.py's c4_doc_rules arm)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    return ~(F.lower(txt).contains("lorem ipsum") | txt.contains("{"))


def pair_curation_verdicts(
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    payload_col: str = "payload",
    min_brightness: float = 105.0,
    max_brightness: float = 137.0,
    min_contrast: float = 40.0,
    near_dup_threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_distance: int = 3,
    max_bucket: int = 1000,
    n_shards: int = 8,
    salt: str = "pair11",
) -> DataFrame:
    """Per-pair curation verdicts: one row per pair with cumulative
    JOINT stage-survival booleans ``s0``..``s7``, the slim signals behind
    them (caption fingerprint/token count, image brightness/contrast/
    aHash/bytes), and the final ``shard``. A pair survives stage k iff it
    survived stage k-1 AND passes stage k's modality criterion — drops
    propagate across modalities (the caption-duplicate pair is OUT of the
    image stages' candidate sets)."""
    from flink_1_3_2_hopsworks_spark.dedup.minhash import minhash_star_edges
    from flink_1_3_2_hopsworks_spark.dedup.neardup import (
        resolve_duplicate_clusters,
    )
    from flink_1_3_2_hopsworks_spark.dedup.simhash import simhash_star_edges
    from flink_1_3_2_hopsworks_spark.functions.text import (
        fingerprint,
        token_count,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.curation import decode_signals
    from flink_1_3_2_hopsworks_spark.operators.iterate import materialize
    from flink_1_3_2_hopsworks_spark.operators.sampling import salted_h32

    _id = F.col(id_col)

    # ONE text pass + ONE decode pass, joined on the pair id, pinned slim.
    txt = pairs.select(
        _id,
        token_count(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long")
        .alias("n_tokens"),
        fingerprint(text_col).alias("caption_fp"),
        _caption_rules(text_col).alias("_c4"),
    )
    img = decode_signals(pairs, id_col, payload_col)
    d = materialize(txt.join(img, id_col))

    s1 = F.col("_c4")
    s2 = (
        s1
        & F.col("decoded")
        & (F.col("brightness") >= min_brightness)
        & (F.col("brightness") <= max_brightness)
        & (F.col("contrast") >= min_contrast)
    )

    # Caption exact dedup: min-id keeper per caption fingerprint among
    # the JOINT s2 survivors.
    k3 = (
        d.filter(s2)
        .groupBy("caption_fp")
        .agg(F.min(_id).alias(id_col))
        .select(_id, F.lit(True).alias("_ce"))
    )
    d = d.join(k3, id_col, "left")
    s3 = s2 & F.coalesce("_ce", F.lit(False))

    # Image exact perceptual dedup: min-id keeper per aHash among the
    # JOINT s3 survivors (a caption-dup pair's image no longer blocks).
    k4 = (
        d.filter(s3)
        .groupBy("simhash")
        .agg(F.min(_id).alias(id_col))
        .select(_id, F.lit(True).alias("_ie"))
    )
    d = d.join(k4, id_col, "left")
    s4 = s3 & F.coalesce("_ie", F.lit(False))

    # Caption near-dedup: the MinHash star over the s4 survivors (the one
    # text re-read, survivor-gated by the slim id semi-join).
    ids4 = d.filter(s4).select(id_col)
    ce = minhash_star_edges(
        pairs, id_col, text_col, threshold=near_dup_threshold,
        shingle_k=shingle_k, num_hashes=num_hashes, bands=bands,
        max_bucket=max_bucket, portable=True, id_filter=ids4,
        recall_floor=None,
    )
    nd5 = resolve_duplicate_clusters(ids4, ce, id_col).select(
        id_col, F.col("kept").alias("_cn")
    )
    d = d.join(nd5, id_col, "left")
    s5 = s4 & F.coalesce("_cn", F.lit(True))

    # Image near-dedup: the simhash star over the s5 survivors' pinned
    # aHashes (no second decode). Pinned: the star machinery + closure
    # reference it several times (the sibling funnels' measured trap).
    fps5 = materialize(d.filter(s5).select(id_col, "simhash"))
    ie = simhash_star_edges(
        fps5, id_col, "simhash", max_distance=max_distance,
        max_bucket=max_bucket, fingerprints=fps5,
    )
    nd6 = resolve_duplicate_clusters(fps5, ie, id_col).select(
        id_col, F.col("kept").alias("_in")
    )
    d = d.join(nd6, id_col, "left")
    s6 = s5 & F.coalesce("_in", F.lit(True))

    shard = (salted_h32(_id, salt=f"{salt}sh") % n_shards).cast("int")
    return d.select(
        _id,
        "n_tokens",
        "caption_fp",
        "brightness",
        "contrast",
        "simhash",
        "n_bytes",
        F.lit(True).alias("s0"),
        s1.alias("s1"),
        s2.alias("s2"),
        s3.alias("s3"),
        s4.alias("s4"),
        s5.alias("s5"),
        s6.alias("s6"),
        s6.alias("s7"),
        F.when(s6, shard).alias("shard"),
    )


def pair_curation_funnel(
    pairs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "pair11",
    **kwargs,
) -> DataFrame:
    """The auditable paired-curation funnel: one row per stage with the
    surviving PAIR count, surviving caption-token total, surviving
    image-byte total, and the order-independent PAIR-CONSISTENT checksum —
    the salted 32-bit hash binds (pair id, caption fingerprint, image
    aHash), so a survivor set with the right ids but a caption matched to
    the wrong image cannot hash-match (the shard row additionally binds
    the shard). Output:
    ``(stage_idx, stage, n_pairs, n_tokens, n_bytes, pair_checksum)``."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import salted_h32

    v = pair_curation_verdicts(pairs, id_col=id_col, salt=salt, **kwargs)
    _id = F.col(id_col)
    bind = [_id, F.col("caption_fp"), F.col("simhash")]
    ck = salted_h32(*bind, salt=f"{salt}ck")
    ck_shard = salted_h32(*bind, F.col("shard"), salt=f"{salt}ck")
    aggs = []
    for i, name in enumerate(STAGES):
        cond = F.col(f"s{i}")
        check = ck_shard if name == "paired_shard" else ck
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_d{i}"),
            F.coalesce(F.sum(F.when(cond, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias(f"_t{i}"),
            F.coalesce(F.sum(F.when(cond, F.col("n_bytes"))), F.lit(0))
            .cast("long")
            .alias(f"_b{i}"),
            F.coalesce(F.sum(F.when(cond, check)), F.lit(0))
            .cast("long")
            .alias(f"_c{i}"),
        ]
    wide = v.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("stage_idx"),
                    F.lit(name).alias("stage"),
                    F.col(f"_d{i}").alias("n_pairs"),
                    F.col(f"_t{i}").alias("n_tokens"),
                    F.col(f"_b{i}").alias("n_bytes"),
                    F.col(f"_c{i}").alias("pair_checksum"),
                )
                for i, name in enumerate(STAGES)
            ]
        )
    )
    return wide.select(rows.alias("_r")).select("_r.*").orderBy("stage_idx")
