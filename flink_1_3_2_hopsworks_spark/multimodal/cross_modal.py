"""Cross-modal retrieval: TEXT query → IMAGE results, mediated by
(caption, image) pairs.

Without a joint text/image embedding model (no CLIP in this container —
and nothing here may depend on external weights), the standard
deterministic bridge is CAPTION MEDIATION: the text query retrieves
captions lexically, each hit's PAIRED image becomes a visual probe, and
visual expansion surfaces images that LOOK like the hits even when their
own captions never matched the query. The two evidence channels — direct
caption match and visual similarity — fuse by reciprocal rank, the same
score-free combiner the lexical+semantic hybrid gate uses.

Composition over existing audited pieces only: BM25
(similarity/bm25.py), the one-decode-pass image descriptors
(multimodal/embed.py image_embeddings — the continuous relaxation of
aHash), and rrf_fuse (similarity/hybrid.py, 6-dp DECIMAL exact sums).

Scale shape: the lexical stage keeps BM25's scan/broadcast contracts;
the visual stage broadcasts the (queries × bm25_k)-bounded probe
descriptors against ONE corpus descriptor scan — ``serve="brute"`` runs
the exact-cosine baseline, ``serve="ivfpq"`` the 100 TB path: the
audited ivfpq_topk contract under the frozen image-descriptor-space
models (coarse cells prune the corpus to nprobe Voronoi cells per
probe, PQ lookup-table sums score the survivors; on a real deployment
codes+cells persist partitioned by cell and the full-width corpus is
never re-scanned). Fusion is bounded by queries × k. Payloads decode
once and never shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def caption_to_image_topk(
    pairs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    payload_col: str = "payload",
    k: int = 10,
    bm25_k: int = 3,
    visual_k: int = 10,
    rrf_k: int = 60,
    query_id: str = "query_id",
    serve: str = "brute",
    nprobe: int = 2,
) -> DataFrame:
    """Top-``k`` images per text query over a (caption, image) pair
    table. Channels fused by reciprocal rank:

    - LEXICAL: BM25 top-``bm25_k`` captions per query; each hit's paired
      image enters the text list at the caption's rank.
    - VISUAL: the hit images' descriptors probe the corpus descriptors;
      each candidate image scores its best cosine against any probe
      (rounded 4 dp, ties by id — the repo's serve-rank contract) and
      the per-query top-``visual_k`` forms the visual list.

    ``serve`` picks the visual-expansion engine. ``"brute"`` scores
    every corpus image against every probe by exact cosine — the recall
    baseline, O(corpus × probes). ``"ivfpq"`` is the scale path: each
    probe runs the audited IVF-ADC serve contract (similarity/pq.py
    ``ivfpq_topk`` under the frozen image-descriptor-space models —
    corpus pruned to the probe's ``nprobe`` coarse cells, PQ
    lookup-table cosine), each probe keeps its ADC top-``visual_k``,
    and a candidate's score is its best ADC cosine over the query's
    probes. Approximate by construction (quantized cosine + cell
    pruning) — recall vs the brute arm is pytest-measured
    (tests/test_multimodal_embed.py).

    Output (``rrf_fuse``'s contract): one row per surviving
    (query, image) — ``(query_id, id_col, rrf_score, n_lists, rank)``;
    ``n_lists = 2`` marks images found BOTH by their own caption and by
    looking like another hit.
    """
    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        cosine_with_norms,
        norm,
    )
    from flink_1_3_2_hopsworks_spark.multimodal.embed import image_embeddings
    from flink_1_3_2_hopsworks_spark.similarity.bm25 import bm25_topk
    from flink_1_3_2_hopsworks_spark.similarity.hybrid import rrf_fuse

    if serve not in ("brute", "ivfpq"):
        raise ValueError(
            f"serve={serve!r}: expected 'brute' (exact-cosine baseline) "
            "or 'ivfpq' (frozen-model IVF-ADC serve path)."
        )
    hits = bm25_topk(pairs, queries, id_col, text_col, k=bm25_k)
    text_list = hits.select(query_id, id_col, "rank")

    # ONE decode pass over the pair corpus, PINNED (r12): both the probe
    # derivation (hits ⋈ emb) and the corpus scoring side reference this
    # frame — unpinned, the BMP decode kernel ran once per reference
    # (twice in the brute arm, twice more inside the IVF-ADC arm's
    # encode+probe). Library-internal persist, caller-owned lifecycle —
    # the same documented contract as the signature tables and
    # mm_image_near_dups' fingerprint pin.
    emb = image_embeddings(pairs, id_col, payload_col).persist()
    if serve == "ivfpq":
        vis = _ivfpq_visual_expansion(
            emb, hits, id_col, query_id, visual_k, nprobe
        )
    else:
        # Norms hoisted per vector/probe (cosine() re-aggregates both
        # norms per pair; cosine_with_norms is bit-identical arithmetic).
        probes = (
            hits.select(query_id, id_col)
            .join(emb, id_col)
            .select(F.col(query_id), F.col("embedding").alias("_qv"))
            .withColumn("_qn", norm(F.col("_qv")))
        )
        scored = (
            emb.select(F.col(id_col), F.col("embedding").alias("_cv"))
            .withColumn("_cn", norm(F.col("_cv")))
            .crossJoin(F.broadcast(probes))
        )
        vis = (
            scored.withColumn(
                "_cos",
                F.round(
                    cosine_with_norms(
                        F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
                    ),
                    4,
                ),
            )
            .groupBy(query_id, id_col)
            .agg(F.max("_cos").alias("_mc"))
        )
    w = Window.partitionBy(query_id).orderBy(F.desc("_mc"), F.asc(id_col))
    vis_list = (
        vis.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= visual_k)
        .select(query_id, id_col, "rank")
    )
    return rrf_fuse(
        [text_list, vis_list], id_col, query_id=query_id, k=k, rrf_k=rrf_k
    )


def _ivfpq_visual_expansion(
    emb: DataFrame,
    hits: DataFrame,
    id_col: str,
    query_id: str,
    visual_k: int,
    nprobe: int,
) -> DataFrame:
    """The serve-path visual expansion: per-(query, candidate) best ADC
    cosine, candidates drawn from each probe's IVF-ADC top-``visual_k``.

    Each (query, hit) probe gets a synthetic NEGATIVE probe id
    ``-(query_id·(bm25_k ceiling)+rank)`` — disjoint from corpus image
    ids by sign, so ``ivfpq_topk``'s self-exclusion (``id != query_id``)
    never fires and a hit image can rank against its own probe (the
    brute arm's cosine-1.0 self-match, quantized). One probe id per
    (query, rank) even when two queries share a hit image. The probe
    frame is bounded by queries × bm25_k rows; ``ivfpq_topk`` broadcasts
    it, so the corpus-side work is its audited contract: one fused
    Arrow kernel over the descriptor scan, cell-pruned ADC join,
    WindowGroupLimit top-k."""
    from flink_1_3_2_hopsworks_spark.multimodal.embed import (
        mm_coarse_centroids,
        mm_codebooks,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import ivfpq_topk

    probe_map = hits.select(
        F.col(query_id),
        F.col(id_col),
        (-(F.col(query_id).cast("long") * 1000 + F.col("rank"))).alias(
            "_pid"
        ),
    )
    probe_vecs = probe_map.join(emb, id_col).select("_pid", "embedding")
    per_probe = ivfpq_topk(
        emb,
        probe_vecs,
        [list(c) for c in mm_coarse_centroids()],
        [[list(c) for c in b] for b in mm_codebooks()],
        id_col,
        "embedding",
        k=visual_k,
        nprobe=nprobe,
        query_id="_pid",
    )
    return (
        per_probe.join(
            F.broadcast(probe_map.select(query_id, "_pid").distinct()),
            "_pid",
        )
        .groupBy(query_id, id_col)
        .agg(F.max("cosine").alias("_mc"))
    )
