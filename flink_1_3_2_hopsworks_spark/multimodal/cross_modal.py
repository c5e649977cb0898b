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
descriptors against ONE corpus descriptor scan (the brute-force cosine
baseline — swap the expansion to ivfpq_topk against a persisted
descriptor index for the 100 TB serve path, the serve family's audited
contract); fusion is bounded by queries × k. Payloads decode once and
never shuffle.
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
) -> DataFrame:
    """Top-``k`` images per text query over a (caption, image) pair
    table. Channels fused by reciprocal rank:

    - LEXICAL: BM25 top-``bm25_k`` captions per query; each hit's paired
      image enters the text list at the caption's rank.
    - VISUAL: the hit images' descriptors probe the corpus descriptors;
      each candidate image scores its best cosine against any probe
      (rounded 4 dp, ties by id — the repo's serve-rank contract) and
      the per-query top-``visual_k`` forms the visual list.

    Output (``rrf_fuse``'s contract): one row per surviving
    (query, image) — ``(query_id, id_col, rrf_score, n_lists, rank)``;
    ``n_lists = 2`` marks images found BOTH by their own caption and by
    looking like another hit.
    """
    from flink_1_3_2_hopsworks_spark.functions.vectors import cosine
    from flink_1_3_2_hopsworks_spark.multimodal.embed import image_embeddings
    from flink_1_3_2_hopsworks_spark.similarity.bm25 import bm25_topk
    from flink_1_3_2_hopsworks_spark.similarity.hybrid import rrf_fuse

    hits = bm25_topk(pairs, queries, id_col, text_col, k=bm25_k)
    text_list = hits.select(query_id, id_col, "rank")

    # ONE decode pass over the pair corpus; probes are the hits' rows.
    emb = image_embeddings(pairs, id_col, payload_col)
    probes = (
        hits.select(query_id, id_col)
        .join(emb, id_col)
        .select(F.col(query_id), F.col("embedding").alias("_qv"))
    )
    scored = emb.select(
        F.col(id_col), F.col("embedding").alias("_cv")
    ).crossJoin(F.broadcast(probes))
    vis = (
        scored.withColumn(
            "_cos", F.round(cosine(F.col("_qv"), F.col("_cv")), 4)
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
