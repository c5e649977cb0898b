"""Hybrid retrieval — reciprocal-rank fusion of ranked candidate lists.

Every production retrieval stack pairs a lexical index with an embedding
index and FUSES the two rankings; reciprocal-rank fusion (Cormack,
Clarke & Buettcher 2009) is the standard score-free combiner: each list
contributes 1/(rrf_k + rank) for every document it ranks, and documents
surfaced by several retrievers accumulate. Being rank-based, it needs no
score calibration between BM25's unbounded sums and cosine's [-1, 1].

Scale shape: the inputs are already per-query top-k lists — bounded by
|queries| x k regardless of corpus size — so fusion is a union of slim
(query, id, rank) frames, one small hash aggregate, and a per-query
window. All the corpus-scale work stays inside the underlying retrievers
(similarity/bm25.py, similarity/knn.py), which keep their own documented
scan/broadcast contracts. No Python anywhere.

Determinism: contributions are rounded to 6 dp and summed as
DECIMAL(38,6) (the repo-wide exact-sum contract), so the fused score is
independent of union/aggregation order; ties break by document id.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str,
    query_id: str = "query_id",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Fuse ranked lists into one top-``k`` per query.

    Each input frame must carry ``(query_id, id_col, rank)`` with rank
    1-based and gap-free per query (the contract every retriever in
    ``similarity/`` already satisfies). Output one row per surviving
    (query, document): ``(query_id, id_col, rrf_score, n_lists, rank)``
    where ``rrf_score = sum over lists of 1/(rrf_k + rank)`` and
    ``n_lists`` counts the lists that ranked the document. Ranks break
    ties by (rrf_score desc, id asc).
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        df.select(
            F.col(query_id),
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank")), 6)
            .cast("decimal(38,6)")
            .alias("_c"),
        )
        for df in lists
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = unioned.groupBy(query_id, id_col).agg(
        F.sum("_c").alias("_s"), F.count(F.lit(1)).alias("n_lists")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("_s"), F.asc(id_col))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            id_col,
            F.round(F.col("_s").cast("double"), 6).alias("rrf_score"),
            "n_lists",
            "rank",
        )
    )
