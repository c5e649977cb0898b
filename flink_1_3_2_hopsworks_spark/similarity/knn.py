"""Embedding similarity search (approximate-nearest-neighbor surface).

North-star extension (SURVEY.md §2.14). Two paths:

  - ``brute_force_topk`` — exact top-k cosine per query: broadcast the query
    set against the corpus scan, compute cosine JVM-side (zip_with/aggregate),
    rank per query with a window. At 100 TB the corpus side stays a scan
    (no shuffle); the only shuffle is the per-query top-k, which AQE keeps
    proportional to |queries| × k. The exactness baseline.

  - ``lsh_topk`` — hyperplane-LSH bucketed: probe only corpus vectors whose
    sign signature matches the query's, then rank. Trades recall for a
    bucket-sized candidate set — the 1000-executor path when queries are many.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from flink_1_3_2_hopsworks_spark.dedup.embedding import hyperplanes, sign_signature
from flink_1_3_2_hopsworks_spark.functions.vectors import cosine_with_norms, norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    ``queries`` must carry (query_id, vec_col). Output: query_id, id, cosine,
    rank — rank deterministic via (cosine desc, id asc).
    """
    # Norms hoisted to one interpreted-HOF evaluation per vector per side
    # (cosine() would re-aggregate both norms per PAIR — 4·|corpus|·|queries|
    # array passes); cosine_with_norms is bit-identical arithmetic.
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", norm(F.col("_qv")))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")).withColumn(
        "_cn", norm(F.col("_cv"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 4).alias("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Same output shape as brute_force_topk; recall < 1 by design (a candidate
    is missed when any hyperplane separates it from the query).
    """
    planes = hyperplanes(dim, num_planes, seed)
    c = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
        .withColumn("_sig", sign_signature(F.col("_cv"), planes))
        .withColumn("_cn", norm(F.col("_cv")))
    )
    q = (
        queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
        .withColumn("_sig", sign_signature(F.col("_qv"), planes))
        .withColumn("_qn", norm(F.col("_qv")))
    )
    scored = (
        c.join(F.broadcast(q), "_sig")
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 4).alias("cosine"), "rank")
    )
