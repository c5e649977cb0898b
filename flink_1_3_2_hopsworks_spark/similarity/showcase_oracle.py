"""DuckDB oracle SQL for similarity-search showcase queries.

``sim_ivf_topk`` stays rows-only (sampled k-means is not SQL-replayable);
``sim_lsh_topk``'s deterministic seeded hyperplanes ARE — its oracle
inlines them and replays bucket + rank exactly.
"""


def _lsh_topk_oracle(k: int = 10, num_planes: int = 6, dim: int = 64, seed: int = 42) -> str:
    from flink_1_3_2_hopsworks_spark.dedup.embedding import (
        hyperplane_bit_terms_sql,
        hyperplanes,
    )

    bit_terms = hyperplane_bit_terms_sql(hyperplanes(dim, num_planes, seed))
    return f"""
        WITH vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sig AS (
            SELECT vec_id, v,
                {bit_terms}
                AS s
            FROM vecs
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id,
                LIST_INNER_PRODUCT(q.v, c.v)
                / (SQRT(LIST_INNER_PRODUCT(q.v, q.v))
                   * SQRT(LIST_INNER_PRODUCT(c.v, c.v))) AS cos
            FROM sig c JOIN sig q ON c.s = q.s
            WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
        ), ranked AS (
            SELECT query_id, vec_id, cos,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC
                ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, ROUND(cos, 4) AS cosine, rank
        FROM ranked WHERE rank <= {k}
    """


ORACLE: dict[str, str] = {
    "sim_lsh_topk": _lsh_topk_oracle(),
    "sim_bruteforce_topk": """
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 5
        ),
        c AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
        ),
        scored AS (
            SELECT query_id, vec_id,
                   LIST_COSINE_SIMILARITY(qv, cv) AS cos
            FROM c CROSS JOIN q
            WHERE vec_id <> query_id
        ),
        ranked AS (
            SELECT query_id, vec_id, cos,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, vec_id ASC
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, ROUND(cos, 4) AS cosine, rank
        FROM ranked WHERE rank <= 10
    """,
}
