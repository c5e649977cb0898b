"""DuckDB oracle SQL for similarity-search showcase queries.

``sim_lsh_topk`` is approximate by design → no oracle (rows-only check).
"""

ORACLE: dict[str, str] = {
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
