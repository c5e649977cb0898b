"""DuckDB oracle SQL for similarity-search showcase queries.

``sim_lsh_topk`` inlines the seeded hyperplanes and replays bucket + rank
exactly; ``sim_ivf_topk`` inlines the FROZEN k-means centroids
(similarity/gate_model.py) and replays cell assignment → nprobe probing →
cosine → per-query top-k. Both are deterministic, so both hash-match.
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


def _ivf_topk_oracle(k: int = 10, nprobe: int = 6) -> str:
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import FROZEN_CENTROIDS

    values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(FROZEN_CENTROIDS)
    )
    return f"""
        WITH cent(cell, cv) AS (
            VALUES {values}
        ), vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sims AS (
            SELECT vec_id, cell,
                LIST_COSINE_SIMILARITY(v, cv) AS sim
            FROM vecs CROSS JOIN cent
        ), assigned AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, cell ASC
                ) AS rn FROM sims
            ) WHERE rn = 1
        ), probed AS (
            SELECT vec_id AS query_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, cell ASC
                ) AS rn FROM sims WHERE vec_id < 5
            ) WHERE rn <= {nprobe}
        ), scored AS (
            SELECT p.query_id, a.vec_id,
                LIST_COSINE_SIMILARITY(q.v, c.v) AS cos
            FROM probed p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN vecs q ON q.vec_id = p.query_id
            JOIN vecs c ON c.vec_id = a.vec_id
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


_BRUTEFORCE_SQL = """
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
    """


def _recall_eval_oracle() -> str:
    """Composes the two gate oracles: recall@10 of LSH vs brute force."""
    return f"""
        WITH lsh AS ({_lsh_topk_oracle()}),
        bf AS ({_BRUTEFORCE_SQL}),
        hits AS (
            SELECT b.query_id, COUNT(*) AS n
            FROM bf b JOIN lsh l
              ON l.query_id = b.query_id AND l.vec_id = b.vec_id
            GROUP BY b.query_id
        )
        SELECT q.query_id,
            CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
            ROUND(COALESCE(h.n, 0) / 10.0, 4) AS recall
        FROM (SELECT DISTINCT query_id FROM bf) q
        LEFT JOIN hits h ON h.query_id = q.query_id
    """


ORACLE: dict[str, str] = {
    "sim_lsh_topk": _lsh_topk_oracle(),
    "sim_ivf_topk": _ivf_topk_oracle(),
    "sim_recall_eval": _recall_eval_oracle(),
    "sim_bruteforce_topk": _BRUTEFORCE_SQL,
}
