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


def _pq_topk_oracle(k: int = 10, n_queries: int = 5) -> str:
    """Replays similarity/pq.py pq_topk: per-subspace argmin encode over
    the frozen codebook literals (ties ORDER BY dist, code — matching the
    Spark struct-min), then the ADC score as an EXPLICIT left-to-right
    chain of subspace lookup terms (mirroring the engine's s-ascending
    sum; a SQL SUM() over grouped rows would not pin addition order), and
    the per-query rank over the ROUNDED score."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import _sqnorms

    m = len(FROZEN_PQ_CODEBOOKS)
    d = len(FROZEN_PQ_CODEBOOKS[0][0])
    values = ",\n                ".join(
        "({s}, {j}, [{cv}]::DOUBLE[], {sq})".format(
            s=s,
            j=j,
            cv=", ".join(repr(x) for x in c),
            sq=repr(sq),
        )
        for s, book in enumerate(FROZEN_PQ_CODEBOOKS)
        for j, (c, sq) in enumerate(zip(book, _sqnorms(book)))
    )
    num_chain = "\n                + ".join(
        f"LIST_INNER_PRODUCT(q.qv[{s * d + 1}:{s * d + d}], c.cvs[{s + 1}])"
        for s in range(m)
    )
    xsq_chain = " + ".join(f"c.sqns[{s + 1}]" for s in range(m))
    return f"""
        WITH pqcent(s, code, cv, sqn) AS (
            VALUES {values}
        ), vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), subs AS (
            SELECT vec_id, s, v[s * {d} + 1 : s * {d} + {d}] AS sub
            FROM vecs CROSS JOIN (SELECT UNNEST(RANGE(0, {m})) AS s)
        ), distc AS (
            SELECT vec_id, p.s, p.code, p.cv, p.sqn,
                p.sqn - 2 * LIST_INNER_PRODUCT(sub, p.cv) AS dist
            FROM subs JOIN pqcent p USING (s)
        ), chosen AS (
            SELECT vec_id, s, cv, sqn FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, code
                ) AS rn FROM distc
            ) WHERE rn = 1
        ), codesw AS (
            SELECT vec_id,
                LIST(cv ORDER BY s) AS cvs,
                LIST(sqn ORDER BY s) AS sqns
            FROM chosen GROUP BY vec_id
        ), queries AS (
            SELECT vec_id AS query_id, v AS qv,
                SQRT(LIST_INNER_PRODUCT(v, v)) AS qnorm
            FROM vecs WHERE vec_id < {n_queries}
        ), scored AS (
            SELECT q.query_id, c.vec_id,
                ROUND(
                    CASE WHEN q.qnorm * SQRT({xsq_chain}) = 0 THEN 0.0
                    ELSE (
                {num_chain}
                    ) / (q.qnorm * SQRT({xsq_chain})) END,
                4) AS cosine
            FROM codesw c CROSS JOIN queries q
            WHERE c.vec_id <> q.query_id
        ), ranked AS (
            SELECT query_id, vec_id, cosine,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def _ivfpq_topk_oracle(k: int = 10, nprobe: int = 6, n_queries: int = 5) -> str:
    """Replays similarity/pq.py ivfpq_topk: frozen-coarse cell assignment +
    nprobe probing (the _ivf_topk_oracle CTEs) composed with the PQ encode
    and explicit left-to-right ADC chain (the _pq_topk_oracle CTEs); the
    candidate set is the cell equi-join instead of the flat cross join."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import _sqnorms

    cent_values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(FROZEN_CENTROIDS)
    )
    m = len(FROZEN_PQ_CODEBOOKS)
    d = len(FROZEN_PQ_CODEBOOKS[0][0])
    pq_values = ",\n                ".join(
        "({s}, {j}, [{cv}]::DOUBLE[], {sq})".format(
            s=s,
            j=j,
            cv=", ".join(repr(x) for x in c),
            sq=repr(sq),
        )
        for s, book in enumerate(FROZEN_PQ_CODEBOOKS)
        for j, (c, sq) in enumerate(zip(book, _sqnorms(book)))
    )
    num_chain = "\n                + ".join(
        f"LIST_INNER_PRODUCT(q.qv[{s * d + 1}:{s * d + d}], c.cvs[{s + 1}])"
        for s in range(m)
    )
    xsq_chain = " + ".join(f"c.sqns[{s + 1}]" for s in range(m))
    return f"""
        WITH cent(cell, ccv) AS (
            VALUES {cent_values}
        ), vecs AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), sims AS (
            SELECT vec_id, cell,
                LIST_COSINE_SIMILARITY(v, ccv) AS sim
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
                ) AS rn FROM sims WHERE vec_id < {n_queries}
            ) WHERE rn <= {nprobe}
        ), pqcent(s, code, cv, sqn) AS (
            VALUES {pq_values}
        ), subs AS (
            SELECT vec_id, s, v[s * {d} + 1 : s * {d} + {d}] AS sub
            FROM vecs CROSS JOIN (SELECT UNNEST(RANGE(0, {m})) AS s)
        ), distc AS (
            SELECT vec_id, p.s, p.code, p.cv, p.sqn,
                p.sqn - 2 * LIST_INNER_PRODUCT(sub, p.cv) AS dist
            FROM subs JOIN pqcent p USING (s)
        ), chosen AS (
            SELECT vec_id, s, cv, sqn FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, code
                ) AS rn FROM distc
            ) WHERE rn = 1
        ), codesw AS (
            SELECT vec_id,
                LIST(cv ORDER BY s) AS cvs,
                LIST(sqn ORDER BY s) AS sqns
            FROM chosen GROUP BY vec_id
        ), queries AS (
            SELECT vec_id AS query_id, v AS qv,
                SQRT(LIST_INNER_PRODUCT(v, v)) AS qnorm
            FROM vecs WHERE vec_id < {n_queries}
        ), scored AS (
            SELECT p.query_id, a.vec_id,
                ROUND(
                    CASE WHEN q.qnorm * SQRT({xsq_chain}) = 0 THEN 0.0
                    ELSE (
                {num_chain}
                    ) / (q.qnorm * SQRT({xsq_chain})) END,
                4) AS cosine
            FROM probed p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN codesw c ON c.vec_id = a.vec_id
            JOIN queries q ON q.query_id = p.query_id
        ), ranked AS (
            SELECT query_id, vec_id, cosine,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
                ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def _ivfpq_rerank_topk_oracle(
    k: int = 10, shortlist: int = 50, nprobe: int = 6, n_queries: int = 5
) -> str:
    """Replays similarity/pq.py ivfpq_rerank_topk: the FULL ADC shortlist
    replay (_ivfpq_topk_oracle at k=shortlist) nested as a CTE, then the
    exact-cosine refine over only the shortlisted (query, candidate)
    pairs and the final (cosine DESC, id ASC) top-k."""
    return f"""
        WITH short AS (
            SELECT query_id, vec_id
            FROM ({_ivfpq_topk_oracle(k=shortlist, nprobe=nprobe,
                                      n_queries=n_queries)})
        ), vexact AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), rescored AS (
            SELECT s.query_id, s.vec_id,
                LIST_COSINE_SIMILARITY(qv.v, cv.v) AS cos
            FROM short s
            JOIN vexact cv ON cv.vec_id = s.vec_id
            JOIN vexact qv ON qv.vec_id = s.query_id
        ), reranked AS (
            SELECT query_id, vec_id, cos,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC
                ) AS INTEGER) AS rank
            FROM rescored
        )
        SELECT query_id, vec_id, ROUND(cos, 4) AS cosine, rank
        FROM reranked WHERE rank <= {k}
    """


ORACLE: dict[str, str] = {
    "sim_lsh_topk": _lsh_topk_oracle(),
    "sim_ivfpq_rerank_topk": _ivfpq_rerank_topk_oracle(),
    "sim_ivf_topk": _ivf_topk_oracle(),
    "sim_recall_eval": _recall_eval_oracle(),
    "sim_bruteforce_topk": _BRUTEFORCE_SQL,
    "sim_pq_topk": _pq_topk_oracle(),
    "sim_ivfpq_topk": _ivfpq_topk_oracle(),
    # Store-served twin: the gate builds the _cell-partitioned store from
    # the same embeddings (seed + two ingest epochs, appends bit-identical
    # to a rebuild) and serves through ivfpq_store_topk, so the expected
    # rows are EXACTLY the full encode+ADC replay over the raw vectors.
    "sim_ivf_store_topk": _ivfpq_topk_oracle(),
}


_BM25_SQL = r"""
    WITH queries(query_id, query_text) AS (
        VALUES (1, 'table scan join'), (2, 'window agg batch'),
               (3, 'customer order part'), (4, 'hash merge value'),
               (5, 'fast slow filter')
    ), toks AS (
        SELECT doc_id,
            UNNEST(LIST_FILTER(
                STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
                x -> x <> '')) AS t
        FROM documents
    ), postings AS (
        SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), dft AS (
        SELECT t, COUNT(*) AS df FROM postings GROUP BY t
    ), stats AS (
        SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
    ), qterms AS (
        SELECT DISTINCT query_id, UNNEST(LIST_FILTER(
            STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(query_text, ''))), '\s+'),
            x -> x <> '')) AS t
        FROM queries
    ), contrib AS (
        SELECT q.query_id, p.doc_id,
            ROUND(
                LN(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
                * (p.tf * 2.2)
                / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)),
                6) AS c
        FROM postings p
        JOIN qterms q ON p.t = q.t
        JOIN dl d ON p.doc_id = d.doc_id
        JOIN dft f ON p.t = f.t
        CROSS JOIN stats s
    ), scored AS (
        SELECT query_id, doc_id, SUM(CAST(c AS DECIMAL(38, 6))) AS s
        FROM contrib GROUP BY query_id, doc_id
    ), ranked AS (
        SELECT query_id, doc_id, s,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, doc_id ASC
            ) AS INTEGER) AS rank
        FROM scored
    )
    SELECT query_id, doc_id, ROUND(CAST(s AS DOUBLE), 4) AS score, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
"""

ORACLE["sim_bm25_topk"] = _BM25_SQL


def _incremental_ann_oracle(
    store_max: int = 400, batch_min: int = 350
) -> str:
    """Replays similarity/pq.py ivfpq_append_batch: batch ids minus store
    ids (the broadcast upsert-skip probe), then the frozen-coarse cell
    argmax and per-subspace PQ code argmin for ONLY the survivors — the
    appended store rows (vec_id, _cell, code_0..code_{M-1})."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import _sqnorms

    cent_values = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(FROZEN_CENTROIDS)
    )
    m = len(FROZEN_PQ_CODEBOOKS)
    d = len(FROZEN_PQ_CODEBOOKS[0][0])
    pq_values = ",\n                ".join(
        "({s}, {j}, [{cv}]::DOUBLE[], {sq})".format(
            s=s, j=j,
            cv=", ".join(repr(x) for x in c),
            sq=repr(sq),
        )
        for s, book in enumerate(FROZEN_PQ_CODEBOOKS)
        for j, (c, sq) in enumerate(zip(book, _sqnorms(book)))
    )
    code_cols = ",\n            ".join(
        f"CAST(MAX(CASE WHEN s = {s} THEN code END) AS INTEGER) AS code_{s}"
        for s in range(m)
    )
    return f"""
        WITH cent(cell, ccv) AS (
            VALUES {cent_values}
        ), pqcent(s, code, cv, sqn) AS (
            VALUES {pq_values}
        ), fresh AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS v
            FROM embeddings b
            WHERE vec_id >= {batch_min}
              AND NOT EXISTS (
                SELECT 1 FROM embeddings s
                WHERE s.vec_id < {store_max} AND s.vec_id = b.vec_id
              )
        ), assigned AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY LIST_COSINE_SIMILARITY(v, ccv) DESC, cell ASC
                ) AS rn
                FROM fresh CROSS JOIN cent
            ) WHERE rn = 1
        ), subs AS (
            SELECT vec_id, s, v[s * {d} + 1 : s * {d} + {d}] AS sub
            FROM fresh CROSS JOIN (SELECT UNNEST(RANGE(0, {m})) AS s)
        ), picked AS (
            SELECT vec_id, s, code FROM (
                SELECT vec_id, p.s, p.code, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, p.s
                    ORDER BY p.sqn - 2 * LIST_INNER_PRODUCT(sub, p.cv), p.code
                ) AS rn
                FROM subs JOIN pqcent p USING (s)
            ) WHERE rn = 1
        ), codesw AS (
            SELECT vec_id,
            {code_cols}
            FROM picked GROUP BY vec_id
        )
        SELECT f.vec_id, CAST(a.cell AS INTEGER) AS _cell, c.* EXCLUDE (vec_id)
        FROM fresh f
        JOIN assigned a USING (vec_id)
        JOIN codesw c USING (vec_id)
        ORDER BY f.vec_id
    """


ORACLE["pipe_incremental_ann_ingest"] = _incremental_ann_oracle()


_HYBRID_RRF_SQL = r"""
    WITH queries AS (
        SELECT doc_id AS query_id, text AS query_text
        FROM documents WHERE doc_id < 5
    ), toks AS (
        SELECT doc_id,
            UNNEST(LIST_FILTER(
                STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
                x -> x <> '')) AS t
        FROM documents
    ), postings AS (
        SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), dft AS (
        SELECT t, COUNT(*) AS df FROM postings GROUP BY t
    ), stats AS (
        SELECT COUNT(*) AS n, SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl
    ), qterms AS (
        SELECT DISTINCT query_id, UNNEST(LIST_FILTER(
            STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(query_text, ''))), '\s+'),
            x -> x <> '')) AS t
        FROM queries
    ), contrib AS (
        SELECT q.query_id, p.doc_id,
            ROUND(
                LN(1.0 + (s.n - f.df + 0.5) / (f.df + 0.5))
                * (p.tf * 2.2)
                / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)),
                6) AS c
        FROM postings p
        JOIN qterms q ON p.t = q.t AND p.doc_id <> q.query_id
        JOIN dl d ON p.doc_id = d.doc_id
        JOIN dft f ON p.t = f.t
        CROSS JOIN stats s
    ), lexscored AS (
        SELECT query_id, doc_id, SUM(CAST(c AS DECIMAL(38, 6))) AS s
        FROM contrib GROUP BY query_id, doc_id
    ), lexranked AS (
        SELECT query_id, doc_id,
            ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, doc_id ASC
            ) AS rank
        FROM lexscored
    ), qv AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 5
    ), cv AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), semscored AS (
        SELECT q.query_id, c.vec_id AS doc_id,
            LIST_COSINE_SIMILARITY(q.v, c.v) AS cos
        FROM cv c CROSS JOIN qv q
        WHERE c.vec_id <> q.query_id
    ), semranked AS (
        SELECT query_id, doc_id,
            ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cos DESC, doc_id ASC
            ) AS rank
        FROM semscored
    ), fuse AS (
        SELECT query_id, doc_id, rank FROM lexranked WHERE rank <= 10
        UNION ALL
        SELECT query_id, doc_id, rank FROM semranked WHERE rank <= 10
    ), contribs AS (
        SELECT query_id, doc_id,
            CAST(ROUND(1.0 / (60.0 + rank), 6) AS DECIMAL(38, 6)) AS c
        FROM fuse
    ), fused AS (
        SELECT query_id, doc_id, SUM(c) AS s,
            CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM contribs GROUP BY query_id, doc_id
    ), ranked AS (
        SELECT query_id, doc_id, s, n_lists,
            CAST(ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY s DESC, doc_id ASC
            ) AS INTEGER) AS rank
        FROM fused
    )
    SELECT query_id, doc_id, ROUND(CAST(s AS DOUBLE), 6) AS rrf_score,
        n_lists, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
"""

ORACLE["sim_hybrid_rrf_topk"] = _HYBRID_RRF_SQL
