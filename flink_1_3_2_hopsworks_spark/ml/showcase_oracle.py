"""DuckDB oracle SQL for the FlinkML showcase queries."""

ORACLE: dict[str, str] = {
    "ml_linreg_price": """
        SELECT
            ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
            ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept
        FROM lineitem
    """,
    "ml_knn_neighbors": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE vec_id < 5
        ), t AS (
            SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS tv
            FROM embeddings WHERE vec_id >= 5
        ), pairs AS (
            SELECT query_id, neighbor_id, LIST_DISTANCE(qv, tv) AS d
            FROM q CROSS JOIN t
        ), ranked AS (
            SELECT query_id, neighbor_id, d,
                CAST(ROW_NUMBER() OVER (
                    PARTITION BY query_id ORDER BY d ASC, neighbor_id ASC
                ) AS INTEGER) AS rank
            FROM pairs
        )
        SELECT query_id, neighbor_id,
            ROUND(ROUND(d, 6), 4) AS distance, rank
        FROM ranked WHERE rank <= 5
    """,
    "ml_minmax_price": """
        SELECT
            l_orderkey,
            l_linenumber,
            ROUND(
                (l_extendedprice - MIN(l_extendedprice) OVER ())
                / (MAX(l_extendedprice) OVER () - MIN(l_extendedprice) OVER ()),
                4
            ) AS scaled_price
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 5000
    """,
    "ml_poly_features": """
        SELECT
            l_orderkey,
            l_linenumber,
            ROUND(CAST(l_quantity AS DOUBLE), 4) AS x,
            ROUND(CAST(l_quantity AS DOUBLE) * l_quantity, 4) AS x2,
            ROUND(CAST(l_discount AS DOUBLE), 4) AS y,
            ROUND(CAST(l_quantity AS DOUBLE) * l_discount, 4) AS xy,
            ROUND(CAST(l_discount AS DOUBLE) * l_discount, 4) AS y2
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 2000
    """,
    "ml_scaled_quantity": """
        SELECT
            l_orderkey,
            l_linenumber,
            ROUND(
                (l_quantity - AVG(l_quantity) OVER ())
                / STDDEV_SAMP(l_quantity) OVER (),
                4
            ) AS scaled_quantity
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
        LIMIT 5000
    """,
}


def _kmeans_oracle(iterations: int = 3, round_dp: int = 6) -> str:
    """Replays ml/kmeans.py spherical_kmeans_fit + assign: per iteration
    the cosine-argmax assignment (ties -> lower cell, the SemDeDup/IVF
    oracle pattern), per-cell per-dim means, L2 normalization, and the
    round-to-6dp quantization; empty/zero-norm cells keep the previous
    centroid. AS MATERIALIZED on every CTE (DuckDB default inlining
    re-expands each round exponentially)."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
    )

    dim = len(FROZEN_CENTROIDS[0])
    init = ",\n                ".join(
        "({}, [{}]::DOUBLE[])".format(i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(FROZEN_CENTROIDS)
    )
    avgs = ", ".join(f"AVG(v[{d + 1}])" for d in range(dim))
    ctes = [
        f"""cent0(cell, cv) AS MATERIALIZED (
            VALUES {init}
        )""",
        """vecs AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        )""",
    ]
    for i in range(iterations):
        ctes.append(f"""a{i} AS MATERIALIZED (
            SELECT vec_id, v, cell FROM (
                SELECT vec_id, v, cell, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY LIST_COSINE_SIMILARITY(v, cv) DESC, cell ASC
                ) AS rn
                FROM vecs CROSS JOIN cent{i}
            ) WHERE rn = 1
        )""")
        ctes.append(f"""m{i + 1} AS MATERIALIZED (
            SELECT cell, [{avgs}]::DOUBLE[] AS mv
            FROM a{i} GROUP BY cell
        )""")
        ctes.append(f"""cent{i + 1}(cell, cv) AS MATERIALIZED (
            SELECT p.cell,
                CASE WHEN m.mv IS NULL
                          OR LIST_INNER_PRODUCT(m.mv, m.mv) = 0 THEN p.cv
                     ELSE LIST_TRANSFORM(m.mv, x ->
                          ROUND(x / SQRT(LIST_INNER_PRODUCT(m.mv, m.mv)),
                                {round_dp}))
                END AS cv
            FROM cent{i} p LEFT JOIN m{i + 1} m USING (cell)
        )""")
    final = f"cent{iterations}"
    return f"""
        WITH {", ".join(ctes)},
        fin AS (
            SELECT vec_id, cell, ROUND(LIST_COSINE_SIMILARITY(v, cv), 4)
                AS cosine
            FROM (
                SELECT vec_id, v, cell, cv, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY LIST_COSINE_SIMILARITY(v, cv) DESC, cell ASC
                ) AS rn
                FROM vecs CROSS JOIN {final}
            ) WHERE rn = 1
        )
        SELECT vec_id, cell, cosine FROM fin ORDER BY vec_id
    """


ORACLE["ml_kmeans_spherical"] = _kmeans_oracle()


def bpe_cte(num_merges: int) -> str:
    """Unrolled BPE-training CTE prefix (no leading WITH): words0 is the
    corpus word-frequency table with character-split sequences; each round
    materializes the weighted pair counts, the argmax merge rule
    (ties: lexicographic on (l, r)), and the merged vocabulary — the
    double-space REPLACE reproduces BPE's left-to-right non-overlapping
    merge exactly (see ml/bpe.py). Every CTE is MATERIALIZED: DuckDB's
    default inlining re-expands each round ~3x."""
    parts = [r"""words0 AS MATERIALIZED (
        SELECT t AS word, COUNT(*) AS freq,
            TRIM(REGEXP_REPLACE(t, '(.)', '\1 ', 'g')) AS seq
        FROM (SELECT UNNEST(LIST_FILTER(
                STRING_SPLIT_REGEX(LOWER(TRIM(COALESCE(text, ''))), '\s+'),
                x -> x <> '')) AS t
              FROM documents)
        GROUP BY t
    )"""]
    for i in range(1, num_merges + 1):
        parts.append(f"""pairs{i} AS MATERIALIZED (
        SELECT w.sy[u.i] AS l, w.sy[u.i + 1] AS r, SUM(w.freq) AS cnt
        FROM (SELECT freq, STRING_SPLIT(seq, ' ') AS sy FROM words{i - 1}) w,
             UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w.sy) - 1, 0))) AS u(i)
        GROUP BY 1, 2
    )""")
        parts.append(f"""best{i} AS MATERIALIZED (
        SELECT l, r, l || r AS merged, cnt
        FROM pairs{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
    )""")
        parts.append(f"""words{i} AS MATERIALIZED (
        SELECT w.word, w.freq,
            TRIM(REGEXP_REPLACE(
                REPLACE(' ' || REPLACE(w.seq, ' ', '  ') || ' ',
                        ' ' || b.l || '  ' || b.r || ' ',
                        ' ' || b.merged || ' '),
                ' +', ' ', 'g')) AS seq
        FROM words{i - 1} w CROSS JOIN best{i} b
    )""")
    return ",\n".join(parts)


def _bpe_train_oracle(num_merges: int = 6) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, l AS left_sym, r AS right_sym, merged,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, num_merges + 1)
    )
    return f"WITH {bpe_cte(num_merges)}\n{union}\nORDER BY step"


ORACLE["ml_bpe_train"] = _bpe_train_oracle()
