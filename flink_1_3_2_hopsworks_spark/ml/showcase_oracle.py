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
