"""DuckDB oracle SQL for the operator showcase queries."""

ORACLE: dict[str, str] = {
    "op_outer_join": """
        SELECT
            COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
            COALESCE(c.n_customers, 0) AS n_customers,
            COALESCE(s.n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
          ON c.c_nationkey = s.s_nationkey
    """,
    "op_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        )
    """,
    "op_anti_join": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
        )
    """,
    "op_cross_join": """
        SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    "op_cogroup": """
        SELECT
            COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
            COALESCE(c.n_customers, 0) AS n_customers,
            COALESCE(s.n_suppliers, 0) AS n_suppliers,
            ROUND(GREATEST(
                COALESCE(c.max_bal, -1e308), COALESCE(s.max_bal, -1e308)
            ), 2) AS best_acctbal
        FROM (SELECT c_nationkey, COUNT(*) AS n_customers, MAX(c_acctbal) AS max_bal
              FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers, MAX(s_acctbal) AS max_bal
                   FROM supplier GROUP BY 1) s
          ON c.c_nationkey = s.s_nationkey
    """,
    "op_grouping_sets": """
        SELECT
            o_orderstatus,
            o_orderpriority,
            COUNT(*) AS n_orders,
            ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "op_rollup": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "op_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "op_max_by": """
        SELECT c_mktsegment, ROUND(c_acctbal, 2) AS best_acctbal, c_custkey, c_name
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey DESC
            ) AS rn
            FROM customer
        )
        WHERE rn = 1
    """,
    "op_min_by": """
        SELECT s_nationkey, ROUND(s_acctbal, 2) AS worst_acctbal, s_suppkey, s_name
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY s_nationkey
                ORDER BY s_acctbal ASC, s_suppkey ASC
            ) AS rn
            FROM supplier
        )
        WHERE rn = 1
    """,
    "op_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "op_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "op_intersect": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    "op_minus": """
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    "op_first_n_per_group": """
        SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderstatus
                ORDER BY o_totalprice DESC, o_orderkey ASC
            ) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    "op_top_k": """
        SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 15
    """,
    "op_over_rows_moving_sum": """
        SELECT
            o_custkey,
            o_orderkey,
            ROUND(SUM(o_totalprice) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
            ), 2) AS moving_sum
        FROM orders
    """,
    "op_over_range_trailing": """
        SELECT
            o_custkey,
            o_orderkey,
            COUNT(*) OVER (
                PARTITION BY o_custkey
                ORDER BY CAST(EPOCH(o_orderdate) AS BIGINT) ASC
                RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
            ) AS orders_30d
        FROM orders
    """,
    "op_over_unbounded_running": """
        SELECT
            o_custkey,
            o_orderkey,
            ROUND(SUM(o_totalprice) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ), 2) AS running_total
        FROM orders
    """,
    "op_ranking_functions": """
        SELECT * FROM (
            SELECT
                c_mktsegment,
                c_custkey,
                CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
                CAST(RANK() OVER w AS INTEGER) AS rnk,
                CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
                LAG(c_custkey, 1) OVER w AS prev_cust,
                LEAD(c_custkey, 1) OVER w AS next_cust
            FROM customer
            WINDOW w AS (
                PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey ASC
            )
        ) WHERE rn <= 10
    """,
    "op_zip_with_index": """
        SELECT
            n_nationkey,
            n_name,
            CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1 AS BIGINT) AS idx
        FROM nation
    """,
    "op_delta_iteration": """
        WITH RECURSIVE base AS (
            SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey < 200 AND l_quantity >= 49.5
        ), sym AS (
            SELECT c AS src, s AS dst FROM base
            UNION ALL
            SELECT s AS src, c AS dst FROM base
        ), reach(id, d) AS (
            SELECT (SELECT MIN(c) FROM base), 0
            UNION
            SELECT sym.dst, reach.d + 1
            FROM reach JOIN sym ON sym.src = reach.id
            WHERE reach.d < 60
        )
        SELECT id, CAST(MIN(d) AS BIGINT) AS hops
        FROM reach
        GROUP BY id
        ORDER BY id
    """,
    "op_split_select": """
        SELECT event_id, event_type, 'high' AS route, value
        FROM events WHERE value >= 75.0
        UNION ALL
        SELECT event_id, event_type, 'low' AS route, value
        FROM events WHERE value < 25.0
    """,
    "op_join_with_tiny": """
        SELECT n_name,
            CAST(COUNT(*) AS BIGINT) AS n_suppliers,
            CAST(ROUND(SUM(s_acctbal), 2) AS DOUBLE) AS total_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "ds_chain_revenue": """
        SELECT c_nationkey,
            CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS total_revenue,
            STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS first_orderdate
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_nationkey
    """,
    "op_bulk_iteration": """
        WITH base AS (
            SELECT l_orderkey, l_linenumber,
                CAST(l_extendedprice AS DOUBLE) AS v,
                CAST(l_extendedprice AS DOUBLE) AS x
            FROM lineitem
        ), s1 AS (
            SELECT l_orderkey, l_linenumber, v, (x + v / x) / 2 AS x FROM base
        ), s2 AS (
            SELECT l_orderkey, l_linenumber, v, (x + v / x) / 2 AS x FROM s1
        ), s3 AS (
            SELECT l_orderkey, l_linenumber, v, (x + v / x) / 2 AS x FROM s2
        )
        SELECT l_orderkey, l_linenumber, ROUND(x, 4) AS newton_sqrt
        FROM s3
        ORDER BY l_orderkey, l_linenumber
        LIMIT 5000
    """,
    "op_intersect_all": """
        WITH i AS (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM i GROUP BY nationkey
    """,
    "op_minus_all": """
        WITH m AS (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM m GROUP BY nationkey
    """,
    "op_join_with_huge": """
        SELECT n_name,
            CAST(COUNT(*) AS BIGINT) AS n_customers,
            CAST(ROUND(SUM(c_acctbal), 2) AS DOUBLE) AS total_acctbal
        FROM nation JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_name
    """,
    "op_percentiles": """
        SELECT event_type,
            CAST(ROUND(QUANTILE_CONT(value, 0.5), 4) AS DOUBLE) AS p50,
            CAST(ROUND(QUANTILE_CONT(value, 0.9), 4) AS DOUBLE) AS p90,
            CAST(ROUND(QUANTILE_CONT(value, 0.99), 4) AS DOUBLE) AS p99
        FROM events
        GROUP BY event_type
    """,
    "op_histogram": """
        SELECT
            CAST(LEAST(FLOOR((CAST(l_quantity AS DOUBLE) - 1.0) / 5.0), 9)
                AS BIGINT) AS bucket,
            CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY 1
        ORDER BY bucket
    """,
    "op_asof_join": """
        WITH c AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, ts, event_id, value FROM events
            WHERE event_type = 'purchase'
        ), ranked AS (
            SELECT c.event_id AS ce, p.event_id AS pe, p.value AS pv,
                ROW_NUMBER() OVER (
                    PARTITION BY c.user_id, c.event_id
                    ORDER BY p.ts DESC, p.event_id DESC
                ) AS rn
            FROM c JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
        )
        SELECT c.user_id,
            STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
            c.event_id,
            r.pe AS last_event_id,
            ROUND(r.pv, 2) AS last_value
        FROM c
        LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON r.ce = c.event_id
    """,
    "op_interval_join": """
        WITH c AS (
            SELECT user_id, ts AS c_ts, event_id AS click_id FROM events
            WHERE event_type = 'click'
        ), p AS (
            SELECT user_id, ts AS p_ts, event_id AS purchase_id FROM events
            WHERE event_type = 'purchase'
        )
        SELECT c.user_id, click_id, purchase_id,
            STRFTIME(c_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
            STRFTIME(p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
        FROM c JOIN p ON p.user_id = c.user_id
            AND p_ts >= c_ts - INTERVAL 15 MINUTE
            AND p_ts <= c_ts + INTERVAL 15 MINUTE
    """,
    "op_range_band_join": """
        WITH bands AS (
            SELECT r AS band_id, r * 10000.0 AS lo, (r + 1) * 10000.0 AS hi
            FROM RANGE(0, 12) t(r)
        )
        SELECT band_id, lo, hi,
            CAST(COUNT(*) AS BIGINT) AS n_items,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DOUBLE)), 2) AS DOUBLE)
                AS total_price
        FROM lineitem
        JOIN bands ON CAST(l_extendedprice AS DOUBLE) >= lo
                  AND CAST(l_extendedprice AS DOUBLE) < hi
        GROUP BY band_id, lo, hi
    """,
    "op_group_reduce_stats": """
        SELECT event_type,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(ROUND(MIN(value), 2) AS DOUBLE) AS min_value,
            CAST(ROUND(MAX(value), 2) AS DOUBLE) AS max_value,
            CAST(ROUND(MEDIAN(value), 4) AS DOUBLE) AS median_value
        FROM events
        GROUP BY event_type
    """,
    "op_weighted_sample": """
        WITH keyed AS (
            SELECT doc_id, n_chars,
                LN(
                    (('0x' || SUBSTR(MD5(CONCAT_WS('|',
                        CAST(doc_id AS VARCHAR), 'wq0')), 1, 8))::BIGINT + 1)
                    / 4294967296.0
                ) / CAST(n_chars AS DOUBLE) AS k
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
        )
        SELECT doc_id, n_chars FROM (
            SELECT doc_id, n_chars FROM keyed
            ORDER BY k DESC, doc_id LIMIT 50
        ) ORDER BY doc_id
    """,
    "op_stratified_sample": """
        SELECT event_id, user_id, event_type
        FROM (
            SELECT event_id, user_id, event_type,
                ROW_NUMBER() OVER (
                    PARTITION BY event_type
                    ORDER BY MD5(CONCAT_WS('|', CAST(event_id AS VARCHAR), 's42'))
                ) AS rn
            FROM events
        )
        WHERE rn <= 100
    """,
    "op_sample_fixed_size": """
        SELECT event_id, user_id, event_type
        FROM events
        ORDER BY MD5(CONCAT_WS('|', CAST(event_id AS VARCHAR), 's42'))
        LIMIT 200
    """,
    "op_summarize": """
        SELECT 'l_orderkey' AS column, CAST(COUNT(l_orderkey) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
            CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
            CAST(MAX(l_orderkey) AS VARCHAR) AS max_value,
            CAST(ROUND(AVG(l_orderkey), 4) AS DOUBLE) AS mean
        FROM lineitem
        UNION ALL
        SELECT 'l_linenumber', CAST(COUNT(l_linenumber) AS BIGINT),
            CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            CAST(MIN(l_linenumber) AS VARCHAR),
            CAST(MAX(l_linenumber) AS VARCHAR),
            CAST(ROUND(AVG(l_linenumber), 4) AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', CAST(COUNT(l_quantity) AS BIGINT),
            CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
            CAST(MIN(l_quantity) AS VARCHAR),
            CAST(MAX(l_quantity) AS VARCHAR),
            CAST(ROUND(AVG(l_quantity), 4) AS DOUBLE)
        FROM lineitem
    """,
    "op_salted_aggregate": """
        SELECT l_returnflag,
            SUM(l_quantity) AS sum_qty,
            CAST(COUNT(l_quantity) AS BIGINT) AS n_rows,
            MAX(l_extendedprice) AS max_price,
            MIN(l_discount) AS min_disc
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "op_salted_join": """
        SELECT s.s_nationkey,
            SUM(l.l_quantity) AS sum_qty,
            CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey
    """,
    "op_kmv_distinct": """
        WITH hashes AS (
            SELECT DISTINCT ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                CAST(o_custkey AS VARCHAR), 'kmv42')), 1, 8))::BIGINT AS h
            FROM orders
        ), sketch AS (SELECT h FROM hashes ORDER BY h LIMIT 256)
        SELECT CAST(256 AS INTEGER) AS k,
            CAST(COUNT(*) AS BIGINT) AS n_sketch,
            MAX(h) AS kth_hash,
            ROUND(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE 255.0 * 4294967296.0 / MAX(h) END, 4) AS est_distinct
        FROM sketch
    """,
    "op_sampled_percentiles": """
        SELECT l_returnflag,
            CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25,
            CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS DOUBLE) AS p50,
            CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS DOUBLE) AS p75,
            CAST(ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS DOUBLE) AS p90
        FROM lineitem
        WHERE ('0x' || SUBSTR(MD5(CONCAT_WS('|',
                CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
                'sp42')), 1, 8))::BIGINT < 429496729
        GROUP BY l_returnflag
    """,
    "op_bloom_filter_join": """
        SELECT s.s_nationkey,
            SUM(l.l_quantity) AS sum_qty,
            CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN (SELECT s_suppkey, s_nationkey FROM supplier
              WHERE s_acctbal > 9000) s
          ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey
    """,
}

def _cms_oracle(depth: int = 4, width: int = 1024, salt: str = "cms42") -> str:
    """Replays operators/sketches.py cms_build + cms_estimate over
    events.user_id with the true top-10 as candidates."""
    bucket = (
        "('0x' || SUBSTR(MD5(CONCAT_WS('|', CAST(user_id AS VARCHAR), "
        "'{salt}|' || CAST(j AS VARCHAR))), 1, 8))::BIGINT % {width}"
    ).format(salt=salt, width=width)
    return f"""
        WITH probes AS (
            SELECT user_id, j, {bucket} AS bucket
            FROM events, UNNEST(RANGE(0, {depth})) t(j)
        ), sketch AS (
            SELECT j AS row, bucket, COUNT(*) AS n
            FROM probes GROUP BY j, bucket
        ), exact AS (
            SELECT user_id, COUNT(*) AS exact_n
            FROM events GROUP BY user_id
            ORDER BY exact_n DESC, user_id ASC LIMIT 10
        ), cand AS (
            SELECT e.user_id, j, {bucket.replace("user_id", "e.user_id")} AS bucket
            FROM exact e, UNNEST(RANGE(0, {depth})) t(j)
        )
        SELECT c.user_id, e.exact_n, MIN(COALESCE(s.n, 0)) AS est_n
        FROM cand c
        JOIN exact e USING (user_id)
        LEFT JOIN sketch s ON s.row = c.j AND s.bucket = c.bucket
        GROUP BY c.user_id, e.exact_n
    """


ORACLE["op_heavy_hitters_cms"] = _cms_oracle()
