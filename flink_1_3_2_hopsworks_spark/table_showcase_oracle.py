"""DuckDB oracles for table_showcase.py (Table API facade gates)."""

ORACLE = {
    "tbl_sql_region_year_revenue": """
        SELECT
            r.r_name AS region,
            CAST(YEAR(o.o_orderdate) AS INTEGER) AS order_year,
            COUNT(*) AS n_orders,
            ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, YEAR(o.o_orderdate)
    """,
    "tbl_expr_priority_stats": """
        SELECT
            o_orderpriority,
            COUNT(*) AS n_orders,
            ROUND(AVG(o_totalprice), 4) AS avg_price,
            ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "tbl_tumble_daily_by_type": """
        SELECT
            STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
            STRFTIME(DATE_TRUNC('day', ts) + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS w_end,
            event_type,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "tbl_slide_6h_2h_by_type": """
        WITH starts AS (
            SELECT
                UNNEST([
                    TIME_BUCKET(INTERVAL 2 HOUR, ts),
                    TIME_BUCKET(INTERVAL 2 HOUR, ts) - INTERVAL 2 HOUR,
                    TIME_BUCKET(INTERVAL 2 HOUR, ts) - INTERVAL 4 HOUR
                ]) AS ws,
                event_type,
                value
            FROM events
        )
        SELECT
            STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS w_start,
            STRFTIME(ws + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS w_end,
            event_type,
            COUNT(*) AS n_events,
            ROUND(SUM(value), 2) AS total_value
        FROM starts
        GROUP BY 1, 2, 3
    """,
    "tbl_session_30m_by_user": """
        WITH marked AS (
            SELECT
                user_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        sessions AS (
            SELECT
                user_id, ts,
                SUM(brk) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS sid
            FROM marked
        )
        SELECT
            STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS w_start,
            STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS w_end,
            user_id,
            COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, sid
    """,
    "tbl_over_running_revenue": """
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
    "tbl_offset_fetch": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20 OFFSET 40
    """,
}
