"""DuckDB oracle SQL for the TPC-H-style plans.

One ANSI-SQL string per query in ``plans.tpch``, runnable by DuckDB against
the same parquet tables (registered as views). Aliases, rounding and date
formatting match the Spark plans exactly — the driver hashes values after
sorting columns by name, so both sides must emit identical names and values.
"""

ORACLE: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT
            l_returnflag,
            l_linestatus,
            ROUND(SUM(l_quantity), 2) AS sum_qty,
            ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
            ROUND(AVG(l_quantity), 2) AS avg_qty,
            ROUND(AVG(l_extendedprice), 2) AS avg_price,
            ROUND(AVG(l_discount), 4) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT
            l_orderkey,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
            STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
            o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT
            n_name,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q6_forecast_revenue": """
        SELECT
            ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": """
        SELECT
            c_custkey,
            c_name,
            revenue,
            acctbal,
            n_name,
            c_mktsegment
        FROM (
            SELECT
                c_custkey,
                c_name,
                ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
                ROUND(c_acctbal, 2) AS acctbal,
                n_name,
                c_mktsegment
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
        )
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q4_order_priority": """
        SELECT
            o_orderpriority,
            COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1996-10-01 00:00:00'
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q18_large_volume_customer": """
        SELECT
            c_name,
            c_custkey,
            o_orderkey,
            STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
            ROUND(o_totalprice, 2) AS totalprice,
            ROUND(total_qty, 2) AS total_qty
        FROM (
            SELECT l_orderkey, SUM(l_quantity) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 150
        ) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
}
