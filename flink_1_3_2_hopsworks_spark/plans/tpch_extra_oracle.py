"""DuckDB oracle SQL for the additional TPC-H-style plans."""

ORACLE: dict[str, str] = {
    "q7_volume_shipping": """
        SELECT
            n1.n_name AS cust_nation,
            n2.n_name AS supp_nation,
            CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q14_promo_revenue": """
        SELECT
            ROUND(
                100.0 * SUM(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1.0 - l_discount)
                            ELSE 0.0 END)
                / SUM(l_extendedprice * (1.0 - l_discount)),
            4) AS promo_revenue_pct
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q16_supplier_cnt": """
        SELECT
            p_brand,
            p_type,
            p_size,
            CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 5, 10, 15)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        SELECT
            ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (
              SELECT 0.5 * AVG(l2.l_quantity)
              FROM lineitem l2
              WHERE l2.l_partkey = lineitem.l_partkey
          )
    """,
    "q22_global_sales_opportunity": """
        SELECT
            c_nationkey,
            COUNT(*) AS numcust,
            ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
}
