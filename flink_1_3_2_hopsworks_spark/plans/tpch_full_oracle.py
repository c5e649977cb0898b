"""DuckDB oracle SQL for the remaining TPC-H analogue plans (tpch_full)."""

ORACLE: dict[str, str] = {
    "q2_min_cost_supplier": """
        WITH euro_supplier AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), cost AS (
            SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            JOIN euro_supplier ON l_suppkey = s_suppkey
            JOIN part ON l_partkey = p_partkey
            WHERE p_type = 'LARGE' AND p_size <= 5
            GROUP BY 1, 2, 3, 4, 5
        )
        SELECT
            ROUND(s_acctbal, 2) AS s_acctbal,
            s_name,
            n_name,
            p_partkey,
            s_suppkey,
            ROUND(unit_cost, 4) AS unit_cost
        FROM cost
        WHERE unit_cost = (
            SELECT MIN(unit_cost) FROM cost c2 WHERE c2.p_partkey = cost.p_partkey
        )
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
        LIMIT 100
    """,
    "q8_national_market_share": """
        SELECT
            CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
            ROUND(
                SUM(CASE WHEN n2.n_name = 'NATION_1'
                    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
                / SUM(l_extendedprice * (1.0 - l_discount)),
            4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY'
          AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
        ORDER BY 1
    """,
    "q9_product_type_profit": """
        SELECT
            n_name AS nation,
            CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)
                      - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'STANDARD'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "q11_important_stock": """
        WITH per_part AS (
            SELECT l_partkey, SUM(l_extendedprice) AS part_value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY 1
        )
        SELECT l_partkey, ROUND(part_value, 2) AS part_value
        FROM per_part
        WHERE part_value > (SELECT SUM(part_value) * 0.001 FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
    "q12_shipping_delay": """
        SELECT
            o_orderstatus,
            CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
            CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE DATEDIFF('day', o_orderdate, l_shipdate) >= 60
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN (
                SELECT * FROM orders WHERE o_orderpriority <> '5-LOW'
            ) o ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q19_discounted_revenue": """
        SELECT
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q20_potential_part_promotion": """
        WITH per_ps AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_type = 'PROMO'
              AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY 1, 2
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM (
                SELECT l_suppkey, qty,
                       SUM(qty) OVER (PARTITION BY l_partkey) * 0.5 AS half_qty
                FROM per_ps
            ) WHERE qty > half_qty
        )
        ORDER BY s_suppkey
    """,
    "q21_suppliers_kept_orders_waiting": """
        WITH per_os AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) > 90
                       THEN 1 ELSE 0 END) AS late
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2
        ), flagged AS (
            SELECT l_suppkey FROM (
                SELECT l_suppkey, late,
                       COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                       SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
                FROM per_os
            ) WHERE late = 1 AND n_supp > 1 AND n_late = 1
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM flagged
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
}
