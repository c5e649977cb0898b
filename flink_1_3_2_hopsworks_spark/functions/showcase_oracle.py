"""DuckDB oracle SQL for the function-surface showcase queries."""

ORACLE: dict[str, str] = {
    "fn_string_ops": """
        SELECT
            c_custkey,
            CAST(LENGTH(c_name) AS INTEGER) AS name_len,
            UPPER(c_mktsegment) AS seg_upper,
            LOWER(c_name) AS name_lower,
            SUBSTRING(c_name, 1, 8) AS name_prefix,
            CAST(STRPOS(c_name, '1') AS INTEGER) AS pos_one,
            c_mktsegment || '#' || c_name AS tagged,
            c_name LIKE '%5%' AS has_five,
            TRIM('  ' || c_mktsegment || '  ') AS trimmed
        FROM customer
    """,
    "fn_math_ops": """
        SELECT
            s_suppkey,
            ROUND(ABS(s_acctbal), 2) AS abs_bal,
            CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
            CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
            ROUND(SQRT(ABS(s_acctbal)), 4) AS sqrt_bal,
            ROUND(LN(ABS(s_acctbal) + 1.0), 4) AS ln_bal,
            ROUND(LOG10(ABS(s_acctbal) + 1.0), 4) AS log10_bal,
            ROUND(POWER(1.01, s_nationkey), 4) AS pow_nk,
            s_suppkey % 7 AS mod7
        FROM supplier
    """,
    "fn_temporal_ops": """
        SELECT
            o_orderkey,
            CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
            CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
            CAST(QUARTER(o_orderdate) AS INTEGER) AS o_quarter,
            CAST(DAY(o_orderdate) AS INTEGER) AS o_day,
            STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_floor,
            STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d
        FROM orders
    """,
    "fn_case_when": """
        SELECT
            CASE WHEN o_totalprice > 300000 THEN 'big'
                 WHEN o_totalprice > 100000 THEN 'mid'
                 ELSE 'small' END AS bucket,
            o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
            COUNT(*) AS n_orders,
            ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders
        GROUP BY 1, 2
    """,
    "fn_json_ops": """
        SELECT
            event_type,
            COUNT(*) AS n_events,
            ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
            MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
    """,
    "fn_array_ops": """
        SELECT
            vec_id,
            CAST(LEN(embedding) AS INTEGER) AS dim,
            ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
            ROUND(CAST(embedding[-1] AS DOUBLE), 4) AS last_val
        FROM embeddings
    """,
    "fn_native_extras": """
        SELECT
            n_nationkey,
            MD5(n_name) AS name_md5,
            SHA256(n_name) AS name_sha256,
            COALESCE(REGEXP_EXTRACT(n_name, '([0-9]+)', 1), '') AS name_digits,
            LPAD(n_name, 12, '*') AS padded_l,
            RPAD(n_name, 12, '*') AS padded_r,
            TRANSLATE(n_name, '_', '-') AS translated,
            REVERSE(n_name) AS reversed,
            REPEAT('ab', 3) AS repeated,
            ROUND(SIN(n_nationkey), 6) AS sin_k,
            ROUND(COS(n_nationkey), 6) AS cos_k,
            ROUND(ATAN2(n_nationkey, 2.0), 6) AS atan2_k,
            ROUND(DEGREES(n_nationkey), 4) AS deg_k
        FROM nation
    """,
    "fn_rich_broadcast_lookup": """
        SELECT s_suppkey, n_name AS nation_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
    "fn_udf_scalar": """
        SELECT
            l_returnflag,
            ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_disc_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "fn_udaf_grouped": """
        SELECT
            l_returnflag,
            ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS w_avg_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "fn_udtf_lateral": """
        SELECT token, COUNT(*) AS n
        FROM (
            SELECT UNNEST(STRING_SPLIT(o_orderpriority, '-')) AS token
            FROM orders
        )
        GROUP BY token
    """,
}
