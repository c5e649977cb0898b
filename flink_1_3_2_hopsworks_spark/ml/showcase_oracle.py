"""DuckDB oracle SQL for the FlinkML showcase queries."""

ORACLE: dict[str, str] = {
    "ml_linreg_price": """
        SELECT
            ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
            ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept
        FROM lineitem
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
