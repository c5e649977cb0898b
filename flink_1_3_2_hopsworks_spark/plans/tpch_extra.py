"""Additional TPC-H-style plans (Q7/Q14/Q15/Q16/Q17/Q22 analogues), adapted
to the corpus schema (no partsupp/shipmode/phone columns).

Reference parity: the reference's batch SQL surface (SURVEY.md §2.4/§2.3) —
multi-way joins, conditional aggregation, count-distinct, scalar subqueries
via single-row join (flink-table DataSetSingleRowJoin.scala), correlated
aggregates decorrelated to joins, and anti-join rewrites of NOT EXISTS.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analogue: revenue between two customer/supplier nation pairs per
    year — two dimension joins against nation plus a pair predicate."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    # The OR-pair predicate can't push below the nation joins, so pre-filter
    # BOTH dimension sides to the two nations of interest before touching the
    # fact tables — the fact joins then carry only in-scope customers and
    # suppliers (Catalyst can't infer this pushdown through the OR itself).
    wanted = ["NATION_1", "NATION_2"]
    pair_filter = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | (
        (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n1.filter(F.col("cust_nation").isin(wanted))),
        F.col("c_nationkey") == F.col("c_nkey"),
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n2.filter(F.col("supp_nation").isin(wanted))),
        F.col("s_nationkey") == F.col("s_nkey"),
    )
    # customer/supplier scale with SF — no broadcast hint (AQE broadcasts
    # them when the nation filter leaves them under the threshold).
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(pair_filter)
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share — conditional aggregation over a fact⋈dim
    join, single-row output."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = _revenue()
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with maximum quarterly revenue — aggregate, then a
    single-row join against the max (reference DataSetSingleRowJoin)."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analogue: distinct suppliers per (brand, type, size-bucket) via
    the lineitem bridge — COUNT(DISTINCT) after a join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 10, 15))
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from lineitems below half their part's average quantity
    — correlated scalar subquery decorrelated into a join."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analogue: per nation, customers with above-average balance and no
    orders in 1995 — scalar-subquery filter + anti join + aggregation.
    (Time-scoped anti join: in this corpus every customer has *some* order,
    so the unscoped variant would select nothing.)"""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
