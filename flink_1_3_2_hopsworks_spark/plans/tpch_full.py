"""Remaining TPC-H query analogues (q2, q8, q9, q11, q12, q13, q19, q20, q21).

The reference ships TPC-H Q3/Q10 as examples
(flink-examples-batch/.../relational/TPCHQuery3.java, TPCHQuery10.java) and
its Table/SQL surface can express the full suite; these plans complete the
22-query family over this corpus's simplified star schema. Where a classic
column is absent (partsupp, l_commitdate/l_receiptdate, p_container,
comments), the analogue keeps the ORIGINAL's operator shape — min-per-group
join-back, OR-of-ANDs pushdown, exists/not-exists, two-level aggregation —
over the columns that exist.

Scale notes (100 TB posture):
  - Constant-size dims (region, nation) and single-row aggregates get
    explicit ``F.broadcast``; customer/supplier/part scale with SF and are
    left to AQE's size-based broadcast.
  - Per-group extrema use ONE shuffle (window over the group key) instead of
    agg + self-join where the window and output partitioning coincide.
  - Filters and projections sit directly on the scans so pushdown reaches
    parquet (PushedFilters / ReadSchema).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_1_3_2_hopsworks_spark.catalog import load_table

def _rev():
    # Lazy: building Columns at import time requires an active
    # SparkContext in PySpark 4 classic; the registry must import cleanly
    # before the session exists.
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analogue (minimum-cost supplier): for LARGE parts of size <= 5,
    the EUROPE supplier with the lowest observed unit price. No partsupp
    table, so the part⇄supplier relation and its cost come from lineitem
    (unit price = min extendedprice/quantity).

    Shape kept from Q2: correlated-min subquery → min-per-part join-back,
    done with ONE shuffle via a window min over p_partkey (agg + self-join
    would shuffle twice).
    """
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 5)
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    lineitem = load_table(spark, sf_dir, "lineitem")

    euro_supplier = (
        supplier.join(
            F.broadcast(
                nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        lineitem.join(euro_supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        # Pre-partition on the window key: HashPartitioning(p_partkey)
        # satisfies the two-key groupBy's clustering AND the window's, so
        # agg + window run off ONE shuffle instead of two. (High-cardinality
        # key — no skew risk from the coarser partitioning.)
        .repartition(F.col("p_partkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "s_suppkey",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey")
        .limit(100)
    )


def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: market share of NATION_1 suppliers in ECONOMY-part volume sold to
    EUROPE customers, per order year — conditional-aggregate ratio over a
    6-way join. region/nation broadcast; the rest to AQE."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation_c = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )

    euro_cust = customer.join(
        F.broadcast(
            nation_c.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(euro_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_nationkey")
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", _rev()).otherwise(0.0)
                )
                / F.sum(_rev()),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analogue (product-type profit): profit per supplier nation and
    year over STANDARD parts. No ps_supplycost, so cost is modeled as
    60% of p_retailprice per unit — the join/agg shape (lineitem ⋈ part ⋈
    orders ⋈ supplier ⋈ nation, two-key groupBy) is Q9's."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analogue (important stock): parts whose shipped value from
    NATION_3 suppliers exceeds 0.1% of that nation's total shipped value —
    group-agg + broadcast scalar-subquery HAVING (partsupp value → lineitem
    extendedprice)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    base = (
        lineitem.join(
            supplier.join(
                F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        ).select("l_partkey", "l_extendedprice")
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("part_value")
    )
    total = per_part.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analogue (shipping modes → delay buckets): per order status,
    count lines from high- vs low-priority orders among lines shipped >= 60
    days after ordering in 1996 — the conditional-CASE aggregation shape of
    Q12 with datediff replacing ship/commit/receipt comparisons."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= 60)
            & (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("o_orderstatus")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of order counts per customer (left outer join so
    zero-order customers survive, two-level aggregation). Non-'5-LOW'
    priority replaces the classic comment filter."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue under an OR-of-ANDs predicate spanning part attributes
    and lineitem quantity. The equi-join key is still extracted by Catalyst
    (ExtractEquiJoinKeys); the OR residual is applied post-join, and the
    disjunction of brands IS pushed to the part scan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analogue: suppliers who single-handedly shipped more than half of
    a PROMO part's 1995 volume — nested aggregation (per part+supplier vs
    per part) + left-semi join back to supplier, Q20's exists-subquery shape
    with lineitem volume standing in for ps_availqty."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supplier = load_table(spark, sf_dir, "supplier")
    promo = lineitem.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    # One shuffle on l_partkey: pre-partitioning on the window key lets the
    # two-key groupBy AND the half-total window both reuse it (agg + window
    # off a single exchange, not agg-shuffle + window-shuffle).
    per_ps = (
        promo.repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    half_total = F.sum("qty").over(Window.partitionBy("l_partkey")) * 0.5
    qualified = (
        per_ps.withColumn("half_qty", half_total)
        .filter(F.col("qty") > F.col("half_qty"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_suppliers_kept_orders_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q21 analogue: suppliers who were the ONLY late shipper (>90 days
    after ordering) on a multi-supplier 'F' order — Q21's exists (another
    supplier on the order) + not-exists (no OTHER late supplier) pattern,
    via per-order supplier/late-supplier counts over one shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    lines = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
            .cast("int")
            .alias("late"),
        )
    )
    # Pre-partition on the window key (one shuffle for agg + both windows).
    per_os = (
        lines.repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
    )
    return (
        flagged.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
