"""TPC-H-style relational plans over the test corpus.

Reference parity: the reference ships TPC-H Q3/Q10 as its canonical
end-to-end relational examples
(flink-examples/flink-examples-batch/.../relational/TPCHQuery3.java,
TPCHQuery10.java); its SQL/Table path (SURVEY.md §3.1) covers the same
scan→filter→join→agg→sort→limit spine. Here each query is a declarative
DataFrame plan: Catalyst pushes filters/projections into the parquet scan,
plans broadcast joins for the dimension side, and does partial aggregation —
the decisions Flink's optimizer (flink-optimizer JoinNode/GroupReduceNode)
makes by hand.

Scale notes (100 TB posture):
  - Explicit broadcast hints ONLY on constant-size dims (region, nation) and
    single-row aggregates; customer/supplier/part scale with SF, so their
    join strategy is left to AQE (which broadcasts them when runtime stats
    fit the threshold). Fact-fact joins (lineitem⋈orders) shuffle on the
    join key and benefit from AQE skew handling.
  - Every plan filters and projects before joining, so pushdown reaches the
    scan (verify via .explain: PushedFilters / ReadSchema).
  - Aggregates are rounded at the output edge only — rounding is presentation,
    not plan semantics.

Output conventions (shared with the DuckDB oracles in
``flink_1_3_2_hopsworks_spark.plans.tpch_oracle``): every computed column is
aliased identically in both; dates are emitted as 'yyyy-MM-dd' strings; double
aggregates are rounded to 2 decimals; LIMIT queries order by rounded values
with a unique tiebreaker so the selected row set is deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report over lineitem.

    Exercises: scan+pushdown, filter, multi-aggregate groupBy (partial agg
    map-side), sort. Single shuffle on (l_returnflag, l_linestatus).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(
                F.sum(_revenue() * (F.lit(1.0) + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue (the reference's own
    flagship example, TPCHQuery3.java).

    Exercises: selective filters pushed to scans, size-based broadcast of the
    filtered customer dim (static stats or AQE — no hint, customer scales
    with SF), shuffle join lineitem⋈orders, agg, global top-k (Spark plans
    TakeOrderedAndProject — no full sort).
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: revenue by nation where customer and supplier share
    the nation, one region, one year.

    Exercises: 6-table join with two broadcastable dims, non-key equi
    predicate (c_nationkey = s_nationkey) folded into join, agg, sort.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue from a band of discounted small-quantity lineitems.

    Exercises: pure scan+filter+global agg — every predicate must reach the
    parquet reader (PushedFilters), zero joins, single-row result.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue (the reference's TPCHQuery10.java): top-20
    customers by lost revenue on returned items in a quarter.

    Exercises: fact-fact shuffle join, broadcast dim join, wide groupBy,
    top-k with deterministic tiebreak.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
            "c_mktsegment",
        )
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority checking via EXISTS (left-semi join).

    The reference's 1.3 SQL could only express this as an IN/EXISTS rewrite in
    batch; Spark plans a native left-semi hash join.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    late_lines = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-10-01"))
        .select("l_orderkey")
    )
    return (
        orders.join(
            late_lines, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: customers with any single order above a quantity
    threshold (HAVING over a fact-table groupBy, then joins back).

    Exercises: agg-then-filter (HAVING), join of an aggregate result against
    facts — the reference's DataSetSingleRowJoin/agg-join composition.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big_orders.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )
