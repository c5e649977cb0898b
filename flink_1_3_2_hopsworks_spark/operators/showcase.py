"""Registry showcase queries for the batch operator surface.

Each query exercises one operator family from SURVEY.md §2 through the
operator library (joins/aggregations/setops/sort_limit), on the test corpus,
with a DuckDB oracle in ``showcase_oracle``.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.operators import aggregations as agg
from flink_1_3_2_hopsworks_spark.operators import joins, setops, sort_limit


def op_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (reference FullOuterJoinDriver): per-nation customer
    and supplier counts, keys kept from either side."""
    customers = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    suppliers = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = joins.join(
        customers,
        suppliers,
        F.col("c_nationkey") == F.col("s_nationkey"),
        how="full",
    )
    return joined.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


def op_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one 'F' order."""
    customer = load_table(spark, sf_dir, "customer")
    f_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return joins.semi_join(
        customer, f_orders, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_custkey", "c_name", "c_mktsegment")


def op_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no pending ('P') orders.
    (Every customer has some order in this corpus, so the unscoped variant
    would be a trivially-empty check.)"""
    customer = load_table(spark, sf_dir, "customer")
    p_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    )
    return joins.anti_join(
        customer, p_orders, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_custkey", "c_name")


def op_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (reference CrossOperator): region × nation pairs."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return joins.cross(region, nation).select("r_name", "n_name")


def op_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coGroup (reference CoGroupOperator): per nationkey, full groups from
    customer and supplier processed together in one pandas function —
    counts from each side plus the best account balance across both."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_acctbal"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = (
            left["c_nationkey"].iloc[0] if len(left) else right["s_nationkey"].iloc[0]
        )
        balances = pd.concat(
            [left["c_acctbal"], right["s_acctbal"]], ignore_index=True
        )
        return pd.DataFrame(
            {
                "nationkey": [int(key)],
                "n_customers": [len(left)],
                "n_suppliers": [len(right)],
                "best_acctbal": [round(float(balances.max()), 2)],
            }
        )

    return joins.co_group(
        customer,
        supplier,
        ["c_nationkey"],
        ["s_nationkey"],
        merge,
        "nationkey int, n_customers long, n_suppliers long, best_acctbal double",
    )


def op_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (reference 1.3 batch SQL): order counts by status, by
    priority, and grand total — one Expand+Aggregate pass."""
    orders = load_table(spark, sf_dir, "orders")
    return agg.grouping_sets(
        orders,
        [["o_orderstatus"], ["o_orderpriority"], []],
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def op_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: lineitem counts by (returnflag, linestatus) hierarchy."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return agg.rollup(
        lineitem,
        ["l_returnflag", "l_linestatus"],
        F.count(F.lit(1)).alias("n_items"),
    )


def op_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: order counts over all subsets of (status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return agg.cube(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        F.count(F.lit(1)).alias("n_orders"),
    )


def op_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxBy (reference SelectByMaxFunction): per market segment, the whole
    customer row with the highest account balance (ties → higher custkey)."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal", "c_custkey", "c_name"
    )
    picked = agg.max_by(customer, ["c_mktsegment"], "c_acctbal")
    return picked.select(
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("best_acctbal"),
        "c_custkey",
        "c_name",
    )


def op_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minBy: per nation, the supplier row with the lowest account balance."""
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_acctbal", "s_suppkey", "s_name"
    )
    picked = agg.min_by(supplier, ["s_nationkey"], "s_acctbal")
    return picked.select(
        "s_nationkey",
        F.round("s_acctbal", 2).alias("worst_acctbal"),
        "s_suppkey",
        "s_name",
    )


def op_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct on selected fields (reference DistinctOperator)."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    )
    return agg.distinct(lineitem)


def op_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION (distinct): nation keys appearing as customer or supplier
    nations."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return setops.union_distinct(c, s)


def op_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (reference DataSetIntersect): nations with both customers
    and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return setops.intersect(c, s)


def op_minus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (reference DataSetMinus): nations with customers but no
    suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return setops.minus(c, s)


def op_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (reference DataSetIntersect keepAll): multiplicity-
    preserving intersection — each nationkey survives min(customer-count,
    supplier-count) times, summarized as a count per key so the bag
    semantics are observable."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        setops.intersect(c, s, all=True)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


def op_minus_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (reference DataSetMinus keepAll): bag difference — each
    nationkey survives max(customer-count − supplier-count, 0) times,
    summarized as a count per key."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        setops.minus(c, s, all=True)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


def op_first_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise first-n (reference grouped first(n)): top-3 orders per
    status by total price."""
    orders = load_table(spark, sf_dir, "orders")
    top = sort_limit.first_n_per_group(
        orders,
        ["o_orderstatus"],
        3,
        F.desc("o_totalprice"),
        F.asc("o_orderkey"),
    )
    return top.select(
        "o_orderstatus",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
    )


def op_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject): 15 priciest lineitems."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    top = sort_limit.top_k(
        lineitem,
        15,
        F.desc("l_extendedprice"),
        F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    )
    return top.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("extendedprice"),
    )


def op_over_rows_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVER ROWS window (reference RowsClauseBoundedOverProcessFunction,
    1.3): per-customer 3-row moving sum of order totals."""
    from flink_1_3_2_hopsworks_spark.operators.windows_over import rows_window

    orders = load_table(spark, sf_dir, "orders")
    w = rows_window(["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")], 2)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("moving_sum"),
    )


def op_over_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVER RANGE window (reference RangeClauseBoundedOverProcessFunction,
    1.3): per-customer trailing-30-day order count, range over epoch
    seconds."""
    from flink_1_3_2_hopsworks_spark.operators.windows_over import range_window

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "_epoch", F.unix_timestamp("o_orderdate")
    )
    w = range_window(["o_custkey"], F.asc("_epoch"), 30 * 86400)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_30d"),
    )


def op_over_unbounded_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-preceding OVER (reference UnboundedOverProcessFunction,
    1.3): per-customer running revenue."""
    from flink_1_3_2_hopsworks_spark.operators.windows_over import with_running_agg

    orders = load_table(spark, sf_dir, "orders")
    out = with_running_agg(
        orders,
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        F.sum("o_totalprice"),
        "running_total",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("running_total", 2).alias("running_total"),
    )


def op_ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/offset analytics (row_number/rank/dense_rank/lag/lead) —
    native extras the reference's 1.3 SQL lacked (SURVEY.md §2.5)."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return customer.select(
        "c_mktsegment",
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("c_custkey", 1).over(w).alias("prev_cust"),
        F.lead("c_custkey", 1).over(w).alias("next_cust"),
    ).filter(F.col("rn") <= 10)


def op_zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zipWithIndex (reference DataSetUtils): contiguous ids over nations in
    key order (deterministic ordered variant)."""
    nation = load_table(spark, sf_dir, "nation")
    return sort_limit.zip_with_index(
        nation.select("n_nationkey", "n_name"), "idx", order=["n_nationkey"]
    )


def ds_chain_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSet program entry point (reference §3.2: ExecutionEnvironment →
    fluent DataSet chain — DataSet.java filter/joinWithTiny where/equalTo/
    groupBy/aggregate.and): finished-order revenue per customer nation with
    the earliest order date, driven END-TO-END through the facade. The
    whole chain stays one Catalyst plan (asserted in tests/test_api.py)."""
    from flink_1_3_2_hopsworks_spark.api import (
        Aggregations,
        ExecutionEnvironment,
    )

    env = ExecutionEnvironment.get_execution_environment(spark)
    orders = env.read_parquet(f"{sf_dir}/orders.parquet")
    customer = env.read_parquet(f"{sf_dir}/customer.parquet")
    joined = (
        orders.filter("o_orderstatus = 'F'")
        .join_with_tiny(customer)
        .where("o_custkey")
        .equal_to("c_custkey")
    )
    agg = (
        joined.group_by("c_nationkey")
        .aggregate(Aggregations.SUM, "o_totalprice")
        .and_agg(Aggregations.MIN, "o_orderdate")
        .done()
    )
    return agg.map(
        F.col("c_nationkey"),
        F.round("o_totalprice", 2).alias("total_revenue"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_orderdate"),
    ).df


def op_bulk_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk iteration (reference IterativeDataSet + runtime iteration-head
    loop, §2.8): 3 fixed supersteps of per-row Newton square-root refinement
    x ← (x + v/x)/2 seeded with x = v, run through the iterate() driver loop
    (localCheckpoint per superstep truncating lineage). Per-row IEEE double
    arithmetic — the oracle unrolls the same 3 steps and both engines
    produce bit-identical values, no float-summation-order drift."""
    from flink_1_3_2_hopsworks_spark.operators.iterate import iterate

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("v"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )

    def step(state, i):
        return state.select(
            "l_orderkey",
            "l_linenumber",
            "v",
            ((F.col("x") + F.col("v") / F.col("x")) / 2).alias("x"),
        )

    out = iterate(li, step, max_iterations=3)
    return (
        out.select(
            "l_orderkey",
            "l_linenumber",
            F.round("x", 4).alias("newton_sqrt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(5000)
    )


def op_delta_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta iteration (reference DeltaIteration: updatable solution set +
    shrinking workset, §2.8): incremental BFS over the sparse high-quantity
    purchase graph — each round expands only the newly-settled frontier,
    the delta merges into the solution by key, and iteration stops when the
    workset empties (far fewer rows touched per round than a bulk
    recompute). Oracle: recursive BFS CTE with min hop counts."""
    from flink_1_3_2_hopsworks_spark.graph.showcase import (
        _sparse_bipartite_edges,
    )
    from flink_1_3_2_hopsworks_spark.operators.iterate import iterate_delta

    e = _sparse_bipartite_edges(spark, sf_dir)
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    source = e.agg(F.min("src")).collect()[0][0]
    init = spark.createDataFrame([(source, 0)], "id long, hops long")

    def step(solution, workset, i):
        cand = (
            workset.withColumnRenamed("id", "src")
            .join(edges, "src")
            .select(F.col("dst").alias("id"), (F.col("hops") + 1).alias("hops"))
            .groupBy("id")
            .agg(F.min("hops").alias("hops"))
        )
        delta = cand.join(solution, "id", "left_anti")
        return delta, delta

    out = iterate_delta(init, init, step, ["id"], max_iterations=60)
    # iterate_delta localCheckpoints its result, so the cached loop
    # invariant can be released immediately (registry runs share a session).
    edges.unpersist()
    return out.orderBy("id")


def op_split_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/select routing (reference SplitStream + OutputTag side
    outputs, §2.7): one scan fans out into named predicate routes; two
    routes are selected and re-tagged. Spark dedups the shared scan across
    branches; the oracle restates the selected routes as filtered unions."""
    from flink_1_3_2_hopsworks_spark.operators.routing import split

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    routes = split(
        events,
        {
            "high": F.col("value") >= 75.0,
            "mid": (F.col("value") >= 25.0) & (F.col("value") < 75.0),
            "low": F.col("value") < 25.0,
        },
    )
    high = routes["high"].withColumn("route", F.lit("high"))
    low = routes["low"].withColumn("route", F.lit("low"))
    return high.unionByName(low).select("event_id", "event_type", "route", "value")


def op_join_with_tiny(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joinWithTiny (reference JoinOperatorSets BROADCAST_HASH_SECOND hint):
    supplier ⋈ broadcast(nation) — the sugar must plan a broadcast-hash
    join of the tiny side, never a shuffle of the big side."""
    from flink_1_3_2_hopsworks_spark.operators.joins import join_with_tiny

    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = join_with_tiny(
        supplier, nation, supplier.s_nationkey == nation.n_nationkey
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
    )


def op_join_with_huge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joinWithHuge (reference JoinOperatorSets BROADCAST_HASH_FIRST hint):
    broadcast(nation) ⋈ customer — the sugar broadcasts the declared-tiny
    LEFT side so the huge probe side never shuffles."""
    from flink_1_3_2_hopsworks_spark.operators.joins import join_with_huge

    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    joined = join_with_huge(
        nation, customer, nation.n_nationkey == customer.c_nationkey
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


def op_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (data profiling — the
    summarize() companion): p50/p90/p99 of event value per type. Spark's
    exact `percentile` and DuckDB's QUANTILE_CONT share the linear-
    interpolation definition, so the oracle matches to 4dp."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


def op_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (profiling): l_quantity into 10 unit-width ×5
    bins — integer bucket arithmetic, exact counts."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.least(
                F.floor((F.col("l_quantity").cast("double") - 1.0) / 5.0),
                F.lit(9),
            )
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


def op_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join — the custom operator composed from DataFrame
    ops (union-merge + last-ignorenulls window, ONE shuffle, no quadratic
    time-range join): for each click, the user's most recent purchase
    at-or-before it (NULLs when none precedes). Deterministic ties:
    latest ts, then largest purchase event_id."""
    from flink_1_3_2_hopsworks_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        ["user_id"],
        "ts",
        "ts",
        ["event_id", "value"],
        right_tiebreak="event_id",
    )
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_id",
        "last_event_id",
        F.round("last_value", 2).alias("last_value"),
    )


def op_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (SURVEY §2.3 native extra; post-1.3 Flink
    KeyedStream#intervalJoin): click ⋈ purchase pairs for the same user
    within ±15 minutes — an equi-join on the key with a time-band
    residual, so Spark shuffles ONCE on user_id and applies the band as a
    post-join filter (the streaming twin is the watermarked stream-stream
    join in streaming/window_op.py)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    joined = clicks.join(purchases, "user_id").filter(
        (F.col("p_ts") >= F.col("c_ts") - F.expr("INTERVAL 15 MINUTES"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 15 MINUTES"))
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


def op_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (lo <= value < hi — inexpressible as an equi-join):
    lineitem priced into 10k-wide bands via a broadcast nested-loop join
    against the tiny band table, then aggregated per band."""
    from flink_1_3_2_hopsworks_spark.operators.asof import range_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("price")
    )
    bands = spark.range(0, 12).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 10000.0).alias("lo"),
        ((F.col("id") + 1) * 10000.0).alias("hi"),
    )
    joined = range_join(li, bands, "price")
    return joined.groupBy("band_id", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("price"), 2).alias("total_price"),
    )


def op_group_reduce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduceGroup (reference GroupReduceOperator / GroupReduceFunction):
    the UDF sees the WHOLE group at once — here order statistics (median)
    that no distributive aggregate computes — via group_reduce's
    applyInPandas. Order statistics only, so the oracle is exact: no
    accumulation-order float drift."""
    import pandas as pd

    from flink_1_3_2_hopsworks_spark.operators.aggregations import group_reduce

    events = load_table(spark, sf_dir, "events")

    # Raw stats in the UDF; rounding happens JVM-side below — Python's
    # round() is banker's (half-to-even) while Spark F.round and DuckDB
    # ROUND are half-up, so rounding in pandas would diverge from the
    # oracle on exactly-representable halves (0.125, 2.675, ...).
    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            [
                {
                    "event_type": pdf.iloc[0]["event_type"],
                    "n": len(pdf),
                    "min_value": float(v.min()),
                    "max_value": float(v.max()),
                    "median_value": float(v.median()),
                }
            ]
        )

    out = group_reduce(
        events.select("event_type", "value"),
        ["event_type"],
        stats,
        "event_type string, n long, min_value double, max_value double, "
        "median_value double",
    )
    return out.select(
        "event_type",
        "n",
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
        F.round("median_value", 4).alias("median_value"),
    )


def op_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified fixed-size sampling (north-star training-pipeline op:
    class-balanced draws; Spark's sampleBy is fraction-based and
    non-portable): 100 events per event_type by salted-hash order — the
    oracle replays the exact row set per stratum."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        stratified_sample_hashed,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    return stratified_sample_hashed(events, 100, ["event_type"], ["event_id"])


def op_sample_fixed_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampleWithSize (reference DataSetUtils#sampleWithSize) in its
    portable salted-hash form: a fixed-size uniform draw whose row set any
    engine can replay from (key, salt) — the oracle re-derives the exact
    200 rows. Plans as TakeOrderedAndProject (no full sort)."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        sample_with_size_hashed,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    return sample_with_size_hashed(events, 200, ["event_id"])


def op_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSet summarize (reference DataSetUtils#summarize): per-column
    count/nulls/min/max/mean for lineitem key + measure columns, computed
    in ONE aggregate pass; the oracle states each column's stats row."""
    from flink_1_3_2_hopsworks_spark.operators.aggregations import summarize

    li = load_table(spark, sf_dir, "lineitem")
    out = summarize(li, ["l_orderkey", "l_linenumber", "l_quantity"])
    return out.select(
        "column", "n", "nulls", "min_value", "max_value",
        F.round("mean", 4).alias("mean"),
    )


def op_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): hot keys fan
    out over (key, salt) reducers before the per-key merge — the 100-TB
    posture for high-fanout aggregates AQE cannot split. The salt is
    internal; the RESULT is the plain GROUP BY (the oracle), exactly:
    sum/count/min/max of integer-valued columns merge deterministically."""
    from flink_1_3_2_hopsworks_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem")
    return salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "n_rows": ("count", "l_quantity"),
            "max_price": ("max", "l_extendedprice"),
            "min_disc": ("min", "l_discount"),
        },
        num_salts=16,
    )


def op_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fan-out equi-join (operators/skew.py): big side salted,
    small side replicated per salt — for joins AQE can't rewrite
    (stream-static, bucketed inputs). Result ≡ the plain join; verified by
    aggregating to per-nation totals (exact integer-valued sums)."""
    from flink_1_3_2_hopsworks_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    return (
        salted_join(li, supp, ["s_suppkey"], num_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def op_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable KMV distinct-count sketch (operators/sketches.py): estimate
    |distinct o_custkey| from the 256 minimum md5 hashes. Unlike HLL++ the
    sketch is engine-neutral — the oracle replays hash → k-min → estimator
    exactly. Only k values ever leave a partition (TakeOrderedAndProject)."""
    from flink_1_3_2_hopsworks_spark.operators.sketches import kmv_distinct

    orders = load_table(spark, sf_dir, "orders")
    return kmv_distinct(orders, ["o_custkey"], k=256)


def op_sampled_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auditable approximate percentiles (operators/sketches.py): exact
    interpolated quartiles of l_extendedprice per returnflag over a
    DETERMINISTIC 10% salted-hash sample — any engine replays the identical
    sample, unlike approx_percentile's private sketch."""
    from flink_1_3_2_hopsworks_spark.operators.sketches import (
        sampled_percentiles,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return sampled_percentiles(
        li,
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        0.1,
        group_cols=["l_returnflag"],
    )


def op_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join (operators/bloom.py): the fact scan is
    pre-filtered by an 8 KiB bit filter built from the selective dim's
    keys, so non-joining rows never reach the shuffle; the real join
    removes false positives, making the result ≡ the plain join (the
    oracle). The explicit, portable form of AQE's runtime bloom filter —
    usable where the optimizer won't inject one."""
    from flink_1_3_2_hopsworks_spark.operators.bloom import bloom_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
    )
    dim = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select("s_suppkey", "s_nationkey")
    )
    return (
        bloom_join(li, dim, ["s_suppkey"])
        .groupBy("s_nationkey")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def op_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted fixed-size sample (north-star training-pipeline op — the
    quality-weighted corpus draw): 50 documents selected with probability
    proportional to n_chars via portable A-Res (Efraimidis–Spirakis) keys
    ln(u)/w over the salted-md5 draw. The oracle replays the exact row
    set; ordered by doc_id for comparison."""
    from flink_1_3_2_hopsworks_spark.operators.sampling import (
        weighted_sample_fixed_size,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample_fixed_size(
        docs, 50, "n_chars", ["doc_id"], salt="wq0"
    ).orderBy("doc_id")


def op_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (operators/sketches.py): a 4×1024
    portable CMS over events.user_id (one bounded hash-aggregate — the
    mergeable profiling sketch for 100 TB streams), probed with the true
    top-10 users. Emits (user_id, exact_n, est_n) — est_n >= exact_n is
    the CMS guarantee, pytest-pinned; the oracle replays the md5 buckets,
    the counters, and the min-probe exactly."""
    from flink_1_3_2_hopsworks_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    events = load_table(spark, sf_dir, "events")
    sketch = cms_build(events, ["user_id"])
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(10)
    )
    est = cms_estimate(sketch, exact.select("user_id"), ["user_id"])
    return exact.join(est, "user_id").select(
        "user_id", "exact_n", "est_n"
    )
