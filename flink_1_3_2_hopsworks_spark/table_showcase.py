"""Registry showcase queries driven end-to-end through the Table API facade
(table.py) — proving the reference's third program entry point (SURVEY §3.1
tableEnv.sql / fluent Table expressions / group windows / Over) compiles to
the same Catalyst plans as the direct DataFrame spellings, with DuckDB
oracles in ``table_showcase_oracle``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.table import (
    Over,
    Session,
    Slide,
    TableEnvironment,
    Tumble,
)


def _env(spark: SparkSession, sf_dir: str, *tables: str) -> TableEnvironment:
    env = TableEnvironment.create(spark)
    for t in tables:
        env.register_table(t, load_table(spark, sf_dir, t))
    return env


def tbl_sql_region_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tableEnv.sql() path (reference TableEnvironment.scala#sql →
    Calcite; here Catalyst end-to-end): revenue per region per order year
    over a 4-table join chain."""
    env = _env(spark, sf_dir, "region", "nation", "customer", "orders")
    return env.sql(
        """
        SELECT
            r.r_name AS region,
            CAST(year(o.o_orderdate) AS INT) AS order_year,
            COUNT(*) AS n_orders,
            ROUND(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, year(o.o_orderdate)
        """
    ).df


def tbl_expr_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fluent Table expression path (reference table.scala filter/groupBy/
    select with string expressions): finished-order stats per priority."""
    env = _env(spark, sf_dir, "orders")
    out = (
        env.scan("orders")
        .filter("o_orderstatus = 'F'")
        .group_by("o_orderpriority")
        .select(
            "o_orderpriority",
            "count(*) AS n_orders",
            "round(avg(o_totalprice), 4) AS avg_price",
            "round(max(o_totalprice), 2) AS max_price",
        )
        .order_by("o_orderpriority")
    )
    return out.df


def tbl_tumble_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-window path (reference api/windows.scala `Tumble over 1.day on
    'ts as 'w` + WindowGroupedTable): daily event counts/value per type,
    window properties exposed as w_start/w_end."""
    env = _env(spark, sf_dir, "events")
    out = (
        env.scan("events")
        .window(Tumble.over("1 day").on("ts").with_alias("w"))
        .group_by("w, event_type")
        .select(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return out.select(
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("w_end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "event_type",
        "n_events",
        "total_value",
    ).df


def tbl_slide_6h_2h_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slide group-window path (reference api/windows.scala `Slide over
    6.hours every 2.hours`): every event lands in 3 overlapping windows;
    counts/value per (window, type)."""
    env = _env(spark, sf_dir, "events")
    out = (
        env.scan("events")
        .window(Slide.over("6 hours").every("2 hours").on("ts").with_alias("w"))
        .group_by("w, event_type")
        .select(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return out.select(
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("w_end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "event_type",
        "n_events",
        "total_value",
    ).df


def tbl_session_30m_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session group-window path (reference api/windows.scala `Session
    withGap 30.minutes`) through Spark's native session_window — merge-on-
    overlap sessions per user; end = last event + gap."""
    env = _env(spark, sf_dir, "events")
    out = (
        env.scan("events")
        .window(Session.with_gap("30 minutes").on("ts").with_alias("w"))
        .group_by("w, user_id")
        .select(F.count(F.lit(1)).alias("n_events"))
    )
    return out.select(
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        F.date_format("w_end", "yyyy-MM-dd HH:mm:ss").alias("w_end"),
        "user_id",
        "n_events",
    ).df


def tbl_over_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-window builder path (reference api/windows.scala Over
    partitionBy/orderBy): per-customer running order revenue."""
    env = _env(spark, sf_dir, "orders")
    w = Over.partition_by("o_custkey").order_by("o_orderdate", "o_orderkey").rows()
    return (
        env.scan("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w.spec), 2).alias("running_total"),
        )
        .df
    )


def tbl_offset_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy/offset/fetch paging path (reference table.scala orderBy +
    offset + fetch → Calcite Sort with fetch/offset): page 3 of the
    highest-value orders, tie-broken by key for determinism."""
    env = _env(spark, sf_dir, "orders")
    out = (
        env.scan("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .order_by("o_totalprice desc", "o_orderkey asc")
        .offset(40)
        .fetch(20)
    )
    return out.df
