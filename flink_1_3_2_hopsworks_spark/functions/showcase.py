"""Registry showcase queries for the scalar/UDF function surface (§2.9/§2.10).

Each query exercises a function category on the corpus with a DuckDB oracle.
All scalar queries stay JVM-side (whole-stage codegen); the UDF queries cross
the Arrow boundary deliberately, to exercise that surface.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.functions import scalar as S


def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: CHAR_LENGTH/UPPER/LOWER/TRIM/SUBSTRING/POSITION/
    CONCAT/LIKE (flink-table stringExpressions.scala)."""
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        S.char_length("c_name").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        S.substring_sql("c_name", 1, 8).alias("name_prefix"),
        F.locate("1", F.col("c_name")).alias("pos_one"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("tagged"),
        F.col("c_name").like("%5%").alias("has_five"),
        S.trim_sql(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
    )


def fn_math_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: ABS/FLOOR/CEIL/SQRT/EXP/LN/LOG10/POWER/%
    (flink-table mathExpressions.scala)."""
    supplier = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return supplier.select(
        "s_suppkey",
        F.round(F.abs(bal), 2).alias("abs_bal"),
        F.floor(bal).cast("bigint").alias("floor_bal"),
        F.ceil(bal).cast("bigint").alias("ceil_bal"),
        F.round(F.sqrt(F.abs(bal)), 4).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1.0), 4).alias("ln_bal"),
        F.round(F.log10(F.abs(bal) + 1.0), 4).alias("log10_bal"),
        F.round(F.pow(F.lit(1.01), F.col("s_nationkey")), 4).alias("pow_nk"),
        (F.col("s_suppkey") % 7).alias("mod7"),
    )


def fn_temporal_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal surface: EXTRACT/QUARTER/FLOOR-to-unit/interval arithmetic
    (flink-table time.scala; 1.3 added QUARTER)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_floor"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus_30d"),
    )


def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional surface: CASE WHEN / IF / BETWEEN / IN
    (flink-table comparison.scala, logic.scala)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
    )
    return (
        orders.withColumn("bucket", bucket)
        .withColumn(
            "is_urgent",
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        )
        .groupBy("bucket", "is_urgent")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


def fn_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access on events.props — the reference handled JSON only via
    user UDFs; Spark's get_json_object is a native extra."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: CARDINALITY / AT / ELEMENT (flink-table array.scala)
    over the embeddings vector column."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        S.cardinality(F.col("embedding")).alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
        F.round(F.element_at("embedding", -1).cast("double"), 4).alias("last_val"),
    )


def fn_native_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-1.3 scalar surface the reference lacked (SURVEY.md §2.9 'NOT in
    1.3'): hashes, regex, padding, trig — all Spark built-ins."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.md5("n_name").alias("name_md5"),
        F.sha2(F.col("n_name"), 256).alias("name_sha256"),
        F.regexp_extract("n_name", r"([0-9]+)", 1).alias("name_digits"),
        F.lpad("n_name", 12, "*").alias("padded_l"),
        F.rpad("n_name", 12, "*").alias("padded_r"),
        F.translate("n_name", "_", "-").alias("translated"),
        F.reverse(F.col("n_name")).alias("reversed"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.round(F.sin(F.col("n_nationkey")), 6).alias("sin_k"),
        F.round(F.cos(F.col("n_nationkey")), 6).alias("cos_k"),
        F.round(F.atan2(F.col("n_nationkey"), F.lit(2.0)), 6).alias("atan2_k"),
        F.round(F.degrees(F.col("n_nationkey")), 4).alias("deg_k"),
    )


def fn_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar UDF surface (reference ScalarFunction.eval): an Arrow-batched
    pandas UDF computing discounted revenue — SQL-checkable."""
    lineitem = load_table(spark, sf_dir, "lineitem")

    @F.pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return (
        lineitem.withColumn("dp", disc_price("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("dp"), 2).alias("total_disc_price"))
    )


def fn_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAGG surface (reference AggregateFunction, 1.3): grouped-agg pandas
    UDF — quantity-weighted average price per returnflag."""
    lineitem = load_table(spark, sf_dir, "lineitem")

    @F.pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg("l_extendedprice", "l_quantity"), 2
            ).alias("w_avg_price")
        )
    )


def fn_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF / lateral-join surface (reference TableFunction +
    DataSetCorrelate): split order priority into tokens, one row each."""
    orders = load_table(spark, sf_dir, "orders")
    from flink_1_3_2_hopsworks_spark.functions.udf import lateral_explode

    tokens = lateral_explode(
        orders, F.split("o_orderpriority", "-"), "token", ["o_orderkey"]
    )
    return tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))


def fn_rich_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RichFunction broadcast set (reference RuntimeContext
    .getBroadcastVariable / DataSet#withBroadcastSet): a SMALL dimension
    collected once and broadcast to every executor for Python-side lookup
    inside a pandas UDF — the escape hatch when lookup logic can't be a
    join (the join spelling is preferred and is what the oracle states)."""
    from flink_1_3_2_hopsworks_spark.functions.rich import broadcast_set

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    bc = broadcast_set(nation)
    supplier = load_table(spark, sf_dir, "supplier")

    # The dict is built once per executor process (RichFunction.open()
    # semantics), not per Arrow batch — for a large dimension the rebuild
    # would otherwise repeat on every batch.
    cache: dict = {}

    @F.pandas_udf("string")
    def nation_name(keys: pd.Series) -> pd.Series:
        if "m" not in cache:
            cache["m"] = {r["n_nationkey"]: r["n_name"] for r in bc.value}
        return keys.map(cache["m"])

    return supplier.select(
        "s_suppkey", nation_name(F.col("s_nationkey")).alias("nation_name")
    )
