"""Sorting, limits, top-k, and explicit partitioning.

Reference parity: sortPartition (flink-java operators/SortPartitionOperator),
global sort (Table orderBy → DataSetSort with range partitioning + sampling —
Spark's orderBy uses the identical RangePartitioner design), first(n)
(FirstReducer, group-wise or global), partitionByHash/ByRange/rebalance
(PartitionOperator), zipWithIndex/zipWithUniqueId (DataSetUtils).

Scale notes: ``top_k`` compiles to TakeOrderedAndProject (per-partition heap
+ driver merge — no global sort); group-wise first-n is a window row_number
(single shuffle on the partition keys). zip_with_index uses the reference's
own two-pass trick (count per partition → offset) without collecting data.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def sort_partition(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Per-partition sort — no shuffle (reference sortPartition)."""
    return df.sortWithinPartitions(*cols)


def global_sort(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Total order via range partition + local sort (reference DataSetSort)."""
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *order: Column | str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — better than the
    reference's sort+first composition (no full sort)."""
    return df.orderBy(*order).limit(k)


def first_n(df: DataFrame, n: int) -> DataFrame:
    """Global first-n without ordering guarantees (reference first(n))."""
    return df.limit(n)


def first_n_per_group(
    df: DataFrame, group_cols: Sequence[str], n: int, *order: Column | str
) -> DataFrame:
    """Group-wise first-n (reference grouped first(n) / FirstReducer),
    deterministic when ``order`` includes a unique tiebreaker."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def partition_by_hash(df: DataFrame, cols: Sequence[str], num: int | None = None) -> DataFrame:
    """Explicit hash repartition (reference partitionByHash)."""
    return df.repartition(num, *cols) if num else df.repartition(*cols)


def partition_by_range(df: DataFrame, cols: Sequence[str], num: int | None = None) -> DataFrame:
    """Explicit range repartition (reference partitionByRange)."""
    return df.repartitionByRange(num, *cols) if num else df.repartitionByRange(*cols)


def rebalance(df: DataFrame, num: int) -> DataFrame:
    """Round-robin redistribution (reference rebalance)."""
    return df.repartition(num)


def partition_custom(df: DataFrame, partition_expr: Column | str, num: int) -> DataFrame:
    """Custom partitioner (reference partitionCustom): Spark DataFrames
    partition by EXPRESSION hash, not by a Partitioner object — express the
    custom routing as a column (e.g. ``F.col("k") % 4`` or a when-chain)
    and all rows with equal expression values co-locate."""
    expr = F.expr(partition_expr) if isinstance(partition_expr, str) else partition_expr
    return df.repartition(num, expr)


def rescale(df: DataFrame, num: int) -> DataFrame:
    """Local round-robin to fewer partitions (reference rescale — a NARROW
    redistribution, no full shuffle): Spark's coalesce is exactly this."""
    return df.coalesce(num)


def global_partition(df: DataFrame) -> DataFrame:
    """Route everything to one partition (reference global()). A scale
    hazard by definition — exists for small final outputs only, same
    caveat as the reference."""
    return df.coalesce(1)


def zip_with_unique_id(df: DataFrame, id_col: str = "unique_id") -> DataFrame:
    """Unique (non-contiguous) long ids — the reference's zipWithUniqueId
    bit-packs (counter, partition); monotonically_increasing_id is the same
    scheme. No shuffle."""
    return df.withColumn(id_col, F.monotonically_increasing_id())


def zip_with_index(
    df: DataFrame, id_col: str = "index", order: Sequence[Column | str] | None = None
) -> DataFrame:
    """Contiguous 0-based ids (reference DataSetUtils#zipWithIndex).

    With ``order`` given: deterministic global ordering via one range-shuffle
    window (row_number over the whole frame range-partitions by the sort key;
    acceptable because ranks are computed per range partition). Without
    ``order``: the reference's own two-pass scheme — count rows per partition,
    broadcast the offsets, add per-partition local index. No global sort.
    """
    if order is not None:
        w = Window.orderBy(*order)
        return df.withColumn(
            id_col, (F.row_number().over(w) - F.lit(1)).cast("bigint")
        )
    part = df.withColumn("_pid", F.spark_partition_id())
    counts = (
        part.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w_local = Window.partitionBy("_pid").orderBy(F.monotonically_increasing_id())
    return (
        part.withColumn("_local", F.row_number().over(w_local) - F.lit(1))
        .join(F.broadcast(offset_df), "_pid")
        .withColumn(id_col, F.col("_offset") + F.col("_local"))
        .drop("_pid", "_local", "_offset")
    )
