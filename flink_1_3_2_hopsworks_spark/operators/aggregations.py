"""Aggregation operator surface.

Reference parity: grouped/all reduce (flink-java operators/ReduceOperator.java
with map-side combine — Spark's partial aggregation is the same design),
field aggregations (AggregateOperator: SUM/MIN/MAX chains), minBy/maxBy
(SelectByMin/MaxFunction), distinct (DistinctOperator), reduceGroup
(GroupReduceOperator → applyInPandas), DataSetUtils#summarize, and the
Table/SQL aggregates incl. GROUPING SETS / CUBE / ROLLUP (1.3).

Scale notes: everything here compiles to HashAggregateExec with partial
(map-side) aggregation — one shuffle on the group keys. ``group_reduce``
crosses the Arrow boundary and buffers whole groups; prefer built-in
aggregates whenever the semantics allow.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType


def aggregate(
    df: DataFrame, group_cols: Sequence[str], *aggs: Column
) -> DataFrame:
    """Grouped aggregation (reference grouped reduce / field aggregations)."""
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def min_by(df: DataFrame, group_cols: Sequence[str], order_col: str) -> DataFrame:
    """Whole-row argmin per group (reference minBy: SelectByMinFunction).

    Uses struct-ordering min: deterministic even on ties because every
    remaining column participates in the ordering.
    """
    other = [c for c in df.columns if c != order_col and c not in group_cols]
    picked = F.min(F.struct(order_col, *other)).alias("_row")
    return (
        df.groupBy(*group_cols)
        .agg(picked)
        .select(*group_cols, *[F.col(f"_row.{c}").alias(c) for c in [order_col, *other]])
    )


def max_by(df: DataFrame, group_cols: Sequence[str], order_col: str) -> DataFrame:
    """Whole-row argmax per group (reference maxBy)."""
    other = [c for c in df.columns if c != order_col and c not in group_cols]
    picked = F.max(F.struct(order_col, *other)).alias("_row")
    return (
        df.groupBy(*group_cols)
        .agg(picked)
        .select(*group_cols, *[F.col(f"_row.{c}").alias(c) for c in [order_col, *other]])
    )


def distinct(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Dedup on all or selected fields (reference DistinctOperator).

    Note: with ``cols`` given, the reference keeps an arbitrary row per key;
    ``dropDuplicates`` matches that (first-seen, nondeterministic across
    runs) — for deterministic selection use :func:`min_by`.
    """
    return df.dropDuplicates(list(cols)) if cols else df.distinct()


def group_reduce(
    df: DataFrame,
    group_cols: Sequence[str],
    func: Callable,
    schema: StructType | str,
) -> DataFrame:
    """Full-group UDF (reference reduceGroup / GroupReduceFunction): the
    function sees the whole group as one pandas DataFrame.

    Spark-first: ``applyInPandas`` (grouped map). The reference's optional
    pre-combine (combineGroup) has no user hook here — when the reduction is
    algebraic, express it with built-in aggregates instead and Spark inserts
    the combine automatically.
    """
    return df.groupBy(*group_cols).applyInPandas(func, schema)


def summarize(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column stats (reference DataSetUtils#summarize): one output row
    per column with count/nulls/min/max/mean — computed in a single pass
    (one agg, no per-column jobs, unlike naive describe loops)."""
    cols = list(cols or df.columns)
    aggs = []
    for c in cols:
        dtype = dict(df.dtypes)[c]
        numeric = dtype in {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}
        aggs += [
            F.count(c).alias(f"{c}__count"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            (F.avg(c) if numeric else F.lit(None).cast("double")).alias(f"{c}__mean"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `{c}__count`, `{c}__nulls`, `{c}__min`, `{c}__max`, `{c}__mean`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as "
        "(column, n, nulls, min_value, max_value, mean)"
    )


def grouping_sets(
    df: DataFrame, sets: Sequence[Sequence[str]], *aggs: Column
) -> DataFrame:
    """GROUP BY GROUPING SETS (reference 1.3 batch SQL feature).

    Catalyst plans one Expand+Aggregate (a single shuffle), not a union of
    per-set aggregates.
    """
    all_cols = []
    for s in sets:
        for c in s:
            if c not in all_cols:
                all_cols.append(c)
    grouped = df.groupingSets([[F.col(c) for c in s] for s in sets],
                              *[F.col(c) for c in all_cols])
    return grouped.agg(*aggs)


def rollup(df: DataFrame, cols: Sequence[str], *aggs: Column) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals + grand total."""
    return df.rollup(*cols).agg(*aggs)


def cube(df: DataFrame, cols: Sequence[str], *aggs: Column) -> DataFrame:
    """GROUP BY CUBE — all grouping-key subsets."""
    return df.cube(*cols).agg(*aggs)
