"""UDF / UDAF / UDTF surface (§2.10).

Reference parity: ScalarFunction.eval (flink-table functions/ScalarFunction.scala),
TableFunction (UDTF via lateral join / DataSetCorrelate), AggregateFunction
(UDAGG, 1.3), RichFunction open/close lifecycle, broadcast sets
(withBroadcastSet), distributed cache.

Spark-first mapping:
  - scalar UDF → ``pandas_udf`` (Arrow-batched; 10-100x over row-at-a-time) —
    registered per-session so SQL can call it too.
  - UDAGG → grouped-agg ``pandas_udf`` usable inside ``groupBy().agg``.
  - UDTF → a function returning arrays + ``explode`` (lateral join), or
    Python UDTFs (Spark 3.5+) for multi-column emission.
  - RichFunction.open() → do the setup once per Arrow batch iterator
    (``mapInPandas`` generator prologue), not per row.
  - broadcast sets → ``SparkContext.broadcast`` or a broadcast join.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def register_scalar_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str,
    vectorized: bool = True,
):
    """Register a scalar UDF callable from both DataFrame and SQL
    (reference tableEnv.registerFunction)."""
    if vectorized:
        udf = F.pandas_udf(fn, return_type)
    else:
        udf = F.udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def register_grouped_agg_udf(
    spark: SparkSession, name: str, fn: Callable, return_type: str
):
    """Register a UDAGG (reference AggregateFunction 1.3): a grouped-agg
    pandas UDF usable inside ``groupBy().agg``.

    ``fn`` must carry pandas type hints (e.g. ``def f(v: pd.Series) -> float``)
    so Spark infers the grouped-agg flavor.
    """
    udf = F.pandas_udf(fn, return_type)
    spark.udf.register(name, udf)
    return udf


def lateral_explode(
    df: DataFrame, array_col: Column, out_col: str, keep: list[str]
) -> DataFrame:
    """UDTF-style lateral join (reference DataSetCorrelate /
    ``table.join(udtf(...))``): one output row per produced element, input
    columns preserved. Inner semantics (rows producing zero elements drop);
    use ``explode_outer`` for leftOuterJoin semantics."""
    return df.select(*keep, F.explode(array_col).alias(out_col))
