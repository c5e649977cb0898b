"""OVER-window (analytic) operator surface (§2.5).

Reference parity: Flink 1.3's streaming OVER windows
(flink-table plan/nodes/datastream/DataStreamOverAggregate.scala, runtime
Rows/RangeClauseBoundedOverProcessFunction.scala, UnboundedOverProcessFunction
.scala) — ROWS/RANGE bounded and unbounded preceding frames per key. Ranking
and offset functions (RANK/ROW_NUMBER/LAG/LEAD) are NOT in Flink 1.3 — Spark
has them all, exposed here as native extras.

Spark-first mapping: ``pyspark.sql.Window`` frames — identical semantics in
batch. (Streaming OVER needs the stateful layer — streaming.process.)

Scale notes: an OVER window is one shuffle on partitionBy keys + a
per-partition sort; frames evaluate incrementally. Skewed partition keys
(one key ≫ others) serialize into one task — prefer bounded frames and
high-cardinality keys at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window, WindowSpec


def rows_window(
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    preceding: int | None,
    following: int = 0,
) -> WindowSpec:
    """ROWS BETWEEN n PRECEDING AND m FOLLOWING (reference
    RowsClauseBoundedOverProcessFunction; None ⇒ UNBOUNDED PRECEDING)."""
    start = Window.unboundedPreceding if preceding is None else -preceding
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(start, following)
    )


def range_window(
    partition_by: Sequence[str],
    order_by: Column | str,
    preceding: int | float | None,
    following: int | float = 0,
) -> WindowSpec:
    """RANGE BETWEEN v PRECEDING AND w FOLLOWING over a numeric order key
    (reference RangeClauseBoundedOverProcessFunction; time ranges: order by
    epoch seconds)."""
    start = Window.unboundedPreceding if preceding is None else -preceding
    return (
        Window.partitionBy(*partition_by)
        .orderBy(order_by)
        .rangeBetween(start, following)
    )


def with_running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    agg: Column,
    out_col: str,
) -> DataFrame:
    """Unbounded-preceding running aggregate per key (reference
    UnboundedOverProcessFunction)."""
    w = rows_window(partition_by, order_by, None)
    return df.withColumn(out_col, agg.over(w))
