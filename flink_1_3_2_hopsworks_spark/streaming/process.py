"""Low-level stateful processing — the ProcessFunction layer (§2.7).

Reference parity: ProcessFunction / KeyedProcessOperator (per-record hook +
keyed state + timers, flink-streaming-java api/functions/ProcessFunction.java,
api/operators/KeyedProcessOperator.java) — the primitive under count windows,
custom triggers, streaming OVER and CEP.

Spark-first mapping: ``applyInPandasWithState`` (Spark 3.4+) gives per-key
state with append/update emission — enough for trigger-style operators.
(PySpark 4.x's ``transformWithStateInPandas`` adds timers + Map/ListState
and would be the closer ProcessFunction analogue, but its driver worker
requires google.protobuf, absent from this environment.) First concrete
operator: count windows (reference KeyedStream#countWindow = GlobalWindows +
CountTrigger), which Spark lacks natively.

Batch fallback: the same count-window semantics via window row_number
arithmetic, so one operator definition serves both modes (mirroring the
reference's batch/stream duality).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def count_window_agg_batch(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    size: int,
    aggs: Sequence[Column],
) -> DataFrame:
    """Count windows (batch mode): per key, consecutive blocks of ``size``
    records in ``order_col`` order, aggregated per full block — matches the
    reference's countWindow(n) trigger-on-nth-element semantics (incomplete
    trailing blocks do not fire)."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    blocks = (
        df.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .withColumn("_win", (F.col("_rn") / size).cast("bigint"))
    )
    per_block = blocks.groupBy(*keys, "_win").agg(
        F.count(F.lit(1)).alias("_n"), *aggs
    )
    return (
        per_block.filter(F.col("_n") == size)
        .drop("_n")
        .withColumnRenamed("_win", "window_id")
    )


def count_window_agg_stream(
    df: DataFrame,
    keys: Sequence[str],
    size: int,
    value_col: str,
    ts_col: str = "ts",
):
    """Count windows (streaming): per-key buffer in keyed state, emitting an
    aggregate row every ``size`` records (reference GlobalWindows +
    CountTrigger(size) + sum aggregate). Emits (key, window_id, n, sum_value).

    Implementation: ``applyInPandasWithState`` (Spark 3.4+ keyed-state API).
    PySpark 4.x's transformWithStateInPandas would be the closer
    ProcessFunction analogue (it adds timers + Map/ListState), but its driver
    worker needs google.protobuf, which this environment does not ship —
    the GroupState path below covers count-window semantics fully.
    """
    import pandas as pd

    out_schema = f"{keys[0]} long, window_id long, n long, sum_value double"
    state_schema = "total double, n long, window_id long"

    def process(key, pdf_iter, state):
        if state.exists:
            total, n, window_id = state.get
        else:
            total, n, window_id = 0.0, 0, 0
        out = []
        for pdf in pdf_iter:
            for v in pdf[value_col]:
                total += float(v)
                n += 1
                if n == size:
                    out.append((key[0], window_id, n, total))
                    total, n, window_id = 0.0, 0, window_id + 1
        state.update((total, n, window_id))
        if out:
            yield pd.DataFrame(
                {
                    keys[0]: [o[0] for o in out],
                    "window_id": [o[1] for o in out],
                    "n": [o[2] for o in out],
                    "sum_value": [o[3] for o in out],
                }
            )

    return df.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
