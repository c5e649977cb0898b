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


def over_rows_agg_stream(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    preceding: int,
    order_col: str = "event_id",
):
    """Streaming OVER ROWS window (reference
    RowsClauseBoundedOverProcessFunction, 1.3): per key, for every record
    emit the sum over ``ROWS BETWEEN preceding PRECEDING AND CURRENT ROW``
    in arrival order — Spark streaming has no OVER, so the frame buffer
    lives in keyed state (a bounded deque of the last ``preceding`` values).

    Emits one row per input record (key, order_col, frame_sum, frame_n).
    Records are processed in ``order_col`` order within each micro-batch;
    cross-batch order follows arrival (the reference's proc-time variant).
    """
    import json

    import pandas as pd

    out_schema = (
        f"{keys[0]} long, {order_col} long, frame_sum double, frame_n long"
    )
    # Keyed state: JSON-encoded deque of the last `preceding` values (state
    # schema must be flat — a string column carries the buffer).
    state_schema = "buf string"

    def process(key, pdf_iter, state):
        buf: list[float] = json.loads(state.get[0]) if state.exists else []
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col)
            for oid, v in zip(pdf[order_col], pdf[value_col]):
                buf.append(float(v))
                if len(buf) > preceding + 1:
                    buf.pop(0)
                out_rows.append((key[0], int(oid), sum(buf), len(buf)))
        state.update((json.dumps(buf),))
        if out_rows:
            yield pd.DataFrame(
                {
                    keys[0]: [r[0] for r in out_rows],
                    order_col: [r[1] for r in out_rows],
                    "frame_sum": [round(r[2], 6) for r in out_rows],
                    "frame_n": [r[3] for r in out_rows],
                }
            )

    return df.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
