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

from flink_1_3_2_hopsworks_spark.streaming.keys import (
    key_casters,
    key_fields_ddl,
    key_py_values,
)


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


def sliding_count_window_agg_batch(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    size: int,
    slide: int,
    value_col: str,
) -> DataFrame:
    """Sliding count windows (batch mode): reference
    KeyedStream#countWindow(size, slide) = GlobalWindows +
    CountTrigger(slide) + CountEvictor(size) — fire on every ``slide``-th
    record per key, aggregating the last min(seen, size) records.

    Spark-first: a ROWS-frame window aggregate evaluated at every row,
    filtered to the trigger rows (rn % slide == 0) — no Python, one
    shuffle on the keys, WholeStageCodegen throughout. Emits the same
    (keys, window_id, n, sum_value) shape as the streaming twin so the
    batch/stream equivalence test can diff them directly."""
    order_w = Window.partitionBy(*keys).orderBy(order_col)
    frame_w = order_w.rowsBetween(-(size - 1), 0)
    return (
        df.withColumn("_rn", F.row_number().over(order_w))
        .withColumn("n", F.count(F.lit(1)).over(frame_w))
        .withColumn("sum_value", F.sum(F.col(value_col).cast("double")).over(frame_w))
        .filter(F.col("_rn") % slide == 0)
        .select(
            *keys,
            ((F.col("_rn") / slide).cast("bigint") - 1).alias("window_id"),
            "n",
            "sum_value",
        )
    )


def count_window_agg_stream(
    df: DataFrame,
    keys: Sequence[str],
    size: int,
    value_col: str,
    ts_col: str = "ts",
    slide: int | None = None,
):
    """Count windows (streaming): per-key buffer in keyed state, emitting an
    aggregate row every ``size`` records (reference GlobalWindows +
    CountTrigger(size) + sum aggregate). Emits (keys..., window_id, n,
    sum_value). Key column types are derived from ``df.schema`` (string and
    composite keys work — not just integers).

    With ``slide`` set this is the two-arg reference
    KeyedStream#countWindow(size, slide) = GlobalWindows + CountTrigger(slide)
    + CountEvictor(size): fire every ``slide`` records over the last
    min(seen, size) values.

    Implementation: ``applyInPandasWithState`` (Spark 3.4+ keyed-state API).
    PySpark 4.x's transformWithStateInPandas would be the closer
    ProcessFunction analogue (it adds timers + Map/ListState), but its driver
    worker needs google.protobuf, which this environment does not ship —
    the GroupState path below covers count-window semantics fully.
    """
    import json

    import pandas as pd

    out_schema = (
        f"{key_fields_ddl(df, keys)}, window_id long, n long, sum_value double"
    )
    casters = key_casters(df, keys)

    def _ordered(pdf_iter) -> "pd.DataFrame | None":
        # Micro-batch rows arrive partition-interleaved AND chunked by
        # Arrow batch size; concatenate the key's whole micro-batch FIRST,
        # then sort once by (ts, event_id) — a per-chunk sort would still
        # leak shuffle order across chunk boundaries for >10k-row keys.
        # Inputs lacking both columns keep arrival order (pure
        # processing-time streams, the reference GlobalWindows default).
        chunks = list(pdf_iter)
        if not chunks:
            return None
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        cols = [c for c in (ts_col, "event_id") if c in pdf.columns]
        return pdf.sort_values(cols, kind="stable") if cols else pdf

    if slide is None:
        # Tumbling: scalar running state, no buffer needed.
        state_schema = "total double, n long, window_id long"

        def process(key, pdf_iter, state):
            if state.exists:
                total, n, window_id = state.get
            else:
                total, n, window_id = 0.0, 0, 0
            kv = key_py_values(casters, key)
            out = []
            batch = _ordered(pdf_iter)
            if batch is not None:
                for v in batch[value_col]:
                    total += float(v)
                    n += 1
                    if n == size:
                        out.append((*kv, window_id, n, total))
                        total, n, window_id = 0.0, 0, window_id + 1
            state.update((total, n, window_id))
            if out:
                yield pd.DataFrame(out, columns=[*keys, "window_id", "n", "sum_value"])

    else:
        # Sliding: CountEvictor(size) keeps the last `size` values in state;
        # CountTrigger(slide) fires every `slide` records. State is bounded
        # by `size` floats per key — the evictor bound, same as the reference.
        state_schema = "buf string, since long, window_id long"

        def process(key, pdf_iter, state):
            if state.exists:
                raw, since, window_id = state.get
                buf = json.loads(raw)
            else:
                buf, since, window_id = [], 0, 0
            kv = key_py_values(casters, key)
            out = []
            batch = _ordered(pdf_iter)
            if batch is not None:
                for v in batch[value_col]:
                    buf.append(float(v))
                    if len(buf) > size:
                        buf.pop(0)
                    since += 1
                    if since == slide:
                        out.append((*kv, window_id, len(buf), sum(buf)))
                        since, window_id = 0, window_id + 1
            state.update((json.dumps(buf), since, window_id))
            if out:
                yield pd.DataFrame(out, columns=[*keys, "window_id", "n", "sum_value"])

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
        f"{key_fields_ddl(df, keys)}, {order_col} long, "
        "frame_sum double, frame_n long"
    )
    # Keyed state: JSON-encoded deque of the last `preceding` values (state
    # schema must be flat — a string column carries the buffer).
    state_schema = "buf string"
    casters = key_casters(df, keys)

    def process(key, pdf_iter, state):
        buf: list[float] = json.loads(state.get[0]) if state.exists else []
        kv = key_py_values(casters, key)
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col)
            for oid, v in zip(pdf[order_col], pdf[value_col]):
                buf.append(float(v))
                if len(buf) > preceding + 1:
                    buf.pop(0)
                out_rows.append((*kv, int(oid), round(sum(buf), 6), len(buf)))
        state.update((json.dumps(buf),))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[*keys, order_col, "frame_sum", "frame_n"]
            )

    return df.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def keyed_process_stream(
    df: DataFrame,
    keys: Sequence[str],
    on_event,
    on_timer,
    out_fields: str,
    value_cols: Sequence[str],
    ts_col: str = "ts",
    watermark_delay_seconds: float = 5.0,
    late_grace_seconds: float = 3600.0,
):
    """Generic keyed ProcessFunction (reference ProcessFunction +
    KeyedProcessOperator + TimerService, §2.7): per-record hook with
    per-key state and MULTIPLE event-time timers.

    ``on_event(state: dict, event: dict, ctx) -> list[dict]`` runs per
    record (event-time order within a micro-batch); ``on_timer(state: dict,
    timer_ms: int, ctx) -> list[dict]`` runs when the watermark passes a
    registered timer. Both mutate ``state`` (a JSON-safe dict) in place and
    return output rows matching ``out_fields``. ``ctx`` exposes
    ``register_event_time_timer(ms)`` / ``delete_event_time_timer(ms)`` /
    ``current_watermark()`` — the TimerService surface.

    Implementation: applyInPandasWithState with EventTimeTimeout. Spark
    allows ONE timeout per key, the reference allows many — so the timer
    set lives in state and the EARLIEST pending timer is mapped onto
    Spark's timeout; each invocation first drains every timer the watermark
    has passed (in order), exactly reproducing multi-timer semantics at
    micro-batch granularity. The watermark is over-provisioned by
    ``late_grace_seconds`` and shifted back internally (see window_op.py)
    so late records still reach on_event instead of being pre-filtered;
    timers still fire at the TRUE watermark.
    """
    import json

    import pandas as pd

    schema = f"{key_fields_ddl(df, keys)}, {out_fields}"
    casters = key_casters(df, keys)
    shift_ms = int(late_grace_seconds * 1000)
    total_delay = watermark_delay_seconds + late_grace_seconds

    class _Ctx:
        def __init__(self, timers: list[int], wm: int):
            self.timers = timers
            self._wm = wm

        def register_event_time_timer(self, at_ms: int) -> None:
            if at_ms not in self.timers:
                self.timers.append(at_ms)

        def delete_event_time_timer(self, at_ms: int) -> None:
            if at_ms in self.timers:
                self.timers.remove(at_ms)

        def current_watermark(self) -> int:
            return self._wm

    def process(key, pdf_iter, state):
        if state.exists:
            data = json.loads(state.get[0])
            user_state, timers = data["u"], data["t"]
        else:
            user_state, timers = {}, []
        spark_wm = state.getCurrentWatermarkMs()
        wm = spark_wm + shift_ms if spark_wm > 0 else 0
        ctx = _Ctx(timers, wm)
        key_vals = dict(zip(keys, key_py_values(casters, key)))
        out_rows: list[dict] = []

        def drain_timers() -> None:
            while ctx.timers and min(ctx.timers) <= wm:
                t = min(ctx.timers)
                ctx.timers.remove(t)
                out_rows.extend(
                    {**key_vals, **r} for r in on_timer(user_state, t, ctx)
                )

        drain_timers()  # timers the watermark passed before this batch
        events: list[dict] = []
        for pdf in pdf_iter:
            events.extend(
                pdf[[ts_col, *value_cols]]
                .assign(_ts_ms=lambda p: p[ts_col].astype("int64") // 1_000_000)
                .sort_values("_ts_ms")
                .drop(columns=[ts_col])
                .to_dict("records")
            )
        for ev in events:
            out_rows.extend({**key_vals, **r} for r in on_event(user_state, ev, ctx))
        drain_timers()  # timers registered during this batch, already due

        state.update((json.dumps({"u": user_state, "t": ctx.timers}),))
        if ctx.timers:
            nxt = min(ctx.timers) - shift_ms
            if nxt > spark_wm:
                state.setTimeoutTimestamp(nxt)
            else:  # already due in spark time — fire next batch
                state.setTimeoutTimestamp(spark_wm + 1)
        if out_rows:
            yield pd.DataFrame(out_rows)

    return (
        df.withWatermark(ts_col, f"{total_delay} seconds")
        .groupBy(*keys)
        .applyInPandasWithState(
            process,
            outputStructType=schema,
            stateStructType="data string",
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def over_range_agg_stream(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    range_seconds: float,
    ts_col: str = "ts",
    order_col: str = "event_id",
):
    """Streaming OVER RANGE window (reference
    RangeClauseBoundedOverProcessFunction, 1.3): per key, for every record
    emit the aggregate over ``RANGE BETWEEN range_seconds PRECEDING AND
    CURRENT ROW`` in event time. The frame buffer is keyed state: a list of
    (ts_ns, value) pruned below ``cur_ts - range`` as each record lands —
    state size is bounded by the range span × per-key rate, exactly the
    reference's cleanup-timer bound.

    Emits one row per input record (key, order_col, ts_ns, frame_sum,
    frame_n). Records are processed in event-time order within each
    micro-batch; a record arriving in a later batch with an older timestamp
    still aggregates over whatever frame state remains (the reference drops
    such records at the watermark instead — divergence documented).
    """
    import json

    import pandas as pd

    out_schema = (
        f"{key_fields_ddl(df, keys)}, {order_col} long, ts_ns long, "
        "frame_sum double, frame_n long"
    )
    state_schema = "buf string"
    range_ns = int(range_seconds * 1_000_000_000)
    casters = key_casters(df, keys)

    def process(key, pdf_iter, state):
        buf: list[list] = json.loads(state.get[0]) if state.exists else []
        kv = key_py_values(casters, key)
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col, order_col])
            for oid, ts, v in zip(pdf[order_col], pdf[ts_col], pdf[value_col]):
                ts_ns = int(pd.Timestamp(ts).value)
                buf.append([ts_ns, float(v)])
                lo = ts_ns - range_ns
                buf = [e for e in buf if e[0] >= lo]
                out_rows.append(
                    (
                        *kv,
                        int(oid),
                        ts_ns,
                        round(sum(e[1] for e in buf), 6),
                        len(buf),
                    )
                )
        state.update((json.dumps(buf),))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[*keys, order_col, "ts_ns", "frame_sum", "frame_n"],
            )

    return df.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
