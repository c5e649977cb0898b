"""Streaming deduplication + running aggregates (§2.7 keyed running ops).

Reference parity: keyed running reduce/sum/min/max (KeyedStream →
StreamGroupedReduce emits per record) and state-TTL'd distinct
(QueryConfig idle-state retention, 1.3).

Spark-first mapping: ``dropDuplicates`` on a streaming DF keeps keys in the
state store; ``withWatermark`` + ``dropDuplicatesWithinWatermark`` bounds
state (≈ idle-state retention). Running aggregates are ``groupBy().agg()``
in update output mode (≈ retract-stream consumption).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first record per key. With ``watermark`` given (streaming),
    state is bounded via dropDuplicatesWithinWatermark — the reference's
    idle-state-retention analogue."""
    if watermark is not None and df.isStreaming and ts_col is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return df.dropDuplicates(list(keys))


def running_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Continuous per-key aggregate (reference keyed reduce/sum/min/max).
    On a streaming DF, emit in **update** output mode for per-key refreshes
    (≈ toRetractStream); in batch it's a plain aggregation."""
    return df.groupBy(*keys).agg(*aggs)


def running_agg_with_ttl(
    df: DataFrame,
    key: str,
    value_col: str,
    idle_retention_seconds: float,
) -> DataFrame:
    """Continuous per-key sum/count with idle-state retention (reference
    QueryConfig#withIdleStateRetentionTime, 1.3): a key whose state has not
    been updated for ``idle_retention_seconds`` is evicted — the aggregate
    RESTARTS if the key reappears, exactly the reference's documented
    trade-off. Plain streaming groupBy state can never be dropped (no
    watermark on an unbounded agg); this variant keeps total state ∝
    ACTIVE keys, the 100 TB requirement for high-churn key spaces.

    Emits (key, total, n) per updated key per micro-batch (update mode).
    """
    import json

    import pandas as pd

    out_schema = f"{key} long, total double, n long"
    state_schema = "acc string"
    timeout_ms = int(idle_retention_seconds * 1000)

    def process(k, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()  # idle eviction — QueryConfig retention fired
            return
        total, n = (
            tuple(json.loads(state.get[0])) if state.exists else (0.0, 0)
        )
        for pdf in pdf_iter:
            total += float(pdf[value_col].sum())
            n += len(pdf)
        state.update((json.dumps([total, n]),))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({key: [k[0]], "total": [round(total, 6)], "n": [n]})

    return df.groupBy(key).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="ProcessingTimeTimeout",
    )
