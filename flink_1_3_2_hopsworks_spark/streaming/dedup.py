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
