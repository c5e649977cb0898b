"""Windowed aggregation (group windows §2.5 + window machinery §2.6).

Reference parity: Tumble/Slide/Session window assigners
(flink-streaming-java api/windowing/assigners/*.java) executed by
WindowOperator.java; Table API group windows (flink-table api/windows.scala)
with 'w.start / 'w.end properties; incremental reduce/aggregate folding
(WindowedStream#reduce/#aggregate — no buffering).

Spark-first mapping: one code path serves batch AND streaming DataFrames —
``window()`` / ``session_window()`` groupBys are incremental by design in
Structured Streaming (partial aggregation into the state store ≈ the
reference's incremental window state), and plain hash aggregation in batch.
Watermarking (bounded out-of-orderness) attaches only on streaming inputs.

Divergences (documented, SURVEY.md §2.6): per-record custom triggers and
evictors have no micro-batch equivalent — windows fire at watermark
advancement; early-firing / count triggers live in ``streaming.process``
via transformWithState.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def _flatten_window(out: DataFrame, window_col: str, keys: Sequence[str]) -> DataFrame:
    """Expose window bounds as window_start/window_end columns
    (≈ the reference's 'w.start / 'w.end window properties)."""
    agg_cols = [c for c in out.columns if c != window_col and c not in keys]
    return out.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *keys,
        *agg_cols,
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window (reference TumblingEventTimeWindows):
    output carries window_start/window_end (≈ 'w.start / 'w.end)."""
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(ts_col, size), *keys).agg(*aggs)
    return _flatten_window(out, "window", keys)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding event-time window (reference SlidingEventTimeWindows)."""
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(ts_col, size, slide), *keys).agg(*aggs)
    return _flatten_window(out, "window", keys)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows with gap merging (reference EventTimeSessionWindows —
    Spark's session_window implements the same merge-on-overlap)."""
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    return _flatten_window(out, "session_window", keys)


def processing_time_window_agg(
    df: DataFrame, size: str, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Processing-time tumbling window (reference
    TumblingProcessingTimeWindows): ingestion timestamp as event time."""
    stamped = df.withColumn("_proc_ts", F.current_timestamp())
    return tumbling_window_agg(stamped, "_proc_ts", size, keys, aggs)
