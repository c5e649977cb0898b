"""Streaming curation — the incremental twin of the batch curation family.

A crawl pipeline is incremental: documents arrive as a feed, and the
curation steps that are per-record (rule filters) or keyed-stateful
(exact dedup) run continuously instead of as batch sweeps. This module
wires the published shape — file-monitoring source → quality rules →
incremental exact dedup → windowed funnel statistics — as ONE Structured
Streaming query (reference-analogue: the continuous-ingestion shape where
``ContinuousFileMonitoringFunction`` feeds the job graph,
flink-streaming-java functions/source/ContinuousFileMonitoringFunction).

State contract at scale: the rule filter is stateless (narrow map in the
scan); dedup state is one row per distinct fingerprint WITHIN the
watermark horizon (dropDuplicatesWithinWatermark — the reference's
idle-state-retention analogue, so state is bounded by churn, not
history); the windowed aggregate holds a few counters per (window) until
the watermark closes the pane. Measured beside CEP/coGroup in
scripts/stream_scale.py (events/s + state peaks at sf0.1/sf1).

The events table plays the crawl feed: ``props`` is the document payload
(fingerprinted for dedup), ``event_type``/``value`` drive the quality
rules (drop 'error' fetches and low-value records — rule SHAPE is the
point; swap predicates freely).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_3_2_hopsworks_spark.functions.text import fingerprint
from flink_1_3_2_hopsworks_spark.streaming.dedup import stream_dedup


def _default_rules() -> Column:
    return (F.col("event_type") != "error") & (F.col("value") >= 5.0)


def curation_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "props",
    rules: Column | None = None,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Rule filter → fingerprint dedup → per-window funnel stats, as one
    streaming plan (append mode: each window row emits once, when the
    watermark passes its end). Output:
    ``(window_start, window_end, n_docs, total_value)`` — surviving-doc
    count and the decimal-exact value sum per event-time window."""
    kept = stream.filter(
        rules if rules is not None else _default_rules()
    ).withColumn("_fp", fingerprint(text_col))
    deduped = stream_dedup(kept, ["_fp"], ts_col, watermark)
    agg = deduped.groupBy(F.window(F.col(ts_col), window).alias("_w")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("value"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("total_value"),
    )
    return agg.select(
        F.date_format("_w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("_w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "n_docs",
        "total_value",
    )


def curation_batch_twin(
    events: DataFrame,
    ts_col: str = "ts",
    text_col: str = "props",
    rules: Column | None = None,
    id_col: str = "event_id",
    window: str = "1 hour",
) -> DataFrame:
    """The deterministic batch equivalent (for backfills and the oracle
    gate): the streaming dedup keeps the FIRST record per fingerprint —
    in batch that is the (ts, id)-argmin per fingerprint, then the same
    windowed statistics. With in-order replay and a single availableNow
    batch, the streaming query emits exactly these rows for every window
    the final watermark closes.

    Equivalence SCOPE (the dedup-horizon caveat): this twin dedups
    GLOBALLY, while the stream's dropDuplicatesWithinWatermark evicts a
    fingerprint's state once the watermark passes it — a payload recurring
    MORE than the watermark delay later (event time, across micro-batches)
    passes the stream again but not the twin. That is the documented
    idle-state-retention trade every bounded-state streaming dedup makes
    (state ∝ churn, not history); backfills that must match a long-horizon
    stream exactly should replay with a watermark ≥ the recurrence horizon
    (a single availableNow batch behaves as watermark = ∞ within the
    batch, which is how the equivalence test and the gate hold exactly)."""
    kept = events.filter(
        rules if rules is not None else _default_rules()
    ).withColumn("_fp", fingerprint(text_col))
    firsts = (
        kept.groupBy("_fp")
        .agg(
            F.min(F.struct(ts_col, id_col, "value")).alias("_r")
        )
        .select(
            F.col(f"_r.{ts_col}").alias(ts_col),
            F.col(f"_r.value").alias("value"),
        )
    )
    agg = firsts.groupBy(F.window(F.col(ts_col), window).alias("_w")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("value"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("total_value"),
    )
    return agg.select(
        F.date_format("_w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("_w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "n_docs",
        "total_value",
    )
