"""Registry showcase queries for the streaming layer, run in batch mode over
the ``events`` table — the window builders in ``streaming.windows`` execute
identically on batch and streaming DataFrames (SURVEY.md §2.5/§2.6), so the
DuckDB oracle checks the same semantics the stream path uses (the stream
path itself is exercised by tests/test_streaming.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.operators.aggregations import min_by
from flink_1_3_2_hopsworks_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _fmt(col: str) -> F.Column:
    return F.date_format(col, _TS_FMT).alias(col)


def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type (reference
    TumblingEventTimeWindows + incremental sum)."""
    events = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        events,
        "ts",
        "1 hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
    )
    return out.select(
        _fmt("window_start"), _fmt("window_end"), "event_type", "n_events", "total_value"
    )


def ev_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows every hour (reference
    SlidingEventTimeWindows): every event lands in two windows."""
    events = load_table(spark, sf_dir, "events")
    out = sliding_window_agg(
        events,
        "ts",
        "2 hours",
        "1 hour",
        [],
        [F.count(F.lit(1)).alias("n_events")],
    )
    return out.select(_fmt("window_start"), _fmt("window_end"), "n_events")


def ev_session_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with 5-minute gap (reference
    EventTimeSessionWindows — merge-on-overlap, end = last event + gap)."""
    events = load_table(spark, sf_dir, "events")
    out = session_window_agg(
        events,
        "ts",
        "5 minutes",
        ["user_id"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
    )
    return out.select(
        _fmt("window_start"), _fmt("window_end"), "user_id", "n_events", "total_value"
    )


def ds_stream_program(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataStream program entry point (reference §3.3: fluent
    DataStream#filter → keyBy → window(TumblingEventTimeWindows) →
    aggregate), driven END-TO-END through the api.py facade on the batch
    twin of the stream — per-user 6-hour purchase windows with count and
    max value. The facade compiles to the same incremental windowed-agg
    plan the direct spelling uses."""
    from flink_1_3_2_hopsworks_spark.api import (
        DataStream,
        TumblingEventTimeWindows,
    )

    events = load_table(spark, sf_dir, "events")
    stream = (
        DataStream(events)
        .filter(F.col("event_type") == "purchase")
        .key_by("user_id")
        .window(TumblingEventTimeWindows.of("6 hours"))
        .aggregate(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )
    return stream.map(
        _fmt("window_start"),
        _fmt("window_end"),
        F.col("user_id"),
        F.col("n_purchases"),
        F.col("max_value"),
    ).df


def ev_window_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed stream join (reference JoinedStreams: a.join(b).where(k)
    .equalTo(k).window(Tumbling 1h).apply): clicks × purchases per user
    within the same hourly window, routed through windowed_stream_join —
    the SAME plan runs streaming (stream-stream join, watermark-purged
    state) and batch (this gate); the oracle states the equivalent
    hour-bucket equi-join."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import windowed_stream_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    out = windowed_stream_join(clicks, purchases, ["user_id"], "ts", "1 hour")
    return out.select(
        "user_id",
        _fmt("window_start"),
        _fmt("window_end"),
        "click_id",
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def ev_window_cogroup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed stream coGroup (reference CoGroupedStreams: both full
    groups handed to the apply fn per (key, window) pane — including
    one-sided panes, which a join would drop). Runs the pane machinery of
    windowed_cogroup_stream in its batch twin; oracle = per-pane
    conditional aggregates over the union."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        windowed_cogroup_batch,
    )

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )

    def cg(left, right):
        return [
            {
                "n_clicks": len(left),
                "n_purchases": len(right),
                "click_value": float(left["value"].sum()) if len(left) else 0.0,
                "purchase_value": float(right["value"].sum()) if len(right) else 0.0,
            }
        ]

    out = windowed_cogroup_batch(
        clicks,
        purchases,
        ["user_id"],
        "ts",
        3600,
        cg,
        "n_clicks long, n_purchases long, click_value double, purchase_value double",
        ["value"],
    )
    return out.select(
        "user_id",
        _fmt("window_start"),
        _fmt("window_end"),
        "n_clicks",
        "n_purchases",
        F.round("click_value", 2).alias("click_value"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def ev_running_user_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed running aggregate (reference KeyedStream#sum → per-record
    emission; batch form of the update-mode stream in streaming.dedup)."""
    from flink_1_3_2_hopsworks_spark.operators.windows_over import with_running_agg

    events = load_table(spark, sf_dir, "events")
    out = with_running_agg(
        events,
        ["user_id"],
        [F.asc("ts"), F.asc("event_id")],
        F.sum("value"),
        "running_total",
    )
    return out.select(
        "user_id", "event_id", F.round("running_total", 2).alias("running_total")
    )


def ev_count_tumbling_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling COUNT windows (reference KeyedStream#countWindow(n):
    GlobalWindows + CountTrigger(n)): per user, consecutive blocks of 20
    events in event_id order; incomplete trailing blocks never fire. Runs
    the batch twin of the keyed-state streaming operator
    (process.py count_window_agg_stream — batch/stream equivalence is
    pytest-asserted); the oracle restates block = (row_number-1) // 20."""
    from flink_1_3_2_hopsworks_spark.streaming.process import (
        count_window_agg_batch,
    )

    events = load_table(spark, sf_dir, "events")
    out = count_window_agg_batch(
        events.select("user_id", "event_id", "value"),
        ["user_id"],
        "event_id",
        20,
        [
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        ],
    )
    return out.select("user_id", "window_id", "sum_value", "first_id", "last_id")


def ev_count_sliding_20_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding COUNT windows (reference KeyedStream#countWindow(size, slide)
    = GlobalWindows + CountTrigger(slide) + CountEvictor(size)): per user,
    fire on every 5th event aggregating the last ≤20 events in event_id
    order. Batch twin of the keyed-state streaming operator
    (process.py count_window_agg_stream with slide; equivalence is
    pytest-asserted); the oracle restates the ROWS frame + trigger filter."""
    from flink_1_3_2_hopsworks_spark.streaming.process import (
        sliding_count_window_agg_batch,
    )

    events = load_table(spark, sf_dir, "events")
    out = sliding_count_window_agg_batch(
        events.select("user_id", "event_id", "value"),
        ["user_id"],
        "event_id",
        20,
        5,
        "value",
    )
    return out.select(
        "user_id",
        "window_id",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


def cep_double_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP STRICT contiguity (reference Pattern#next vs #followedBy): an
    error whose IMMEDIATELY next event for that user is also an error — a
    single intervening event of any other type kills the partial, unlike
    the relaxed gates above. All-matches: k consecutive errors yield k-1
    pairs. Oracle = LAG over the per-user (ts, event_id) sequence."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

    # Project to the columns the NFA touches (guide §4.1): the pattern
    # reads event_type only, the output needs (key, ts, id) — shipping
    # ``props`` (the fat payload string) across the Arrow boundary would
    # be pure overhead. Strict contiguity forbids a TYPE filter here.
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pattern = Pattern.begin(
        "e1", lambda e: e["event_type"] == "error"
    ).next("e2", lambda e: e["event_type"] == "error")
    matches = pattern.match_batch(
        events,
        ["user_id"],
        "ts",
        "event_id",
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    return matches.select(
        "user_id",
        F.element_at("event_ids", 1).alias("first_error_id"),
        F.element_at("event_ids", 2).alias("second_error_id"),
        F.date_format("start_ts", _TS_FMT).alias("start_ts"),
        F.date_format("end_ts", _TS_FMT).alias("end_ts"),
    )


def cep_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP (reference flink-cep §2.11): signup followedBy purchase within
    30 minutes, per user — NFA over keyed event sequences. The 2-step
    relaxed pattern is equivalent to a first-match join, which the DuckDB
    oracle verifies; deeper patterns are pytest-covered (tests/test_cep.py)."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

    # Scan-level pre-filter: a begin/followedBy-only pattern (relaxed
    # contiguity, no not-steps) is insensitive to events no step can accept,
    # so irrelevant types are dropped BEFORE the Python NFA — the predicate
    # pushes into the parquet scan and the Arrow transfer shrinks to the
    # candidate rows. At 100 TB this filter, not the NFA, is the lever.
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        # Columns the NFA touches + keys/ts/id only (guide §4.1) — props
        # never crosses the Arrow boundary.
        .select("user_id", "ts", "event_id", "event_type")
    )
    pattern = (
        Pattern.begin("signup", lambda e: e["event_type"] == "signup")
        .followed_by("purchase", lambda e: e["event_type"] == "purchase")
        .within(30 * 60)
    )
    matches = pattern.match_batch(
        events,
        ["user_id"],
        "ts",
        "event_id",
        # Python-bound stage: pin full parallelism (AQE would coalesce the
        # 40%-selectivity shuffle by bytes and serialize the NFA).
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    return matches.select(
        "user_id",
        F.element_at("event_ids", 1).alias("signup_id"),
        F.element_at("event_ids", 2).alias("purchase_id"),
        F.date_format("start_ts", _TS_FMT).alias("start_ts"),
        F.date_format("end_ts", _TS_FMT).alias("end_ts"),
    )


def cep_error_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP with an ITERATIVE condition (reference flink-cep
    IterativeCondition, 1.3): an ``error`` event followed by the first event
    whose value exceeds THAT error's value, within 30 minutes, per user.
    The second predicate takes ``(event, ctx)`` and reads the already-matched
    error via ``ctx.events_for_pattern`` — inexpressible with simple
    conditions; the DuckDB oracle states it as a first-match theta join."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

    # The spike step may accept ANY event type, so no type filter — but the
    # NFA reads only event_type/value (guide §4.1 column prune).
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    pattern = (
        Pattern.begin("err", lambda e: e["event_type"] == "error")
        .followed_by(
            "spike",
            lambda e, ctx: e["value"] > ctx.events_for_pattern("err")[0]["value"],
        )
        .within(30 * 60)
    )
    matches = pattern.match_batch(
        events,
        ["user_id"],
        "ts",
        "event_id",
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    return matches.select(
        "user_id",
        F.element_at("event_ids", 1).alias("error_id"),
        F.element_at("event_ids", 2).alias("spike_id"),
        F.date_format("start_ts", _TS_FMT).alias("start_ts"),
        F.date_format("end_ts", _TS_FMT).alias("end_ts"),
    )


def cep_clean_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP negative pattern (reference Pattern#notFollowedBy): signup
    followed by its first purchase within 30 minutes, but the partial is
    KILLED if an error for that user arrives before the purchase — the
    not-step guards the gap between two positive steps. Oracle: first-match
    join + NOT EXISTS error in the (ts, event_id)-ordered gap."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

    # Keep the not-guard's event type in the scan: dropping 'error' rows
    # would silently disable the kill semantics. Column prune per §4.1.
    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase", "error"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    pattern = (
        Pattern.begin("signup", lambda e: e["event_type"] == "signup")
        .not_followed_by("err", lambda e: e["event_type"] == "error")
        .followed_by("purchase", lambda e: e["event_type"] == "purchase")
        .within(30 * 60)
    )
    matches = pattern.match_batch(
        events,
        ["user_id"],
        "ts",
        "event_id",
        num_partitions=spark.sparkContext.defaultParallelism,
    )
    return matches.select(
        "user_id",
        F.element_at("event_ids", 1).alias("signup_id"),
        F.element_at("event_ids", 2).alias("purchase_id"),
        F.date_format("start_ts", _TS_FMT).alias("start_ts"),
        F.date_format("end_ts", _TS_FMT).alias("end_ts"),
    )


def cep_signup_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP timeout side output (reference PatternStream.select timeout
    overload): signups whose purchase never arrived within 30 minutes,
    surfaced as ``timed_out`` partial matches (including the bounded-input
    end-of-flush). Oracle: NOT EXISTS first-purchase-in-window."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    pattern = (
        Pattern.begin("signup", lambda e: e["event_type"] == "signup")
        .followed_by("purchase", lambda e: e["event_type"] == "purchase")
        .within(30 * 60)
    )
    out = pattern.match_batch(
        events,
        ["user_id"],
        "ts",
        "event_id",
        num_partitions=spark.sparkContext.defaultParallelism,
        with_timeouts=True,
    )
    return out.filter(F.col("timed_out")).select(
        "user_id",
        F.element_at("event_ids", 1).alias("signup_id"),
        F.date_format("start_ts", _TS_FMT).alias("signup_ts"),
    )


def ev_first_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic streaming-dedup semantics in batch: the earliest event
    per (user, type) — what stream_dedup keeps with in-order delivery."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    first = min_by(events, ["user_id", "event_type"], "ts")
    return first.select(
        "user_id",
        "event_type",
        F.date_format("ts", _TS_FMT).alias("first_ts"),
        "event_id",
        F.round("value", 2).alias("value"),
    )


def ev_async_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Async I/O (reference AsyncDataStream.orderedWait, §2.7): enrich
    purchase events via a concurrent per-record lookup. The lookup here is a
    pure function so the DuckDB oracle can verify that the async plumbing
    (capacity-bounded event loop inside mapInPandas) returns exactly the
    sync answer; real deployments point it at an HTTP/KV endpoint."""
    import asyncio

    from flink_1_3_2_hopsworks_spark.operators.async_io import async_lookup

    # spread=True (A/B-measured 1.39 → 0.97 s): the asyncio lookup loop is
    # Python-CPU per row, and the single-file gate scan would otherwise run
    # the whole mapInPandas stage as ONE task (guide §2.5 unsplittable
    # input). Size-gated — a no-op at production scale.
    events = load_table(spark, sf_dir, "events", spread=True).filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "value")

    async def tier_lookup(row: dict) -> dict:
        await asyncio.sleep(0)  # yield — stands in for network latency
        v = row["value"]
        return {
            "tier": "high" if v >= 75.0 else ("mid" if v >= 25.0 else "low"),
            "fee": round(v * 0.03, 4),
        }

    out = async_lookup(
        events, tier_lookup, "tier string, fee double", capacity=64
    )
    return out.orderBy("event_id")


def ev_window_cogroup_agg_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused-JVM windowed coGroup (streaming/window_op.py
    windowed_cogroup_agg) — the SCALE path for aggregation-expressible
    coGroup functions: the same click/purchase pane statistics as
    ev_window_cogroup_click_purchase, but run as ONE native windowed
    aggregation over side markers (partial aggregates, counter-sized
    state, zero Python) instead of assembling full panes in Python. The
    two gates share one oracle, so the driver artifact itself proves the
    fused path equivalent to the full-pane operator on the gate corpus."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        windowed_cogroup_agg,
    )

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    aggs = [
        F.sum(F.when(F.col("_side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_clicks"),
        F.sum(F.when(F.col("_side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("_side") == 0, F.col("value"))), F.lit(0.0)
            ),
            2,
        ).alias("click_value"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("_side") == 1, F.col("value"))), F.lit(0.0)
            ),
            2,
        ).alias("purchase_value"),
    ]
    out = windowed_cogroup_agg(
        clicks, purchases, ["user_id"], "ts", 3600, aggs, ["value"]
    )
    return out.select(
        "user_id",
        _fmt("window_start"),
        _fmt("window_end"),
        "n_clicks",
        "n_purchases",
        "click_value",
        "purchase_value",
    )


def ev_curation_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming curation pipeline (streaming/curation.py
    curation_stream — rule filter → fingerprint dedup keeping the first
    record → hourly funnel stats). The twin makes the stream's per-window
    output oracle-checkable: the streaming query (tested in
    tests/test_streaming.py, measured in scripts/stream_scale.py) emits
    exactly these rows for every watermark-closed pane. ``props`` plays
    the document payload; decimal-exact value sums keep the aggregate
    order-independent."""
    from flink_1_3_2_hopsworks_spark.streaming.curation import (
        curation_batch_twin,
    )

    events = load_table(spark, sf_dir, "events")
    return curation_batch_twin(events).orderBy("window_start")


def ev_curation_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-replay twin of the streaming END-TO-END curation funnel
    (streaming/funnel.py curation_funnel_stream — rules → exact-fingerprint
    dedup → MinHash near-dedup ingest, per-epoch funnel rows, each stage's
    survivors appended to that stage's persisted store). The documents
    table plays the crawl feed split into three epochs (doc_id % 3); the
    gate RUNS the real foreachBatch body sequentially (funnel_replay — the
    documented backfill path), so the oracle checks the exact store-probe /
    keeper / star-closure algebra every epoch executes against state built
    by the epochs before it. The streaming query emits exactly these rows
    for an in-order replay (pytest-pinned in tests/test_streaming_funnel.py
    along with crash-replay idempotency). Output is 12 rows (3 epochs × 4
    stages), materialized so the epoch stores can be cleaned up."""
    import shutil
    import tempfile

    from flink_1_3_2_hopsworks_spark.streaming.funnel import funnel_replay

    docs = load_table(spark, sf_dir, "documents")
    batches = [
        docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == e) for e in range(3)
    ]
    base = tempfile.mkdtemp(prefix="funnel_gate_")
    try:
        rows = funnel_replay(batches, base).collect()  # 12 rows — bounded
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "batch_id long, stage_idx int, stage string, n_docs long, "
        "n_tokens long, id_checksum long",
    ).orderBy("batch_id", "stage_idx")


def ev_curation_funnel_stream_compacting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SELF-COMPACTING arm of ev_curation_funnel_stream: the same
    three-epoch replay with ``compact_every=2``, so epoch 2 first folds
    epochs 0-1 of both stores into the consolidated key-bucketed base
    (streaming/stores.py compact_store, write-ahead-manifest crash
    safety) and then ingests against the compacted state — its
    cross-epoch exact AND near dups must still resolve identically.
    Shares ev_curation_funnel_stream's oracle verbatim: compaction is
    verdict-equivalent by contract, so the DuckDB replay of the
    UNCOMPACTED store algebra is exactly what the compacting loop must
    reproduce (the correctness artifact itself proves the equivalence,
    not just the pytest pins in tests/test_store_compaction.py)."""
    import shutil
    import tempfile

    from flink_1_3_2_hopsworks_spark.streaming.funnel import funnel_replay

    docs = load_table(spark, sf_dir, "documents")
    batches = [
        docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == e) for e in range(3)
    ]
    base = tempfile.mkdtemp(prefix="funnel_gate_c_")
    try:
        rows = funnel_replay(batches, base, compact_every=2).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "batch_id long, stage_idx int, stage string, n_docs long, "
        "n_tokens long, id_checksum long",
    ).orderBy("batch_id", "stage_idx")


def mm_pair_curation_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-replay twin of the streaming PAIRED curation funnel
    (streaming/pair_funnel.py — caption rules → image quality → caption
    exact dedup → image exact dedup → caption MinHash near-dedup → image
    simhash near-dedup, JOINT pair survivorship, four epoch-partitioned
    key-bucketed stores). The documents table plays the paired crawl feed
    (captions = text, images = the deterministic BMP twin of the doc ids)
    split into three epochs (doc_id % 3); the gate RUNS the real
    foreachBatch body sequentially (pair_funnel_replay — the documented
    backfill path), so the oracle checks the exact cross-modal store-
    probe / keeper / double-star-closure algebra every epoch executes
    against state built by the epochs before it. Checksums bind the PAIR
    (id + caption fingerprint + image aHash). Output is 21 rows (3
    epochs × 7 stages), materialized so the epoch stores can be cleaned
    up. Reference-analogue: the two-input keyed coGroup
    (F-J/operators/CoGroupOperator.java) in a continuous-ingestion job
    graph."""
    import shutil
    import tempfile

    from flink_1_3_2_hopsworks_spark.multimodal.synth import image_twin
    from flink_1_3_2_hopsworks_spark.streaming.pair_funnel import (
        pair_funnel_replay,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select("doc_id", "text").join(
        image_twin(docs, "doc_id"), "doc_id"
    )
    batches = [
        pairs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == e)
        for e in range(3)
    ]
    base = tempfile.mkdtemp(prefix="pair_funnel_gate_")
    try:
        rows = pair_funnel_replay(batches, base).collect()  # 21 rows
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "batch_id long, stage_idx int, stage string, n_pairs long, "
        "n_tokens long, n_bytes long, pair_checksum long",
    ).orderBy("batch_id", "stage_idx")
