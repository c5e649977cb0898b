"""Full window machinery — triggers, evictors, allowed lateness, late-data
side output (§2.6, the reference's WindowOperator).

Reference parity: flink-streaming-java runtime/operators/windowing/
WindowOperator.java + EvictingWindowOperator.java — state-backed per-window
panes, EventTimeTrigger firing at the watermark, per-late-element re-firing
until window_end + allowedLateness, evictors
(api/windowing/evictors/{Count,Time,Delta}Evictor.java) applied before the
window function, and the too-late side output
(WindowOperator#isElementLate → OutputTag).

Spark-first mapping: built-in watermarked window aggregation covers the
incremental-agg 99% case (streaming/windows.py). THIS module is for the
cases Structured Streaming cannot express natively — full-window buffers
with eviction, re-firing on allowed-late elements, and capturing (not
silently dropping) too-late records. It runs on ``applyInPandasWithState``
with EventTimeTimeout: the window's pane is keyed state, the trigger is an
event-time timer at window_end (then a cleanup timer at
window_end + lateness), and too-late records are emitted tagged
``late=true`` instead of routed to a side stream (one output schema —
filter on the flag to split, same DAG-reuse trick as operators/routing.py).

Semantics vs the reference (micro-batch granularity):
  - fire-at-watermark: exact (timer fires when the watermark passes it);
  - per-late-element re-fire: batched — one updated firing per micro-batch
    containing allowed-late elements, not one per element;
  - evictBefore only (the reference's default; evictAfter is not exposed).

Scale notes: one shuffle on (keys, window_start); pane state is bounded by
the evictor (count/time evictors cap it) and cleared at cleanup time —
unbounded only if no evictor AND long lateness, same as the reference.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.streaming.keys import (
    key_casters,
    key_fields_ddl,
    key_py_values,
)

# An evictor takes (records, window_end_ms) and returns the records to KEEP,
# in ts order. The same callable type serves both hooks of the reference's
# 1.3 Evictor interface: ``evictor`` = evictBefore (prunes the pane copy
# handed to the window function), ``evictor_after`` = evictAfter (prunes the
# RETAINED pane state after each fire — e.g. a keep-none evictor after a
# count trigger gives FIRE_AND_PURGE semantics).
Evictor = Callable[[list[dict], int], list[dict]]


def purge_evictor() -> Evictor:
    """Keep nothing — as ``evictor_after`` this purges pane state on every
    fire (reference PurgingTrigger composition)."""

    def evict(records: list[dict], window_end_ms: int) -> list[dict]:
        return []

    return evict


def count_evictor(max_count: int) -> Evictor:
    """Keep the last ``max_count`` elements (reference CountEvictor)."""

    def evict(records: list[dict], window_end_ms: int) -> list[dict]:
        # records[-0:] would be the WHOLE list — guard the keep-none case
        return records[-max_count:] if max_count > 0 else []

    return evict


def time_evictor(keep_seconds: float) -> Evictor:
    """Keep elements within ``keep_seconds`` of the pane's newest element
    (reference TimeEvictor)."""
    keep_ms = int(keep_seconds * 1000)

    def evict(records: list[dict], window_end_ms: int) -> list[dict]:
        if not records:
            return records
        newest = max(r["_ts_ms"] for r in records)
        return [r for r in records if r["_ts_ms"] >= newest - keep_ms]

    return evict


def delta_evictor(threshold: float, delta_fn: Callable[[dict, dict], float]) -> Evictor:
    """Keep elements whose delta to the newest element is below ``threshold``
    (reference DeltaEvictor with a DeltaFunction)."""

    def evict(records: list[dict], window_end_ms: int) -> list[dict]:
        if not records:
            return records
        newest = records[-1]
        return [r for r in records if delta_fn(r, newest) < threshold]

    return evict


def windowed_process_stream(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: float,
    process_fn: Callable[[pd.DataFrame], list[dict]],
    out_fields: str,
    value_cols: Sequence[str],
    allowed_lateness_seconds: float = 0.0,
    evictor: Evictor | None = None,
    evictor_after: Evictor | None = None,
    emit_late: bool = False,
    watermark_delay_seconds: float = 5.0,
    late_capture_seconds: float | None = None,
    count_trigger_every: int | None = None,
) -> DataFrame:
    """Tumbling-window full-pane operator with trigger/evictor/lateness
    semantics (reference WindowOperator + ProcessWindowFunction).

    ``df`` must be UN-watermarked — the operator applies its own. Per (keys,
    window): elements buffer in keyed state; when the watermark
    (max event time − ``watermark_delay_seconds``) passes window_end the
    evictor prunes the pane and ``process_fn`` (full-window function) emits
    rows; allowed-late elements re-fire an updated result (``late=false`` —
    a retraction-style update); elements past window_end + lateness are
    emitted with ``late=true`` when ``emit_late`` (the side-output
    analogue), else dropped.

    Watermark mechanics: Spark's stateful operators silently drop input
    rows older than the previous batch's watermark, which would defeat
    allowed-lateness and the side output. The operator therefore registers
    an over-provisioned watermark (delay + window + lateness +
    ``late_capture_seconds``) so late rows survive Spark's filter, and
    internally shifts it back to the TRUE watermark for all trigger/cleanup
    decisions — firing times match the reference exactly. The cost: too-late
    rows arriving more than ``late_capture_seconds`` (default: one window)
    past cleanup are dropped by Spark before the side output sees them
    (partial capture — raise the grace to widen it).

    ``process_fn`` receives the pane as a DataFrame (columns: ``value_cols``
    + ``_ts_ms``) and returns a list of result dicts matching
    ``out_fields`` (e.g. ``"n long, total double"``).

    ``count_trigger_every=N`` adds early firings (reference CountTrigger
    composed with EventTimeTrigger, FIRE without purge): whenever the pane
    has grown past a multiple of N before the watermark reaches window_end,
    the accumulated pane is emitted early (at micro-batch granularity — one
    early firing per batch that crosses a boundary); the end-of-window
    firing still happens.
    """
    key_fields = key_fields_ddl(df, keys)
    casters = key_casters(df, keys)
    schema = (
        f"{key_fields}, window_start timestamp, window_end timestamp, "
        f"{out_fields}, late boolean"
    )
    window_ms = int(window_seconds * 1000)
    lateness_ms = int(allowed_lateness_seconds * 1000)
    capture_s = window_seconds if late_capture_seconds is None else late_capture_seconds
    # spark_wm = true_wm − shift; timers are registered in spark-wm time.
    shift_ms = int((window_seconds + allowed_lateness_seconds + capture_s) * 1000)
    total_delay_s = watermark_delay_seconds + shift_ms / 1000.0

    with_win = (
        df.withWatermark(ts_col, f"{total_delay_s} seconds")
        .withColumn("_ts_ms", (F.col(ts_col).cast("double") * 1000).cast("long"))
        .withColumn(
            "_win_start_ms", F.col("_ts_ms") - F.col("_ts_ms") % F.lit(window_ms)
        )
    )
    group_cols = [*keys, "_win_start_ms"]
    carry = [*value_cols, "_ts_ms"]

    def fire(key, buf: list[dict], late: bool):
        start_ms = key[-1]
        end_ms = start_ms + window_ms
        pane = sorted(buf, key=lambda r: r["_ts_ms"])
        if evictor is not None and not late:
            pane = evictor(pane, end_ms)
        if not pane:
            return []
        rows = process_fn(pd.DataFrame(pane))
        return [
            {
                **dict(zip(keys, key[:-1])),
                "window_start": pd.Timestamp(start_ms * 1_000_000),
                "window_end": pd.Timestamp(end_ms * 1_000_000),
                **row,
                "late": late,
            }
            for row in rows
        ]

    def process(key, pdf_iter, state):
        # key = (*keys, _win_start_ms epoch-ms long).
        start_ms = int(key[-1])
        norm_key = (*key_py_values(casters, key[:-1]), start_ms)
        end_ms = start_ms + window_ms
        cleanup_ms = end_ms + lateness_ms

        def true_wm() -> int:
            spark_wm = state.getCurrentWatermarkMs()
            return spark_wm + shift_ms if spark_wm > 0 else 0

        def set_timer(at_true_ms: int) -> None:
            state.setTimeoutTimestamp(at_true_ms - shift_ms)

        def load():
            if not state.exists:
                return [], 0, False
            d = json.loads(state.get[0])
            return d["b"], d.get("ec", 0), state.get[1]

        def save(buf, ec, fired) -> None:
            state.update((json.dumps({"b": buf, "ec": ec}), fired))

        def evict_after(buf: list[dict]) -> list[dict]:
            # Reference Evictor#evictAfter (1.3): prune RETAINED pane state
            # after a fire; evictBefore only touched the emitted copy.
            if evictor_after is None:
                return buf
            return evictor_after(sorted(buf, key=lambda r: r["_ts_ms"]), end_ms)

        if state.hasTimedOut:
            # End-of-window timer (first fire) or cleanup timer (state GC —
            # the pane cannot have changed since the last fire, so no
            # re-emission; re-fires happen only on late DATA).
            buf, ec, fired_before = load()
            out = [] if fired_before else fire(norm_key, buf, False)
            if not fired_before:
                buf = evict_after(buf)
            if true_wm() >= cleanup_ms:
                state.remove()
            else:
                save(buf, ec, True)
                set_timer(cleanup_ms)
            if out:
                yield pd.DataFrame(out)
            return

        incoming: list[dict] = []
        for pdf in pdf_iter:
            incoming.extend(pdf[carry].to_dict("records"))
        wm = true_wm()

        if wm >= cleanup_ms:
            # Past allowed lateness (reference isElementLate): the incoming
            # records go to the side output (or are dropped). If the pane is
            # still around because its cleanup timer hadn't fired yet, fire
            # it now iff it never fired, then clear it.
            out: list[dict] = []
            if state.exists:
                buf, _, fired_before = load()
                if not fired_before:
                    out.extend(fire(norm_key, buf, False))
                state.remove()
            if emit_late and incoming:
                out.extend(fire(norm_key, incoming, True))
            if out:
                yield pd.DataFrame(out)
            return

        buf, ec, fired_before = load()
        buf.extend(incoming)

        if wm >= end_ms:
            # Watermark already past window end: allowed-late element(s) —
            # re-fire updated result immediately (reference fires per late
            # element; micro-batch fires once per batch).
            out = fire(norm_key, buf, False)
            buf = evict_after(buf)
            if wm >= cleanup_ms:
                state.remove()
            else:
                save(buf, ec, True)
                set_timer(cleanup_ms)
            if out:
                yield pd.DataFrame(out)
        else:
            out = []
            if (
                count_trigger_every
                and len(buf) // count_trigger_every > ec // count_trigger_every
            ):
                # CountTrigger early firing: accumulated pane unless an
                # evictAfter prunes it (purge_evictor → FIRE_AND_PURGE).
                out = fire(norm_key, buf, False)
                buf = evict_after(buf)
                ec = len(buf)
            save(buf, ec, fired_before)
            set_timer(end_ms)
            if out:
                yield pd.DataFrame(out)

    return with_win.groupBy(*group_cols).applyInPandasWithState(
        process,
        outputStructType=schema,
        stateStructType="buf string, fired boolean",
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def windowed_cogroup_stream(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: float,
    cogroup_fn: Callable[[pd.DataFrame, pd.DataFrame], list[dict]],
    out_fields: str,
    value_cols: Sequence[str],
    allowed_lateness_seconds: float = 0.0,
    watermark_delay_seconds: float = 5.0,
) -> DataFrame:
    """Streaming windowed coGroup (reference CoGroupedStreams:
    ``a.coGroup(b).where(k).equalTo(k).window(assigner).apply(f)``) — and,
    with an inner-pairing ``cogroup_fn``, the windowed stream JOIN
    (JoinedStreams is implemented via coGroup in the reference too).

    Tags the two inputs, unions them (both must share ``keys``, ``ts_col``
    and ``value_cols``; pass both UN-watermarked — the window operator
    watermarks the union), buffers per (keys, window) pane, and at the
    watermark hands BOTH full groups to ``cogroup_fn(left_pdf, right_pdf)``.
    """
    tag = lambda d, t: d.select(  # noqa: E731
        *keys, ts_col, *value_cols, F.lit(t).alias("_side")
    )
    both = tag(left, 0).unionByName(tag(right, 1))

    def process_fn(pane: pd.DataFrame) -> list[dict]:
        return cogroup_fn(pane[pane["_side"] == 0], pane[pane["_side"] == 1])

    return windowed_process_stream(
        both,
        keys,
        ts_col,
        window_seconds,
        process_fn,
        out_fields,
        [*value_cols, "_side"],
        allowed_lateness_seconds=allowed_lateness_seconds,
        watermark_delay_seconds=watermark_delay_seconds,
    )


def side_col(side: int, col=None):
    """Column helper for :func:`windowed_cogroup_agg`: the value of ``col``
    on rows from ``side`` (0 = left, 1 = right), NULL elsewhere. Aggregate
    functions skip NULLs, so ``F.count(side_col(0))`` counts left-side rows
    and ``F.sum(side_col(1, "value"))`` sums the right side's values —
    each pane aggregate stays one JVM expression."""
    v = F.lit(1) if col is None else (F.col(col) if isinstance(col, str) else col)
    return F.when(F.col("_side") == side, v)


def windowed_cogroup_agg(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: float,
    aggs: Sequence,
    value_cols: Sequence[str],
    watermark_delay_seconds: float = 5.0,
) -> DataFrame:
    """Fused-JVM windowed coGroup for AGGREGATION-expressible functions —
    the scale path (reference CoGroupedStreams runs inside WindowOperator,
    JVM end-to-end; our full-pane ``windowed_cogroup_stream`` crosses into
    Python per pane and was measured at ~4–5k events/s vs ~87–640k for the
    native windowed join at sf0.1–sf1, SCALE_SF1.json stream_stateful).
    When the coGroup function is per-pane aggregation over the two groups
    (counts, sums, mins, avgs — the overwhelmingly common case), express it
    as ``aggs`` over :func:`side_col` markers and this runs as ONE native
    windowed aggregation: partial (map-side) aggregates, a few counters of
    state per (key, window) instead of the full buffered pane, zero Python,
    watermark-driven append emission at the same pane timing.

    Works on BATCH frames too (withWatermark is a no-op there) — the same
    call serves backfills, which is what the equivalence tests pin against
    the full-pane operator. For functions that genuinely need both full
    groups (pairings, orderings), use ``windowed_cogroup_stream`` and
    accept its measured envelope, or restructure as `windowed_stream_join`.
    """
    tag = lambda d, t: d.select(  # noqa: E731
        *keys, ts_col, *value_cols, F.lit(t).alias("_side")
    )
    both = tag(left, 0).unionByName(tag(right, 1))
    if both.isStreaming:
        both = both.withWatermark(ts_col, f"{watermark_delay_seconds} seconds")
    # Millisecond precision to stay pane-for-pane equivalent with the
    # full-pane operator (which buckets on int(window_seconds*1000) ms);
    # plain int(window_seconds) would reject 0.5 and silently truncate 90.7.
    win = F.window(F.col(ts_col), f"{int(window_seconds * 1000)} milliseconds")
    out = both.groupBy(win.alias("_w"), *keys).agg(*aggs)
    return out.select(
        *keys,
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *[c for c in out.columns if c not in ("_w", *keys)],
    )


def windowed_cogroup_batch(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    window_seconds: float,
    cogroup_fn: Callable[[pd.DataFrame, pd.DataFrame], list[dict]],
    out_fields: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Batch twin of :func:`windowed_cogroup_stream` (same pane semantics,
    applyInPandas over (keys, window) groups) — for backfills and tests."""
    key_fields = key_fields_ddl(left, keys)
    schema = (
        f"{key_fields}, window_start timestamp, window_end timestamp, "
        f"{out_fields}"
    )
    window_ms = int(window_seconds * 1000)
    tag = lambda d, t: d.select(  # noqa: E731
        *keys, ts_col, *value_cols, F.lit(t).alias("_side")
    )
    both = (
        tag(left, 0)
        .unionByName(tag(right, 1))
        .withColumn(
            "_win_start",
            F.window(
                F.col(ts_col), f"{int(window_seconds * 1000)} milliseconds"
            ).start,
        )
        .withColumn("_ts_ms", (F.col(ts_col).cast("double") * 1000).cast("long"))
    )

    def run(key_pdf: pd.DataFrame) -> pd.DataFrame:
        start = key_pdf.iloc[0]["_win_start"]
        start_ms = int(pd.Timestamp(start).value // 1_000_000)
        pane = key_pdf.sort_values("_ts_ms")
        rows = cogroup_fn(pane[pane["_side"] == 0], pane[pane["_side"] == 1])
        return pd.DataFrame(
            [
                {
                    **{k: key_pdf.iloc[0][k] for k in keys},
                    "window_start": pd.Timestamp(start_ms * 1_000_000),
                    "window_end": pd.Timestamp((start_ms + window_ms) * 1_000_000),
                    **row,
                }
                for row in rows
            ]
        )

    return both.groupBy(*keys, "_win_start").applyInPandas(run, schema)


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    window: str,
    watermark_delay: str = "5 seconds",
    how: str = "inner",
) -> DataFrame:
    """Streaming per-window equi-join (reference JoinedStreams:
    ``a.join(b).where(k).equalTo(k).window(assigner).apply(join_fn)``) —
    the SPARK-NATIVE path: both sides watermarked, bucketed into the same
    tumbling window, then stream-stream joined on (keys, window). Spark's
    symmetric hash join + watermark state cleanup is strictly stronger than
    the reference's buffer-both-sides WindowOperator (state is purged as
    the watermark passes, pairs emit incrementally instead of at window
    end). Outer modes are supported (left/right/full emit null-padded rows
    at watermark — the reference's coGroup-based outer has the same
    at-window-end timing).

    Column names (besides ``on`` and ``ts_col``) must be disjoint across
    the two inputs; outputs gain ``window_start``/``window_end``.
    """
    lw = (
        left.withWatermark(ts_col, watermark_delay)
        .withColumn("_w", F.window(F.col(ts_col), window))
        .drop(ts_col)
    )
    rw = (
        right.withWatermark(ts_col, watermark_delay)
        .withColumn("_w", F.window(F.col(ts_col), window))
        .drop(ts_col)
    )
    return (
        lw.join(rw, [*on, "_w"], how)
        .withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )
