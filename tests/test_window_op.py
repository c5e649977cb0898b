"""WindowOperator machinery tests (§2.6): evictors, fire-at-watermark,
allowed-lateness re-fire, too-late side output, and windowed coGroup —
mirrors the reference's WindowOperatorTest harness style (scripted elements
+ watermark, assert emitted panes)."""

from __future__ import annotations

import shutil
import tempfile
import time
from datetime import datetime, timedelta

import pandas as pd
import pytest

from flink_1_3_2_hopsworks_spark.streaming.window_op import (
    count_evictor,
    delta_evictor,
    time_evictor,
    windowed_cogroup_batch,
    windowed_cogroup_stream,
    windowed_process_stream,
)

_T0 = datetime.fromisoformat("2024-01-01 00:00:00")
_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _rows(*specs):
    """specs: (event_id, seconds_offset, user_id, value)"""
    return [
        (eid, _T0 + timedelta(seconds=sec), uid, float(val))
        for eid, sec, uid, val in specs
    ]


def _run_stream(spark, out, ckpt_prefix):
    results: list = []
    ckpt = tempfile.mkdtemp(prefix=ckpt_prefix)
    q = (
        out.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return results


def _staged_stream(spark, tmp_path, name, *file_batches):
    staging = str(tmp_path / name)
    for i, batch in enumerate(file_batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(batch, _SCHEMA).coalesce(1).write.mode(mode).parquet(
            staging
        )
        time.sleep(1.05)  # distinct mtimes → stable per-file trigger order
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )


def _make_sum_pane():
    # Defined per-test (closure) so cloudpickle serializes it by value —
    # the executor cannot import the test module.
    def _sum_pane(pane: pd.DataFrame) -> list[dict]:
        return [{"n": len(pane), "total": round(float(pane["value"].sum()), 6)}]

    return _sum_pane


def test_evictors_prune_pane():
    recs = [{"_ts_ms": t * 1000, "value": float(t)} for t in (10, 20, 30, 40)]
    assert [r["_ts_ms"] for r in count_evictor(2)(recs, 60_000)] == [30_000, 40_000]
    assert [r["_ts_ms"] for r in time_evictor(15)(recs, 60_000)] == [30_000, 40_000]
    dv = delta_evictor(15.0, lambda r, newest: abs(newest["value"] - r["value"]))
    assert [r["value"] for r in dv(recs, 60_000)] == [30.0, 40.0]


def test_windowed_process_fires_at_watermark_with_evictor(spark, tmp_path):
    stream = _staged_stream(
        spark,
        tmp_path,
        "wp_evict",
        _rows((0, 10, 1, 10.0), (1, 20, 1, 20.0), (2, 30, 1, 30.0)),
        _rows((3, 200, 1, 1.0)),  # sentinel: pushes watermark past cleanup
    )
    out = windowed_process_stream(
        stream,
        ["user_id"],
        "ts",
        60.0,
        _make_sum_pane(),
        "n long, total double",
        ["value"],
        evictor=count_evictor(2),
    )
    results = _run_stream(spark, out, "ckpt_wp_")
    fired = [r for r in results if not r["late"]]
    # count_evictor(2) keeps the last two elements (20, 30).
    assert len(fired) == 1
    assert (fired[0]["n"], fired[0]["total"]) == (2, 50.0)
    assert fired[0]["window_start"] == _T0
    assert fired[0]["window_end"] == _T0 + timedelta(seconds=60)


def test_late_element_refires_and_too_late_goes_to_side_output(spark, tmp_path):
    stream = _staged_stream(
        spark,
        tmp_path,
        "wp_late",
        _rows((0, 10, 1, 10.0), (1, 20, 1, 20.0)),
        # watermark → 115s: window [0,60) fires (within lateness 120s).
        _rows((2, 120, 2, 1.0)),
        # spacer batch so the end-of-window timer fires on its own (micro-
        # batch timers fire the batch AFTER the watermark advances).
        _rows((7, 130, 2, 1.0)),
        # 30s is late but within end+lateness=180 → re-fire with updated pane.
        _rows((3, 30, 1, 5.0)),
        # watermark → 395s: past cleanup for window [0,60).
        _rows((4, 400, 2, 1.0)),
        # 15s is past allowed lateness → side output (late=true).
        _rows((5, 15, 1, 7.0)),
        _rows((6, 600, 2, 1.0)),  # sentinel
    )
    out = windowed_process_stream(
        stream,
        ["user_id"],
        "ts",
        60.0,
        _make_sum_pane(),
        "n long, total double",
        ["value"],
        allowed_lateness_seconds=120.0,
        emit_late=True,
        # event 5 arrives 380s behind the max ts — widen the capture grace
        # so Spark's pre-operator filter lets it through to the side output.
        late_capture_seconds=250.0,
    )
    results = _run_stream(spark, out, "ckpt_wl_")
    u1 = [r for r in results if r["user_id"] == 1]
    fired = [(r["n"], r["total"]) for r in u1 if not r["late"]]
    side = [(r["n"], r["total"]) for r in u1 if r["late"]]
    assert fired[0] == (2, 30.0)  # first fire at watermark
    assert (3, 35.0) in fired  # allowed-late re-fire includes event 3
    assert side == [(1, 7.0)]  # event 5 past lateness → side output


def test_windowed_cogroup_batch_pairs_full_groups(spark):
    left = spark.createDataFrame(
        _rows((0, 10, 1, 1.0), (1, 20, 1, 2.0), (2, 70, 1, 3.0)), _SCHEMA
    )
    right = spark.createDataFrame(_rows((10, 15, 1, 40.0)), _SCHEMA)

    def fn(lp: pd.DataFrame, rp: pd.DataFrame) -> list[dict]:
        return [{"n_left": len(lp), "n_right": len(rp)}]

    out = windowed_cogroup_batch(
        left, right, ["user_id"], "ts", 60.0, fn, "n_left long, n_right long",
        ["value"],
    )
    got = {
        (r["window_start"].minute, r["n_left"], r["n_right"])
        for r in out.collect()
    }
    # Window [0,60): 2 left + 1 right; window [60,120): 1 left + 0 right
    # (full-outer group semantics — one-sided groups still invoke fn).
    assert got == {(0, 2, 1), (1, 1, 0)}


def test_windowed_cogroup_stream_matches_batch(spark, tmp_path):
    lrows = _rows((0, 10, 1, 1.0), (1, 20, 1, 2.0))
    rrows = _rows((10, 15, 1, 40.0))
    sentinel = _rows((99, 300, 2, 0.0))
    lstream = _staged_stream(spark, tmp_path, "cg_left", lrows, sentinel)
    rstream = _staged_stream(spark, tmp_path, "cg_right", rrows, sentinel)

    def fn(lp: pd.DataFrame, rp: pd.DataFrame) -> list[dict]:
        return [
            {
                "n_left": len(lp),
                "n_right": len(rp),
                "total": round(float(lp["value"].sum() + rp["value"].sum()), 6),
            }
        ]

    out = windowed_cogroup_stream(
        lstream,
        rstream,
        ["user_id"],
        "ts",
        60.0,
        fn,
        "n_left long, n_right long, total double",
        ["value"],
    )
    results = _run_stream(spark, out, "ckpt_cg_")
    u1 = [r for r in results if r["user_id"] == 1 and not r["late"]]
    assert [(r["n_left"], r["n_right"], r["total"]) for r in u1] == [(2, 1, 43.0)]


def test_count_trigger_fires_early_accumulating(spark, tmp_path):
    stream = _staged_stream(
        spark,
        tmp_path,
        "wp_count_trig",
        _rows((0, 10, 1, 1.0), (1, 20, 1, 2.0)),   # 2 elements → early fire
        _rows((2, 30, 1, 3.0), (3, 40, 1, 4.0)),   # 4 elements → early fire
        _rows((9, 200, 2, 0.0)),                    # watermark → final fire
        _rows((10, 400, 2, 0.0)),                   # sentinel
    )
    out = windowed_process_stream(
        stream,
        ["user_id"],
        "ts",
        60.0,
        _make_sum_pane(),
        "n long, total double",
        ["value"],
        count_trigger_every=2,
    )
    results = [
        (r["n"], r["total"])
        for r in _run_stream(spark, out, "ckpt_ct_")
        if r["user_id"] == 1
    ]
    # Early firings at 2 and 4 elements (accumulating), final at watermark.
    assert results == [(2, 3.0), (4, 10.0), (4, 10.0)]


def test_windowed_stream_join_native(spark, tmp_path):
    from flink_1_3_2_hopsworks_spark.streaming.window_op import windowed_stream_join

    lrows = _rows((0, 10, 1, 1.0), (1, 70, 1, 2.0))
    rrows = _rows((10, 20, 1, 10.0), (11, 130, 1, 20.0))
    sentinel = _rows((99, 300, 2, 0.0))
    left = (
        _staged_stream(spark, tmp_path, "sj_left", lrows, sentinel)
        .withColumnRenamed("value", "lvalue")
        .drop("event_id")
    )
    right = (
        _staged_stream(spark, tmp_path, "sj_right", rrows, sentinel)
        .withColumnRenamed("value", "rvalue")
        .drop("event_id")
    )
    out = windowed_stream_join(left, right, ["user_id"], "ts", "60 seconds")
    results = _run_stream(spark, out, "ckpt_sj_")
    got = {
        (r["user_id"], r["lvalue"], r["rvalue"])
        for r in results
        if r["user_id"] == 1
    }
    # Only the [0,60) window has both sides (l ts=10, r ts=20); the l ts=70
    # and r ts=130 rows land in different windows → no pair.
    assert got == {(1, 1.0, 10.0)}


def test_windowed_process_string_keys(spark, tmp_path):
    """Non-integer keys through keys.py (round-1 advice): the output schema
    and key values must be typed from the input, not hardcoded long."""
    schema = "event_id long, ts timestamp, user string, value double"
    staging = str(tmp_path / "wp_str")
    rows = [
        (0, _T0 + timedelta(seconds=10), "alice", 10.0),
        (1, _T0 + timedelta(seconds=20), "alice", 20.0),
        (2, _T0 + timedelta(seconds=200), "bob", 1.0),  # sentinel advances wm
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(staging)
    stream = spark.readStream.schema(schema).parquet(staging)
    out = windowed_process_stream(
        stream, ["user"], "ts", 60.0, _make_sum_pane(), "n long, total double", ["value"]
    )
    results = _run_stream(spark, out, "ckpt_wp_str_")
    fired = {(r["user"], r["n"], r["total"]) for r in results if not r["late"]}
    assert ("alice", 2, 30.0) in fired


def test_evict_after_purges_pane_state(spark, tmp_path):
    """Reference Evictor#evictAfter (1.3): a keep-none evictAfter combined
    with a count trigger gives FIRE_AND_PURGE — each early fire sees only
    the elements since the previous fire, and the end-of-window fire has
    nothing left to emit."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import purge_evictor

    stream = _staged_stream(
        spark,
        tmp_path,
        "wp_evict_after",
        _rows((0, 10, 1, 1.0), (1, 20, 1, 2.0)),   # fire [1,2], purge
        _rows((2, 30, 1, 3.0), (3, 40, 1, 4.0)),   # fire [3,4], purge
        _rows((9, 200, 2, 0.0)),                    # watermark past window
        _rows((10, 400, 2, 0.0)),                   # sentinel
    )
    out = windowed_process_stream(
        stream,
        ["user_id"],
        "ts",
        60.0,
        _make_sum_pane(),
        "n long, total double",
        ["value"],
        count_trigger_every=2,
        evictor_after=purge_evictor(),
    )
    results = [
        (r["n"], r["total"])
        for r in _run_stream(spark, out, "ckpt_ea_")
        if r["user_id"] == 1
    ]
    # vs the accumulating sibling's [(2,3.0), (4,10.0), (4,10.0)]
    assert results == [(2, 3.0), (2, 7.0)]


def test_windowed_cogroup_agg_matches_full_pane_batch(spark):
    """The fused-JVM aggregation path computes the same panes as the
    full-pane coGroup operator when the coGroup fn is aggregation —
    counts and sums per side, including one-sided groups."""
    import pyspark.sql.functions as F

    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        side_col,
        windowed_cogroup_agg,
    )

    left = spark.createDataFrame(
        _rows((0, 10, 1, 1.0), (1, 20, 1, 2.0), (2, 70, 1, 3.0)), _SCHEMA
    )
    right = spark.createDataFrame(_rows((10, 15, 1, 40.0)), _SCHEMA)

    def fn(lp: pd.DataFrame, rp: pd.DataFrame) -> list[dict]:
        return [
            {
                "n_left": len(lp),
                "n_right": len(rp),
                "left_sum": float(lp["value"].sum()),
                "right_sum": float(rp["value"].sum()),
            }
        ]

    pane = {
        (r["user_id"], r["window_start"], r["n_left"], r["n_right"],
         r["left_sum"], r["right_sum"])
        for r in windowed_cogroup_batch(
            left, right, ["user_id"], "ts", 60.0, fn,
            "n_left long, n_right long, left_sum double, right_sum double",
            ["value"],
        ).collect()
    }
    fused = {
        (r["user_id"], r["window_start"], r["n_left"], r["n_right"],
         r["left_sum"], r["right_sum"])
        for r in windowed_cogroup_agg(
            left, right, ["user_id"], "ts", 60.0,
            [
                F.count(side_col(0)).alias("n_left"),
                F.count(side_col(1)).alias("n_right"),
                F.coalesce(F.sum(side_col(0, "value")), F.lit(0.0)).alias("left_sum"),
                F.coalesce(F.sum(side_col(1, "value")), F.lit(0.0)).alias("right_sum"),
            ],
            ["value"],
        ).collect()
    }
    assert fused == pane


def test_windowed_cogroup_agg_stream_matches_batch(spark, tmp_path):
    """Streaming fused coGroup aggregation: native windowed agg in append
    mode fires the same pane values at the watermark."""
    import pyspark.sql.functions as F

    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        side_col,
        windowed_cogroup_agg,
    )

    lrows = _rows((0, 10, 1, 1.0), (1, 20, 1, 2.0))
    rrows = _rows((10, 15, 1, 40.0))
    sentinel = _rows((99, 300, 2, 0.0))
    lstream = _staged_stream(spark, tmp_path, "cga_left", lrows, sentinel)
    rstream = _staged_stream(spark, tmp_path, "cga_right", rrows, sentinel)
    out = windowed_cogroup_agg(
        lstream, rstream, ["user_id"], "ts", 60.0,
        [
            F.count(side_col(0)).alias("n_left"),
            F.count(side_col(1)).alias("n_right"),
            F.round(
                F.coalesce(F.sum(side_col(0, "value")), F.lit(0.0))
                + F.coalesce(F.sum(side_col(1, "value")), F.lit(0.0)),
                6,
            ).alias("total"),
        ],
        ["value"],
    )
    results = _run_stream(spark, out, "ckpt_cga_")
    u1 = [r for r in results if r["user_id"] == 1]
    assert [(r["n_left"], r["n_right"], r["total"]) for r in u1] == [(2, 1, 43.0)]
