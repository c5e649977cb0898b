"""Decade throughput for the STATEFUL streaming operators that buffer.

SCALE_SF1.json's stream_replay row measures the native windowed-agg path;
this script adds the ops whose state is per-key Python-managed buffers —
CEP pattern matching and the windowed coGroup (applyInPandasWithState) —
plus the native stream-stream windowed join for contrast, each replayed
through a REAL Structured Streaming query (file source, availableNow,
tmpfs checkpoint) at sf0.1 (100k events) and sf1 (1M events).

Per op per scale it records rows, the state machine's own processing time
(triggerExecution), events/s, and the state operator's row/memory peak —
the buffer-growth evidence. Results merge into SCALE_SF1.json under
"stream_stateful".

Usage: python scripts/stream_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from bench import _cpu_probe  # noqa: E402
from flink_1_3_2_hopsworks_spark import get_spark  # noqa: E402

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, "
    "user_id long, event_type string, value double, props string"
)

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".scaledata", "sf1"),
}


def _stream(spark, sf_dir: str):
    src_dir = tempfile.mkdtemp(prefix="stream_scale_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(src_dir), src_dir


def _run(spark, out_df) -> dict:
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt = tempfile.mkdtemp(prefix="stream_scale_ckpt_", dir=ckpt_base)
    t0 = time.time()
    q = (
        out_df.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.time() - t0, 3)
    rows = sum(p["numInputRows"] for p in q.recentProgress)
    proc_ms = sum(
        p["durationMs"].get("triggerExecution", 0) for p in q.recentProgress
    )
    state_rows = 0
    state_bytes = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            state_rows = max(state_rows, so.get("numRowsTotal", 0))
            state_bytes = max(state_bytes, so.get("memoryUsedBytes", 0))
    shutil.rmtree(ckpt, ignore_errors=True)
    proc_s = proc_ms / 1000.0
    return {
        "events": rows,
        "proc_sec": round(proc_s, 3),
        "wall_sec": wall,
        "events_per_sec": round(rows / proc_s) if proc_s else None,
        "state_rows_peak": state_rows,
        "state_bytes_peak": state_bytes,
    }


def op_cep(spark, sf_dir: str) -> dict:
    """CEP signup→purchase per user: per-key partial-match NFA state."""
    from flink_1_3_2_hopsworks_spark.streaming.cep import Pattern

    stream, src = _stream(spark, sf_dir)
    p = Pattern.begin("s1", lambda e: e["event_type"] == "signup").followed_by(
        "s2", lambda e: e["event_type"] == "purchase"
    )
    out = p.match_stream(stream, ["user_id"], "ts", "event_id")
    r = _run(spark, out)
    shutil.rmtree(src, ignore_errors=True)
    return r


def op_windowed_cogroup(spark, sf_dir: str) -> dict:
    """Windowed coGroup click×purchase per user per 1h pane: the operator
    buffers BOTH groups until the watermark fires the pane."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        windowed_cogroup_stream,
    )

    stream, src = _stream(spark, sf_dir)
    left = stream.filter(F.col("event_type") == "click")
    right = stream.filter(F.col("event_type") == "purchase")

    def cg(lpdf, rpdf):
        return [
            {
                "n_clicks": int(len(lpdf)),
                "n_purchases": int(len(rpdf)),
                "click_value": float(lpdf["value"].sum()),
                "purchase_value": float(rpdf["value"].sum()),
            }
        ]

    out = windowed_cogroup_stream(
        left,
        right,
        ["user_id"],
        "ts",
        3600.0,
        cg,
        "n_clicks long, n_purchases long, click_value double, "
        "purchase_value double",
        ["value"],
    )
    r = _run(spark, out)
    shutil.rmtree(src, ignore_errors=True)
    return r


def op_windowed_cogroup_agg(spark, sf_dir: str) -> dict:
    """The SAME click×purchase pane aggregation as op_windowed_cogroup,
    through the fused-JVM path (windowed_cogroup_agg): native windowed
    aggregation over side_col markers — counters of state per (key,
    window) instead of full Python-buffered panes. This is the measured
    answer to the full-pane operator's throughput envelope."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        side_col,
        windowed_cogroup_agg,
    )

    stream, src = _stream(spark, sf_dir)
    left = stream.filter(F.col("event_type") == "click")
    right = stream.filter(F.col("event_type") == "purchase")
    out = windowed_cogroup_agg(
        left, right, ["user_id"], "ts", 3600.0,
        [
            F.count(side_col(0)).alias("n_clicks"),
            F.count(side_col(1)).alias("n_purchases"),
            F.coalesce(F.sum(side_col(0, "value")), F.lit(0.0)).alias(
                "click_value"
            ),
            F.coalesce(F.sum(side_col(1, "value")), F.lit(0.0)).alias(
                "purchase_value"
            ),
        ],
        ["value"],
    )
    r = _run(spark, out)
    shutil.rmtree(src, ignore_errors=True)
    return r


def op_windowed_join(spark, sf_dir: str) -> dict:
    """Native stream-stream windowed join (symmetric hash state) — the
    Spark-native contrast to the buffering coGroup."""
    from flink_1_3_2_hopsworks_spark.streaming.window_op import (
        windowed_stream_join,
    )

    stream, src = _stream(spark, sf_dir)
    left = stream.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    right = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = windowed_stream_join(left, right, ["user_id"], "ts", "1 hour")
    r = _run(spark, out)
    shutil.rmtree(src, ignore_errors=True)
    return r


def op_curation_stream(spark, sf_dir: str) -> dict:
    """Streaming curation pipeline (streaming/curation.py): rule filter →
    fingerprint dedup (dropDuplicatesWithinWatermark state ∝ distinct
    payloads in the horizon) → hourly funnel stats — the incremental twin
    of the batch curation family, two chained stateful operators in one
    append query."""
    from flink_1_3_2_hopsworks_spark.streaming.curation import (
        curation_stream,
    )

    stream, src = _stream(spark, sf_dir)
    out = curation_stream(stream, watermark="10 minutes")
    r = _run(spark, out)
    shutil.rmtree(src, ignore_errors=True)
    return r


def op_near_ingest_stream(spark, sf_dir: str) -> dict:
    """Streaming near-dedup ingestion (streaming/neardup.py): foreachBatch
    MinHash ingest against the growing signature store — ZERO Spark
    streaming state (dedup state lives in the store), so the metric is
    pure per-batch throughput of signature + star-dedup + store append.
    Fresh store/verdict/checkpoint dirs per run (a reused store would
    measure a different, smaller problem)."""
    from flink_1_3_2_hopsworks_spark.streaming.neardup import (
        near_ingest_stream,
    )

    stream, src = _stream(spark, sf_dir)
    docs = stream.select(
        F.col("event_id").alias("doc_id"), F.col("props").alias("text")
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="near_ingest_", dir=base)
    t0 = time.time()
    q = near_ingest_stream(
        docs,
        store_path=f"{work}/store",
        verdict_path=f"{work}/verdicts",
        checkpoint=f"{work}/ckpt",
    )
    q.awaitTermination()
    wall = round(time.time() - t0, 3)
    rows = sum(p["numInputRows"] for p in q.recentProgress)
    proc_ms = sum(
        p["durationMs"].get("triggerExecution", 0) for p in q.recentProgress
    )
    q.stop()
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    proc_s = proc_ms / 1000.0
    return {
        "events": rows,
        "proc_sec": round(proc_s, 3),
        "wall_sec": wall,
        "events_per_sec": round(rows / proc_s) if proc_s else None,
        "state_rows_peak": 0,
        "state_bytes_peak": 0,
    }


OPS = {
    "cep_signup_purchase_stream": op_cep,
    "windowed_cogroup_stream": op_windowed_cogroup,
    "windowed_cogroup_agg_stream": op_windowed_cogroup_agg,
    "windowed_stream_join": op_windowed_join,
    "curation_stream": op_curation_stream,
    "near_ingest_stream": op_near_ingest_stream,
}


def main() -> None:
    spark = get_spark(app_name="stream_scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Same state-partition sizing rationale as bench.stream_replay: state is
    # keyed by (user, window) / user — thousands of keys, so commit overhead
    # dominates at high partition counts.
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # Optional name filters: re-measure only the named ops, merging into
    # the existing artifact section (same contract as spot_scale --names).
    name_filters = sys.argv[1:]
    ops = {
        n: f
        for n, f in OPS.items()
        if not name_filters or any(s in n for s in name_filters)
    }

    results: dict[str, dict[str, dict]] = {}
    for name, fn in ops.items():
        results[name] = {}
        for tag, d in SCALES.items():
            fn(spark, d)  # warm (codegen + python workers), untimed
            best = min(
                (fn(spark, d) for _ in range(2)),
                key=lambda r: r["proc_sec"],
            )
            results[name][tag] = best
            print(f"[{tag}] {name}: {best}", flush=True)
        s01 = results[name]["sf0.1"]["proc_sec"]
        s1 = results[name]["sf1"]["proc_sec"]
        results[name]["proc_ratio_10x_data"] = (
            round(s1 / s01, 2) if s01 else None
        )

    path = os.path.join(REPO, "SCALE_SF1.json")
    with open(path) as f:
        artifact = json.load(f)
    prior_ops = (
        artifact.get("stream_stateful", {}).get("ops", {})
        if name_filters
        else {}
    )
    artifact["stream_stateful"] = {
        "what": (
            "stateful streaming ops replayed via file source + availableNow "
            "+ tmpfs checkpoint at sf0.1 (100k events) and sf1 (1M events); "
            "proc_sec = sum of triggerExecution; state peaks from "
            "stateOperators; min-of-2 after an untimed warm run"
        ),
        "cpu_probe_sec": _cpu_probe(),
        "ops": {**prior_ops, **results},
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({n: results[n]["proc_ratio_10x_data"] for n in results}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
