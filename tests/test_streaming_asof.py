"""Streaming as-of join: batch/stream equivalence when micro-batches
respect event-time order, state carry across batches, and NULLs before the
first right row."""

from __future__ import annotations

import shutil
import tempfile
import time as _time

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.operators.asof import asof_join
from flink_1_3_2_hopsworks_spark.streaming.asof import asof_join_stream


def _ts(s):
    from datetime import datetime

    return datetime(2024, 1, 1, 0, 0, s)


def _staged(spark, tmp_path, name, schema, *batches):
    staging = str(tmp_path / name)
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(staging)
        _time.sleep(1.05)
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staging)


def _collect(out):
    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_asof_")
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


def test_stream_asof_matches_batch_and_carries_state(spark, tmp_path):
    lschema = "k long, ts timestamp, lid long"
    rschema = "k long, ts timestamp, rid long, v double"
    l1 = [(1, _ts(2), 100), (2, _ts(3), 101)]       # before any right for k=2
    l2 = [(1, _ts(20), 102), (2, _ts(25), 103)]     # enriched from batch-1 rights
    r1 = [(1, _ts(1), 7, 1.5), (1, _ts(2), 8, 2.5)]  # tie at ts=2 with lid=100
    r2 = [(2, _ts(21), 9, 3.5)]

    left_s = _staged(spark, tmp_path, "l", lschema, l1, l2)
    right_s = _staged(spark, tmp_path, "r", rschema, r1, r2)
    out = asof_join_stream(
        left_s, right_s, ["k"], "ts", "ts", ["rid", "v"], right_tiebreak="rid"
    )
    got = {r["lid"]: (r["last_rid"], r["last_v"]) for r in _collect(out)}

    assert got[100] == (8, 2.5)      # inclusive boundary + rid tiebreak
    assert got[101] == (None, None)  # no right for k=2 yet
    assert got[102] == (8, 2.5)      # state carried across micro-batches
    assert got[103] == (9, 3.5)      # right from a later batch, earlier ts

    # Batch twin gives the same answer on the union of all chunks
    left_b = spark.createDataFrame(l1 + l2, lschema)
    right_b = spark.createDataFrame(r1 + r2, rschema)
    batch = {
        r["lid"]: (r["last_rid"], r["last_v"])
        for r in asof_join(
            left_b, right_b, ["k"], "ts", "ts", ["rid", "v"],
            right_tiebreak="rid",
        ).collect()
    }
    assert batch == got


def test_stream_asof_multi_chunk_key_group_sorted_once(spark, tmp_path):
    """A key whose micro-batch data spans multiple Arrow chunks must still
    replay in (t, is_left, tiebreak) order: chunks are concatenated and
    sorted ONCE (per-chunk sorting would let a left row see a right row
    timestamped after it, or miss one before it)."""
    lschema = "k long, ts timestamp, lid long"
    rschema = "k long, ts timestamp, rid long, v double"
    # One key, one micro-batch, 12 left + 12 right rows interleaved and
    # deliberately scrambled so any 2-row Arrow chunk is unsorted w.r.t. the
    # others. Left at second 2i+1 should match right at second 2i (v = i).
    lrows = [(1, _ts(2 * i + 1), 100 + i) for i in range(12)]
    rrows = [(1, _ts(2 * i), 200 + i, float(i)) for i in range(12)]
    lrows = lrows[::-1]
    rrows = rrows[6:] + rrows[:6]

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        left_s = _staged(spark, tmp_path, "lmc", lschema, lrows)
        right_s = _staged(spark, tmp_path, "rmc", rschema, rrows)
        out = asof_join_stream(
            left_s, right_s, ["k"], "ts", "ts", ["rid", "v"], right_tiebreak="rid"
        )
        got = {r["lid"]: (r["last_rid"], r["last_v"]) for r in _collect(out)}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert got == {100 + i: (200 + i, float(i)) for i in range(12)}
