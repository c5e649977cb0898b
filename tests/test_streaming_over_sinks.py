"""Streaming OVER rows operator + file sink exactly-once round trip."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.streaming.process import over_rows_agg_stream
from flink_1_3_2_hopsworks_spark.streaming.sinks import file_sink, foreach_batch_sink


def test_streaming_over_rows_matches_batch_window(spark, tmp_path):
    staging = str(tmp_path / "over_stream")
    data = [(i, 1, float(i)) for i in range(6)] + [(i + 100, 2, 10.0) for i in range(3)]
    df = spark.createDataFrame(data, "event_id long, user_id long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(staging)

    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .parquet(staging)
    )
    out = over_rows_agg_stream(stream, ["user_id"], "value", preceding=2)

    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_over_")
    q = foreach_batch_sink(
        out, lambda b, _: results.extend(b.collect()), ckpt, available_now=True
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    got = {(r["user_id"], r["event_id"]): (r["frame_sum"], r["frame_n"]) for r in results}
    # user 1, values 0..5, frame = 3-row trailing sum.
    assert got[(1, 0)] == (0.0, 1)
    assert got[(1, 2)] == (3.0, 3)   # 0+1+2
    assert got[(1, 5)] == (12.0, 3)  # 3+4+5
    assert got[(2, 102)] == (30.0, 3)

    # Cross-check against the batch OVER window on the same data.
    from flink_1_3_2_hopsworks_spark.operators.windows_over import rows_window

    w = rows_window(["user_id"], [F.asc("event_id")], 2)
    batch = {
        (r["user_id"], r["event_id"]): (r["s"], r["n"])
        for r in df.select(
            "user_id",
            "event_id",
            F.sum("value").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
        ).collect()
    }
    assert got == batch


def test_file_sink_exactly_once_restart(spark, tmp_path):
    """Restarting from the same checkpoint must not duplicate output files'
    rows (the BucketingSink exactly-once analogue)."""
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("id long, v double").parquet(src)
    q = file_sink(stream, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)
    q.stop()

    # Second run, same checkpoint, no new input → no new rows.
    q2 = file_sink(
        spark.readStream.schema("id long, v double").parquet(src),
        out_dir,
        ckpt,
        available_now=True,
    )
    q2.awaitTermination(120)
    q2.stop()

    back = spark.read.parquet(out_dir)
    assert back.count() == 10
    assert back.agg(F.sum("v")).collect()[0][0] == 45.0


def test_streaming_over_range_matches_batch_window(spark, tmp_path):
    from flink_1_3_2_hopsworks_spark.streaming.process import over_range_agg_stream

    staging = str(tmp_path / "over_range_stream")
    # user 1: events at t=0,10,20,35,70s — 30s trailing range
    base = "2024-01-01 00:00:"
    data = [
        (i, 1, float(i + 1), f"2024-01-01 00:0{m}:{s:02d}")
        for i, (m, s) in enumerate([(0, 0), (0, 10), (0, 20), (0, 35), (1, 10)])
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, value double, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(staging)

    stream = spark.readStream.schema(df.schema).parquet(staging)
    out = over_range_agg_stream(stream, ["user_id"], "value", range_seconds=30)

    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_over_range_")
    q = foreach_batch_sink(
        out, lambda b, _: results.extend(b.collect()), ckpt, available_now=True
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    got = {r["event_id"]: (r["frame_sum"], r["frame_n"]) for r in results}
    assert got[0] == (1.0, 1)          # t=0: just itself
    assert got[1] == (3.0, 2)          # t=10: 0,10
    assert got[2] == (6.0, 3)          # t=20: 0,10,20
    assert got[3] == (9.0, 3)          # t=35: 10,20,35 (t=0 out of range)
    assert got[4] == (5.0, 1)          # t=70: alone

    # Cross-check against the batch RANGE window on the same data.
    from flink_1_3_2_hopsworks_spark.operators.windows_over import range_window

    epoch = df.withColumn("_epoch", F.unix_timestamp("ts"))
    w = range_window(["user_id"], F.asc("_epoch"), 30)
    batch = {
        r["event_id"]: (r["s"], r["n"])
        for r in epoch.select(
            "event_id",
            F.sum("value").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("n"),
        ).collect()
    }
    assert {k: v for k, v in got.items()} == batch
