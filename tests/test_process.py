"""Count-window operator (reference countWindow = GlobalWindows +
CountTrigger) — batch path and transformWithStateInPandas streaming path."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.streaming.process import (
    count_window_agg_batch,
    count_window_agg_stream,
)


def test_count_window_batch(spark):
    data = [(1, i, float(i)) for i in range(7)] + [(2, i, float(i)) for i in range(3)]
    df = spark.createDataFrame(data, "user_id long, seq long, value double")
    out = count_window_agg_batch(
        df, ["user_id"], "seq", 3, [F.sum("value").alias("total")]
    )
    got = {(r["user_id"], r["window_id"]): r["total"] for r in out.collect()}
    # user 1: blocks [0,1,2]=3.0, [3,4,5]=12.0; trailing [6] must NOT fire.
    assert got == {(1, 0): 3.0, (1, 1): 12.0, (2, 0): 3.0}


def test_count_window_stream(spark, tmp_path):
    staging = str(tmp_path / "cw_stream")
    data = [(i, 1, float(i)) for i in range(7)] + [(i + 10, 2, float(1)) for i in range(3)]
    df = spark.createDataFrame(data, "event_id long, user_id long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(staging)

    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .parquet(staging)
    )
    try:
        out = count_window_agg_stream(stream, ["user_id"], 3, "value")
    except RuntimeError as exc:
        pytest.skip(f"transformWithStateInPandas unavailable: {exc}")

    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_cw_")
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

    got = {(r["user_id"], r["window_id"]): (r["n"], r["sum_value"]) for r in results}
    assert got[(1, 0)] == (3, 3.0)
    assert got[(1, 1)] == (3, 12.0)
    assert got[(2, 0)] == (3, 3.0)
    assert (1, 2) not in got  # incomplete trailing block must not fire
