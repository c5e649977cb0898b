"""Tests for the last two §2.7 reference features re-expressed Spark-first:
queryable state (materialized-view pattern over foreachBatch upserts) and
stream iterate (feedback edge through a watched directory).
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.streaming.iterate import await_drained, stream_iterate
from flink_1_3_2_hopsworks_spark.streaming.queryable import (
    MemoryStateStore,
    ParquetStateStore,
    as_queryable_state,
)


@pytest.fixture(scope="module")
def events_staged(spark, tmp_path_factory):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path_factory.mktemp("qs_events"))
    events.orderBy("ts").coalesce(3).write.mode("overwrite").parquet(staging)
    return events, staging


def _running_totals(spark, staging, schema):
    stream = spark.readStream.schema(schema).parquet(staging)
    return stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def test_memory_queryable_state(spark, events_staged):
    events, staging = events_staged
    state = _running_totals(spark, staging, events.schema)
    store = MemoryStateStore(["user_id"])
    ckpt = tempfile.mkdtemp(prefix="ckpt_qs_mem_")
    q = as_queryable_state(state, store, ckpt, available_now=True)
    q.awaitTermination(120)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert len(store) == len(expected)
    # out-of-band point lookups, like QueryableStateClient
    for uid, (n, total) in list(expected.items())[:5]:
        row = store.get(uid)
        assert (row.n_events, row.total_value) == (n, total)
    snap = {
        r.user_id: (r.n_events, r.total_value)
        for r in store.snapshot(spark).collect()
    }
    assert snap == expected


def test_parquet_queryable_state(spark, events_staged, tmp_path):
    events, staging = events_staged
    state = _running_totals(spark, staging, events.schema)
    store = ParquetStateStore(str(tmp_path / "kv"), ["user_id"], num_buckets=4)
    ckpt = tempfile.mkdtemp(prefix="ckpt_qs_pq_")
    q = as_queryable_state(state, store, ckpt, available_now=True)
    q.awaitTermination(120)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    expected = {
        r.user_id: r.n_events
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert store.snapshot(spark).count() == len(expected)
    some_uid = next(iter(expected))
    row = store.get(spark, some_uid)
    assert row is not None and row.n_events == expected[some_uid]
    assert store.get(spark, -999_999) is None


def test_parquet_state_upsert_overwrites_keys(spark, tmp_path):
    store = ParquetStateStore(str(tmp_path / "kv"), ["k"], num_buckets=2)
    store._upsert_batch(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"), 0)
    store._upsert_batch(spark.createDataFrame([(2, "B"), (3, "c")], "k INT, v STRING"), 1)
    snap = {r.k: r.v for r in store.snapshot(spark).collect()}
    assert snap == {1: "a", 2: "B", 3: "c"}


def test_stream_iterate_halving_fixpoint(spark, tmp_path):
    """Feedback loop: values halve until <= 2 (reference IterativeStream
    example semantics — flink-examples streaming/iteration/IterateExample)."""
    schema = "v INT"
    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(v,) for v in range(1, 21)], schema).coalesce(
        1
    ).write.mode("overwrite").parquet(src_dir)
    source = spark.readStream.schema(schema).parquet(src_dir)

    def step(batch):
        done = batch.filter(F.col("v") <= 2)
        fb = batch.filter(F.col("v") > 2).select(
            (F.col("v") / 2).cast("int").alias("v")
        )
        return done, fb

    outputs: list[int] = []

    def out_sink(done, batch_id):
        outputs.extend(r.v for r in done.collect())

    q = stream_iterate(
        spark,
        source,
        schema,
        step,
        str(tmp_path / "feedback"),
        out_sink,
        str(tmp_path / "ckpt"),
        trigger_seconds=0.2,
    )
    assert await_drained(q, idle_triggers=3, timeout_seconds=120)

    def fixpoint(v):
        while v > 2:
            v //= 2
        return v

    assert sorted(outputs) == sorted(fixpoint(v) for v in range(1, 21))
