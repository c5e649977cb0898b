"""Tests for the fluent Flink-shaped API facade (api.py) — the switchover
surface: a reference program written as env.fromCollection(...).map(...)
.groupBy(...).aggregate(...).join(...).where(...).equalTo(...) must run
unchanged in spirit over the Spark engine and stay ONE lazy Catalyst plan.
"""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.api import (
    Aggregations,
    DataSet,
    ExecutionEnvironment,
    StreamExecutionEnvironment,
    TumblingEventTimeWindows,
)
from flink_1_3_2_hopsworks_spark.catalog import load_table


@pytest.fixture(scope="module")
def env(spark):
    return ExecutionEnvironment.get_execution_environment(spark)


@pytest.fixture(scope="module")
def orders3(env):
    return env.from_collection(
        [
            (1, "a", 10.0),
            (1, "b", 5.0),
            (2, "a", 7.5),
            (2, "c", 2.5),
            (3, "b", 1.0),
        ],
        "k INT, tag STRING, v DOUBLE",
    )


def test_from_collection_and_sequence(env):
    assert env.generate_sequence(1, 100).count() == 100
    ds = env.from_elements((1, "x"), (2, "y"), schema="id INT, s STRING")
    assert sorted(r.s for r in ds.collect()) == ["x", "y"]


def test_map_filter_project_positional(orders3):
    out = (
        orders3.map(F.col("k"), (F.col("v") * 2).alias("v2"), F.col("tag"))
        .filter(F.col("v2") > 5.0)
        .project(2, 0)  # tuple positions -> (tag, k)
    )
    assert out.df.columns == ["tag", "k"]
    assert out.count() == 3


def test_map_rows_arrow_path(orders3):
    def double_v(batches):
        for b in batches:
            b["v"] = b["v"] * 2
            yield b[["k", "v"]]

    out = orders3.map_rows(double_v, "k INT, v DOUBLE")
    assert sorted(r.v for r in out.collect()) == [2.0, 5.0, 10.0, 15.0, 20.0]


def test_grouped_aggregate_chain_single_hashagg(orders3):
    # aggregate(SUM, v).and_agg(MIN, tag) — one hash-aggregate, implicit done()
    res = {
        r.k: (r.v, r.tag)
        for r in orders3.group_by("k")
        .aggregate(Aggregations.SUM, "v")
        .and_agg(Aggregations.MIN, "tag")
        .collect()
    }
    assert res == {1: (15.0, "a"), 2: (10.0, "a"), 3: (1.0, "b")}


def test_global_aggregate_and_min_by(orders3):
    assert orders3.sum("v").collect()[0].v == 26.0
    top = {r.k: r.tag for r in orders3.group_by("k").max_by("v").collect()}
    assert top == {1: "a", 2: "a", 3: "b"}


def test_reduce_group_udf(orders3):
    def concat_tags(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": [pdf.k.iloc[0]], "tags": ["".join(sorted(pdf.tag))]}
        )

    out = {
        r.k: r.tags
        for r in orders3.group_by("k").reduce_group(concat_tags, "k INT, tags STRING").collect()
    }
    assert out == {1: "ab", 2: "ac", 3: "b"}


def test_join_where_equal_to_and_clash_suffix(env, orders3):
    dims = env.from_collection(
        [(1, "one"), (2, "two")], "k INT, name STRING"
    )
    joined = orders3.join(dims).where("k").equal_to(0)  # positional right key
    assert joined.df.columns == ["k", "tag", "v", "k_r", "name"]
    assert joined.count() == 4

    left = orders3.left_outer_join(dims).where("k").equal_to("k")
    rows = {(r.k, r.name) for r in left.collect()}
    assert (3, None) in rows and len(rows) == 3


def test_join_apply_slow_path(env, orders3):
    dims = env.from_collection([(1, 100)], "k INT, mult INT")

    def scale(batches):
        for b in batches:
            yield pd.DataFrame({"scaled": b["v"] * b["mult"]})

    out = (
        orders3.join_with_tiny(dims)
        .where("k")
        .equal_to("k")
        .apply(scale, "scaled DOUBLE")
    )
    assert sorted(r.scaled for r in out.collect()) == [500.0, 1000.0]


def test_co_group_full_groups(env, orders3):
    other = env.from_collection([(1, 9.0), (4, 3.0)], "k INT, w DOUBLE")

    def counts(key, l, r):
        return pd.DataFrame({"k": [key[0]], "nl": [len(l)], "nr": [len(r)]})

    out = {
        (r.k): (r.nl, r.nr)
        for r in orders3.co_group(other)
        .where("k")
        .equal_to("k")
        .apply(counts, "k INT, nl INT, nr INT")
        .collect()
    }
    # coGroup emits for keys present on EITHER side (full outer on groups)
    assert out == {1: (2, 1), 2: (2, 0), 3: (1, 0), 4: (0, 1)}


def test_set_ops_bag_semantics(env):
    a = env.from_collection([(1,), (1,), (2,)], "x INT")
    b = env.from_collection([(1,), (3,)], "x INT")
    assert a.union(b).count() == 5  # union ALL, like the reference
    assert sorted(r.x for r in a.intersect(b).collect()) == [1]
    assert sorted(r.x for r in a.minus(b, all=True).collect()) == [1, 2]


def test_sort_first_zip_sample(env):
    ds = env.generate_sequence(1, 50)
    assert ds.first(5).count() == 5
    top = ds.order_by(F.col("id").desc()).first(3).collect()
    assert [r.id for r in top] == [50, 49, 48]
    zipped = ds.zip_with_index("idx")
    assert sorted(r.idx for r in zipped.collect()) == list(range(50))
    assert 0 < ds.sample(False, 0.5, seed=7).count() < 50
    assert ds.sample_with_size(10).count() == 10


def test_iterate_bulk(env):
    ds = env.from_collection([(1.0,), (2.0,)], "x DOUBLE")
    out = ds.iterate(3, lambda d, i: d.map((F.col("x") * 2).alias("x")))
    assert sorted(r.x for r in out.collect()) == [8.0, 16.0]


def test_facade_stays_lazy_one_plan(orders3, env):
    """The whole fluent chain must remain a single unexecuted plan —
    explain succeeds and no job runs until an action."""
    dims = env.from_collection([(1, "one")], "k INT, name STRING")
    chain = (
        orders3.filter(F.col("v") > 1.0)
        .join_with_tiny(dims)
        .where("k")
        .equal_to("k")
        .group_by("name")
        .sum("v")
    )
    plan = chain.df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan and "Aggregate" in plan


def test_streaming_facade_window_agg(spark, tmp_path_factory):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path_factory.mktemp("api_stream"))
    events.orderBy("ts").coalesce(2).write.mode("overwrite").parquet(staging)

    senv = StreamExecutionEnvironment.get_execution_environment(spark)
    stream = (
        senv.file_source(staging, events.schema)
        .assign_timestamps_and_watermarks("ts", "10 minutes")
        .key_by("user_id")
        .window(TumblingEventTimeWindows.of("1 hour"), ts_col="ts")
        .aggregate(F.count(F.lit(1)).alias("n"))
    )

    ckpt = tempfile.mkdtemp(prefix="ckpt_api_")
    q = (
        stream.to_sink()
        .format("memory")
        .queryName("api_win")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) AS total FROM api_win").collect()[0].total
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    # watermark close means late windows may be held back; but with
    # availableNow all data is processed and final watermark closes all
    # but the last window(s) — compare against batch minus the tail hour.
    batch = events.groupBy(F.window("ts", "1 hour")).count()
    assert got is not None and got <= batch.agg(F.sum("count")).collect()[0][0]
    assert got > 0


class _FakeDataSet(DataSet):
    pass


def test_wrapper_preserves_subclass_df_access(env):
    ds = env.generate_sequence(1, 3)
    assert isinstance(ds, DataSet) and ds.df is not None


def test_iterate_delta_facade(env):
    """Facade delta iteration (reference DeltaIteration shape): propagate a
    min label one hop per round; workset drains when labels stabilize."""
    sol = env.from_collection(
        [(1, 10), (2, 20), (3, 30)], "k INT, label INT"
    )
    ws = env.from_collection([(2, 5)], "k INT, label INT")

    def step(solution, workset, i):
        # delta: workset rows with smaller labels than the solution's
        joined = workset.join(solution).where("k").equal_to("k")
        improved = joined.filter(F.col("label") < F.col("label_r")).project(
            "k", "label"
        )
        # next workset: push the improved label to neighbor k+1
        nxt = improved.map(
            (F.col("k") + 1).alias("k"), F.col("label")
        ).filter(F.col("k") <= 3)
        return improved, nxt

    out = sol.iterate_delta(ws, ["k"], max_iterations=10, step=step)
    assert {r.k: r.label for r in out.collect()} == {1: 10, 2: 5, 3: 5}


def test_datastream_routing_facade(spark):
    """split/side_output/connect spellings on the DataStream facade (batch
    DataFrames exercise the same code path)."""
    from flink_1_3_2_hopsworks_spark.api import DataStream

    s = DataStream(spark.createDataFrame([(1, 5.0), (2, 50.0)], "k INT, v DOUBLE"))
    routes = s.split(low=F.col("v") < 10, high=F.col("v") >= 10)
    assert routes["low"].df.count() == 1 and routes["high"].df.count() == 1

    main, side = s.side_output(F.col("v") < 10)
    assert main.df.count() == 1 and side.df.count() == 1

    other = DataStream(spark.createDataFrame([(1, "x")], "k INT, tag STRING"))
    tagged = s.connect(other, ["k"])
    assert tagged.df.count() == 3 and "_source" in tagged.df.columns


def test_keyed_stream_process_facade(spark, tmp_path):
    """KeyedStream.process facade (round-2 fix, previously untested): the
    ProcessFunction spelling must wire state + timers end-to-end."""
    import time as _time
    from datetime import datetime, timedelta

    from flink_1_3_2_hopsworks_spark.api import DataStream

    t0 = datetime.fromisoformat("2024-01-01 00:00:00")
    schema = "event_id long, ts timestamp, user_id long, value double"
    staging = str(tmp_path / "ks_process")
    batches = [
        [(0, t0, 1, 1.0), (1, t0 + timedelta(seconds=5), 1, 2.0)],
        [(2, t0 + timedelta(seconds=100), 2, 0.0)],  # advances watermark
        [(3, t0 + timedelta(seconds=300), 2, 0.0)],
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(staging)
        _time.sleep(1.05)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staging)
    )

    def on_event(state, ev, ctx):
        old = state.get("timer")
        if old is not None:
            ctx.delete_event_time_timer(old)
        state["n"] = state.get("n", 0) + 1
        state["timer"] = ev["_ts_ms"] + 30_000
        ctx.register_event_time_timer(state["timer"])
        return []

    def on_timer(state, t_ms, ctx):
        return [{"n": state.get("n", 0), "fired_at": t_ms}]

    out = (
        DataStream(stream)
        .key_by("user_id")
        .process(on_event, on_timer, "n long, fired_at long", ["value"])
    )

    results: list = []
    ckpt = tempfile.mkdtemp(prefix="ckpt_ksp_")
    q = (
        out.df.writeStream.foreachBatch(lambda b, _: results.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)

    t0_ms = 1704067200000
    assert (1, 2, t0_ms + 35_000) in [
        (r["user_id"], r["n"], r["fired_at"]) for r in results
    ]
