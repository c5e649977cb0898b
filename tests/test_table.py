"""Tests for the Table API facade (table.py): catalog registration, sql(),
fluent expressions, group windows (batch + streaming parity), Over builder,
set ops, and the append/retract stream conversions.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.table import (
    Over,
    Session,
    Slide,
    StreamTableEnvironment,
    TableEnvironment,
    Tumble,
)


@pytest.fixture(scope="module")
def env(spark):
    return TableEnvironment.create(spark)


@pytest.fixture(scope="module")
def t_sales(spark, env):
    df = spark.createDataFrame(
        [
            ("a", "x", 3.0, "2024-01-01 00:10:00"),
            ("a", "y", 1.0, "2024-01-01 00:20:00"),
            ("b", "x", 2.0, "2024-01-01 01:05:00"),
            ("b", "x", 4.0, "2024-01-01 02:40:00"),
        ],
        "k STRING, item STRING, v DOUBLE, ts_s STRING",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    env.register_table("sales", df)
    return env.scan("sales")


def test_sql_over_registered_table(env, t_sales):
    out = env.sql("SELECT k, SUM(v) AS total FROM sales GROUP BY k")
    assert {r.k: r.total for r in out.collect()} == {"a": 4.0, "b": 6.0}


def test_fluent_string_expressions(t_sales):
    out = (
        t_sales.filter("v >= 2.0")
        .group_by("k")
        .select("k", "count(*) AS n", "round(sum(v), 1) AS total")
        .order_by("k")
    )
    assert [(r.k, r.n, r.total) for r in out.collect()] == [("a", 1, 3.0), ("b", 2, 6.0)]


def test_as_rename_and_column_ops(t_sales):
    out = (
        t_sales.select("k", "v")
        .as_("key, val")
        .add_columns(doubled="val * 2")
        .drop_columns("val")
    )
    assert out.df.columns == ["key", "doubled"]


def test_join_and_setops(env, spark, t_sales):
    dim = spark.createDataFrame([("a", "alpha")], "k STRING, name STRING")
    env.register_table("dim", dim)
    joined = t_sales.join(env.scan("dim"), "sales.k = dim.k")
    assert joined.count() == 2
    left = t_sales.left_outer_join(env.scan("dim"), t_sales.df.k == dim.k)
    assert left.count() == 4

    a = env.from_data_frame(spark.createDataFrame([(1,), (1,), (2,)], "x INT"))
    b = env.from_data_frame(spark.createDataFrame([(1,), (3,)], "x INT"))
    assert a.union(b).count() == 3  # distinct union (reference union)
    assert a.union_all(b).count() == 5
    assert sorted(r.x for r in a.minus_all(b).collect()) == [1, 2]
    assert sorted(r.x for r in a.intersect(b).collect()) == [1]


def test_order_offset_fetch(t_sales):
    out = t_sales.order_by("v desc").offset(1).fetch(2)
    assert [r.v for r in out.collect()] == [3.0, 2.0]


def test_tumble_group_window(t_sales):
    out = (
        t_sales.window(Tumble.over("1 hour").on("ts").with_alias("w"))
        .group_by("w, k")
        .select(F.sum("v").alias("total"))
    )
    rows = {(r.w_start.hour, r.k): r.total for r in out.collect()}
    assert rows == {(0, "a"): 4.0, (1, "b"): 2.0, (2, "b"): 4.0}
    assert out.df.columns == ["w_start", "w_end", "k", "total"]


def test_group_by_must_include_window_alias(t_sales):
    with pytest.raises(ValueError, match="window alias"):
        t_sales.window(Tumble.over("1 hour").on("ts")).group_by("k")


def test_slide_and_session_windows(t_sales):
    slid = (
        t_sales.window(Slide.over("2 hours").every("1 hour").on("ts").with_alias("w"))
        .group_by("w, k")
        .select(F.count(F.lit(1)).alias("n"))
    )
    # each row lands in 2 sliding panes
    assert sum(r.n for r in slid.collect()) == 8

    sess = (
        t_sales.window(Session.with_gap("30 minutes").on("ts").with_alias("s"))
        .group_by("s, k")
        .select(F.count(F.lit(1)).alias("n"))
    )
    # a: one session (10,20); b: two sessions (1:05 | 2:40)
    assert sorted(r.n for r in sess.collect()) == [1, 1, 2]


def test_over_builder_rows_and_range(t_sales):
    w = Over.partition_by("k").order_by("ts").rows()
    out = t_sales.select("k", "v", F.sum("v").over(w.spec).alias("running"))
    got = {(r.k, r.v): r.running for r in out.collect()}
    assert got[("a", 3.0)] == 3.0 and got[("a", 1.0)] == 4.0
    assert got[("b", 2.0)] == 2.0 and got[("b", 4.0)] == 6.0

    w3 = Over.partition_by("k").order_by("v").preceding(1).rows()
    out3 = t_sales.select("k", "v", F.count(F.lit(1)).over(w3.spec).alias("n"))
    assert max(r.n for r in out3.collect()) == 2


def test_register_function(env, t_sales):
    env.register_function("twice_t", lambda x: x * 2.0, "double")
    out = env.sql("SELECT twice_t(v) AS v2 FROM sales WHERE item = 'y'")
    assert out.collect()[0].v2 == 2.0


def test_register_table_source(env, spark, tmp_path):
    p = str(tmp_path / "src.parquet")
    spark.range(10).write.parquet(p)
    env.register_table_source("ten_rows", p)
    assert env.scan("ten_rows").count() == 10


def test_to_data_set_roundtrip(env, t_sales):
    ds = env.to_data_set(t_sales)
    assert ds.group_by("k").sum("v").count() == 2


def test_streaming_group_window_and_retract_mode(spark, tmp_path_factory):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    staging = str(tmp_path_factory.mktemp("tbl_stream"))
    events.orderBy("ts").coalesce(2).write.mode("overwrite").parquet(staging)

    senv = StreamTableEnvironment.create(spark)
    stream_df = spark.readStream.schema(events.schema).parquet(staging)
    t = senv.from_data_frame(stream_df)
    win = (
        t.window(Tumble.over("1 hour").on("ts").with_alias("w"))
        .group_by("w, event_type")
        .select(F.count(F.lit(1)).alias("n"), watermark="10 minutes")
    )
    assert win.df.isStreaming

    ckpt = tempfile.mkdtemp(prefix="ckpt_tbl_")
    q = (
        senv.to_retract_stream(win)
        .format("memory")
        .queryName("tbl_win")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = spark.sql(
        "SELECT sum(n) FROM (SELECT w_start, event_type, max(n) AS n "
        "FROM tbl_win GROUP BY w_start, event_type)"
    ).collect()[0][0]
    q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    assert total == events.count()  # update mode re-emits; max(n) per key = final


def test_minus_removes_duplicate_left_rows(env, spark):
    """Flink Table.minus is set EXCEPT: [x, x] − [x] → [] (round-2 advice —
    exceptAll().distinct() would wrongly keep one x)."""
    from flink_1_3_2_hopsworks_spark.table import Table

    left = Table(spark.createDataFrame([(1,), (1,), (2,)], "x long"))
    right = Table(spark.createDataFrame([(1,)], "x long"))
    assert [r["x"] for r in left.minus(right).df.collect()] == [2]
    # minus_all keeps multiplicity arithmetic: [1,1,2] −all [1] → [1,2]
    assert sorted(r["x"] for r in left.minus_all(right).df.collect()) == [1, 2]
