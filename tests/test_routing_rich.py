"""split/select, side outputs, connect, broadcast sets, accumulators
(§2.7 routing + §2.10 RichFunction context)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.functions.rich import (
    broadcast_set,
    observe,
)
from flink_1_3_2_hopsworks_spark.operators.routing import connect, side_output, split


def test_split_routes_overlap(spark):
    df = spark.createDataFrame([(1,), (5,), (15,)], "x int")
    routes = split(df, {"small": F.col("x") < 10, "odd": F.col("x") % 2 == 1})
    assert sorted(r["x"] for r in routes["small"].collect()) == [1, 5]
    # A record can reach several routes (reference split semantics).
    assert sorted(r["x"] for r in routes["odd"].collect()) == [1, 5, 15]


def test_side_output_partitions(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    main, side = side_output(df, F.col("x") != 2)
    assert sorted(r["x"] for r in main.collect()) == [1, 3]
    assert [r["x"] for r in side.collect()] == [2]


def test_connect_tagged_union(spark):
    left = spark.createDataFrame([(1, "l")], "k int, lval string")
    right = spark.createDataFrame([(1, 9.5)], "k int, rval double")
    out = connect(left, right, ["k"])
    rows = {r["_source"]: r for r in out.collect()}
    assert rows["left"]["lval"] == "l" and rows["left"]["rval"] is None
    assert rows["right"]["rval"] == 9.5 and rows["right"]["lval"] is None


def test_broadcast_set(spark):
    small = spark.createDataFrame([(1, "a"), (2, "b")], "id int, tag string")
    bc = broadcast_set(small)
    lookup = {r["id"]: r["tag"] for r in bc.value}
    assert lookup == {1: "a", 2: "b"}
    bc.unpersist()


def test_observe_metrics(spark):
    df = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    observed, obs = observe(
        df, "m", [F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")]
    )
    observed.collect()
    assert obs.get["n"] == 2 and obs.get["total"] == 4.0
