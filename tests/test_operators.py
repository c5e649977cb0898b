"""Operator-level golden tests on tiny inline fixtures — mirrors the
reference's CollectionDataSets ITCase style (small fixed datasets, sorted
stringified comparison)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.operators import (
    aggregations as agg,
)
from flink_1_3_2_hopsworks_spark.operators import joins, sampling, setops, sort_limit


@pytest.fixture(scope="module")
def tuples3(spark):
    # Analogue of the reference's get3TupleDataSet: (id, group, text).
    data = [
        (1, 1, "Hi"),
        (2, 2, "Hello"),
        (3, 2, "Hello world"),
        (4, 3, "Hello world, how are you?"),
        (5, 3, "I am fine."),
        (6, 3, "Luke Skywalker"),
    ]
    return spark.createDataFrame(data, "id int, grp long, text string")


def rows(df, *cols):
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_join_hints_same_result(spark, tuples3):
    other = spark.createDataFrame([(1, "a"), (2, "b"), (9, "z")], "id int, tag string")
    base = None
    for hint in ["OPTIMIZER_CHOOSES", "BROADCAST_HASH_SECOND",
                 "REPARTITION_HASH_FIRST", "REPARTITION_SORT_MERGE"]:
        out = rows(joins.join(tuples3, other, "id", hint=hint), "id", "tag")
        if base is None:
            base = out
        assert out == base
    assert base == [(1, "a"), (2, "b")]


def test_outer_joins(spark, tuples3):
    other = spark.createDataFrame([(1, "a"), (9, "z")], "id int, tag string")
    left = rows(joins.join(tuples3, other, "id", how="left"), "id", "tag")
    assert (1, "a") in left and (5, None) in left
    full = joins.join(tuples3, other, tuples3.id == other.id, how="full")
    assert full.count() == 7  # 6 left rows + unmatched right (9)


def test_semi_anti(spark, tuples3):
    other = spark.createDataFrame([(1,), (3,)], "id int")
    assert rows(joins.semi_join(tuples3, other, "id"), "id") == [(1,), (3,)]
    assert rows(joins.anti_join(tuples3, other, "id"), "id") == [(2,), (4,), (5,), (6,)]


def test_cross(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(10,), (20,), (30,)], "y int")
    assert joins.cross(a, b).count() == 6


def test_cogroup_full_outer_semantics(spark):
    import pandas as pd

    left = spark.createDataFrame([(1, 10.0), (1, 20.0), (3, 5.0)], "k int, v double")
    right = spark.createDataFrame([(1, 100.0), (2, 200.0)], "k int, w double")

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        key = lpdf["k"].iloc[0] if len(lpdf) else rpdf["k"].iloc[0]
        return pd.DataFrame({"k": [int(key)], "nl": [len(lpdf)], "nr": [len(rpdf)]})

    out = rows(
        joins.co_group(left, right, ["k"], ["k"], merge, "k int, nl long, nr long"),
        "k", "nl", "nr",
    )
    # coGroup sees keys present on either side — including one-sided groups.
    assert out == [(1, 2, 1), (2, 0, 1), (3, 1, 0)]


def test_min_by_max_by(spark, tuples3):
    best = agg.max_by(tuples3, ["grp"], "id")
    assert rows(best, "grp", "id") == [(1, 1), (2, 3), (3, 6)]
    worst = agg.min_by(tuples3, ["grp"], "id")
    assert rows(worst, "grp", "id") == [(1, 1), (2, 2), (3, 4)]


def test_grouping_sets_vs_union(spark, tuples3):
    gs = agg.grouping_sets(
        tuples3, [["grp"], []], F.count(F.lit(1)).alias("n")
    )
    got = rows(gs, "grp", "n")
    assert (None, 6) in got and (3, 3) in got and len(got) == 4


def test_summarize(spark, tuples3):
    out = {r["column"]: r for r in agg.summarize(tuples3, ["id", "text"]).collect()}
    assert out["id"]["n"] == 6 and out["id"]["nulls"] == 0
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "6"
    assert abs(out["id"]["mean"] - 3.5) < 1e-9
    assert out["text"]["mean"] is None


def test_setops(spark):
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(1,), (3,), (4,)], "x int")
    assert rows(setops.union_all(a, b), "x") == [(1,), (1,), (1,), (2,), (3,), (3,), (4,)]
    assert rows(setops.union_distinct(a, b), "x") == [(1,), (2,), (3,), (4,)]
    assert rows(setops.intersect(a, b), "x") == [(1,), (3,)]
    assert rows(setops.minus(a, b), "x") == [(2,)]
    assert rows(setops.minus(a, b, all=True), "x") == [(1,), (2,)]


def test_first_n_per_group(spark, tuples3):
    top = sort_limit.first_n_per_group(tuples3, ["grp"], 1, F.desc("id"))
    assert rows(top, "grp", "id") == [(1, 1), (2, 3), (3, 6)]


def test_zip_with_index_contiguous(spark, tuples3):
    ordered = sort_limit.zip_with_index(tuples3, "idx", order=["id"])
    assert rows(ordered, "id", "idx") == [(i, i - 1) for i in range(1, 7)]
    # Unordered two-pass variant: ids must be a permutation of 0..n-1.
    unordered = sort_limit.zip_with_index(tuples3.repartition(3), "idx")
    got = sorted(r["idx"] for r in unordered.collect())
    assert got == list(range(6))


def test_zip_with_unique_id(spark, tuples3):
    out = sort_limit.zip_with_unique_id(tuples3, "uid")
    ids = [r["uid"] for r in out.collect()]
    assert len(set(ids)) == 6


def test_sample_with_size(spark):
    df = spark.range(1000)
    got = sampling.sample_with_size(df, 100, seed=7)
    assert got.count() == 100
    # Deterministic for a fixed seed.
    again = sampling.sample_with_size(df, 100, seed=7)
    assert rows(got, "id") == rows(again, "id")


def test_sample_with_size_hashed(spark):
    df = spark.range(1000)
    got = sampling.sample_with_size_hashed(df, 100, ["id"])
    ids = rows(got, "id")
    assert len(ids) == 100 and len(set(ids)) == 100
    # Deterministic: same (key, salt) → the exact same row set.
    assert ids == rows(sampling.sample_with_size_hashed(df, 100, ["id"]), "id")
    # A different salt redraws.
    other = rows(sampling.sample_with_size_hashed(df, 100, ["id"], salt="x"), "id")
    assert ids != other
    # Top-n by hash plans as TakeOrdered, not a full sort shuffle.
    plan = sampling.sample_with_size_hashed(df, 100, ["id"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_sort_partition(spark, tuples3):
    out = sort_limit.sort_partition(tuples3.repartition(2, "grp"), F.asc("id"))
    # Within every partition, ids are ascending.
    pdf = out.withColumn("p", F.spark_partition_id()).toPandas()
    for _, grp in pdf.groupby("p"):
        assert list(grp["id"]) == sorted(grp["id"])


def test_partitioning_spellings(spark):
    from flink_1_3_2_hopsworks_spark.operators import sort_limit as sl

    df = spark.range(100).select((F.col("id") % 10).alias("k"), "id")
    routed = sl.partition_custom(df, F.col("k") % 4, 4)
    assert routed.rdd.getNumPartitions() == 4
    # all rows with the same routing value share a partition
    parts = routed.select(
        (F.col("k") % 4).alias("r"), F.spark_partition_id().alias("p")
    ).distinct().groupBy("r").count().collect()
    assert all(row["count"] == 1 for row in parts)

    assert sl.rescale(df.repartition(8), 2).rdd.getNumPartitions() == 2
    assert sl.global_partition(df).rdd.getNumPartitions() == 1


def test_asof_join_semantics(spark):
    """Inclusive as-of boundary, latest-wins, tiebreak by right id, NULLs
    when nothing precedes."""
    from flink_1_3_2_hopsworks_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)],
        "k long, t long, lid long",
    )
    right = spark.createDataFrame(
        [(1, 10, 7, 1.0), (1, 10, 8, 2.0), (1, 15, 9, 3.0), (2, 6, 10, 4.0)],
        "k long, t long, rid long, v double",
    )
    out = {
        r["lid"]: (r["last_rid"], r["last_v"])
        for r in asof_join(
            left, right, ["k"], "t", "t", ["rid", "v"], right_tiebreak="rid"
        ).collect()
    }
    assert out[100] == (8, 2.0)   # t=10 inclusive; tie at t=10 → larger rid
    assert out[101] == (9, 3.0)   # latest preceding is t=15
    assert out[102] == (None, None)  # right row at t=6 is AFTER t=5


def test_asof_join_null_right_col_is_row_atomic(spark):
    """When the most recent right row has a NULL in one right_col, the output
    takes ALL columns from that row — it must not mix the NULL column from an
    older right row (the fill is a single struct, not per-column last)."""
    from flink_1_3_2_hopsworks_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20, 100)], "k long, t long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 7, 1.0), (1, 15, 9, None)],
        "k long, t long, rid long, v double",
    )
    row = asof_join(
        left, right, ["k"], "t", "t", ["rid", "v"], right_tiebreak="rid"
    ).collect()[0]
    assert row["last_rid"] == 9
    assert row["last_v"] is None  # newest row's NULL, not 1.0 from rid=7
