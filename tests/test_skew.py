"""Tests for the skew-handling operators (operators/skew.py): result parity
with the unsalted plans on a skewed dataset, plus plan-shape checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key "hot" carries 90% of rows, the rest spread over 50 keys
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50)).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)]
    return spark.createDataFrame(rows, "k STRING, name STRING")


def test_salted_aggregate_matches_plain(spark, skewed):
    got = {
        r.k: (r.n, r.total, r.lo, r.hi, round(r.mean, 6))
        for r in salted_aggregate(
            skewed,
            ["k"],
            {
                "n": ("count", "v"),
                "total": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
                "mean": ("avg", "v"),
            },
            num_salts=8,
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.lo, r.hi, round(r.mean, 6))
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }
    assert got == want


def test_salted_aggregate_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_aggregate(skewed, ["k"], {"x": ("collect_list", "v")})


def test_salted_aggregate_fans_out_hot_key(skewed):
    out = salted_aggregate(skewed, ["k"], {"n": ("count", "v")}, num_salts=8)
    s = out._jdf.queryExecution().optimizedPlan().toString()
    # two grouping phases: one on (k, __salt), one on k
    assert s.count("Aggregate") >= 2 and "__salt" in s


def test_salted_join_full_matches_plain(spark, skewed, dim):
    got = salted_join(skewed, dim, ["k"], num_salts=4)
    want = skewed.join(dim, "k")
    assert got.count() == want.count() == skewed.count()
    g = got.groupBy("k", "name").count()
    w = want.groupBy("k", "name").count()
    assert {tuple(r) for r in g.collect()} == {tuple(r) for r in w.collect()}


def test_salted_join_hybrid_matches_plain(spark, skewed, dim):
    hot_keys = spark.createDataFrame([("hot",)], "k STRING")
    got = salted_join(skewed, dim, ["k"], num_salts=4, hot_keys=hot_keys)
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    g = {tuple(r) for r in got.groupBy("k", "name").count().collect()}
    w = {tuple(r) for r in want.groupBy("k", "name").count().collect()}
    assert g == w


def test_salted_join_left_outer_keeps_unmatched(spark, skewed, dim):
    extra = skewed.unionByName(
        skewed.sparkSession.createDataFrame([("orphan", 1.0)], "k STRING, v DOUBLE")
    )
    got = salted_join(extra, dim, ["k"], num_salts=4, how="left")
    assert got.filter(F.col("k") == "orphan").count() == 1
    assert got.filter(F.col("k") == "orphan").collect()[0].name is None


def test_hybrid_cold_path_not_replicated(spark, skewed, dim):
    """The non-hot bulk must join WITHOUT salt fan-out: its join keys are
    just (k), no __salt."""
    hot_keys = spark.createDataFrame([("hot",)], "k STRING")
    out = salted_join(skewed, dim, ["k"], num_salts=4, hot_keys=hot_keys)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # exactly one branch mentions the salt column
    assert plan.count("__salt") > 0
    # and the union has two join branches (cold + hot)
    assert "Union" in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """write_bucketed_table pre-shuffles once; a later join on the bucket
    key must plan with NO Exchange on either side (co-located join — the
    repeated-join payoff at 100 TB)."""
    from flink_1_3_2_hopsworks_spark.sources.io import write_bucketed_table

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        a = spark.range(1000).select(F.col("id").alias("k"), F.rand(1).alias("x"))
        b = spark.range(1000).select(F.col("id").alias("k"), F.rand(2).alias("y"))
        write_bucketed_table(a, "bk_a", ["k"], num_buckets=4, sort_cols=["k"])
        write_bucketed_table(b, "bk_b", ["k"], num_buckets=4, sort_cols=["k"])
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
