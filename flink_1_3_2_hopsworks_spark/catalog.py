"""Table catalog over the parquet test corpus.

Reference parity: Flink's ``TableEnvironment`` catalog registration
(flink-libraries/flink-table .../api/TableEnvironment.scala —
``registerTableSource`` / ``registerDataSet``) and the typed input formats of
§2.1 (CsvInputFormat/AvroInputFormat/...). Here every table is a parquet
DataSource-V2 scan, so projection and predicate pushdown (the reference's
``ProjectableTableSource`` / ``FilterableTableSource`` traits) are native.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any scale factor the TPC-H
# generator produces (region/nation are constant-size; supplier/part/customer
# grow but stay orders of magnitude under fact tables).
BROADCASTABLE = {"region", "nation", "supplier"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table as a DataFrame (lazy parquet scan).

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects — read as long nanos, convert to µs)
    and plain TIMESTAMP(MICROS) (read as-is, only normalize NTZ→LTZ so the
    streaming operators see one TimestampType). Detect from the schema.
    """
    if name == "events":
        import pyspark.sql.functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Integer division: float division could round the µs value up
            # and disagree with DuckDB's ns→µs truncation by 1µs.
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register corpus tables as temp views so ``spark.sql`` can see them."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
