"""Streaming sources (§2.1 streaming rows).

Reference parity: Kafka consumer (FlinkKafkaConsumerBase — offsets in
checkpoint), file-monitoring source (ContinuousFileMonitoringFunction),
socket source, and the test harness pattern of feeding scripted elements
(flink-streaming-java WindowOperatorTest style).

Spark-first mapping: ``readStream.format("kafka"/"parquet"/"socket"/"rate")``.
For tests without Kafka, ``events_file_stream`` replays the corpus ``events``
table through a real file-source stream (exactly-once via checkpoint +
availableNow trigger), which exercises the same watermark/window machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Kafka source (reference FlinkKafkaConsumer010): offsets tracked in the
    streaming checkpoint — same exactly-once read semantics."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Debug socket source (reference SocketTextStreamFunction)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Sequence source (reference StatefulSequenceSource)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def file_stream(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-monitoring source (reference ContinuousFileMonitoringFunction):
    watches ``path``, ingests new files per micro-batch."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def events_file_stream(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Stream of the corpus ``events`` shape from a staging directory the
    test harness drops parquet files into (scripted micro-batches)."""
    return file_stream(spark, staging_dir, EVENTS_SCHEMA)
