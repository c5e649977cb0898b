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


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Assemble the Kafka source option dict (pure — unit-testable without a
    broker; the container has neither broker nor connector jar, so this is
    where a config regression would otherwise hide behind the gate).

    Offset-resume semantics match the reference (FlinkKafkaConsumerBase):
    ``startingOffsets`` applies only on FIRST start; on restart the offsets
    in the streaming checkpoint win. ``fail_on_data_loss=True`` mirrors the
    reference's default fail-on-out-of-range behavior; False resets like
    Flink's ``setStartFromGroupOffsets`` + auto.offset.reset."""
    if not topic:
        raise ValueError("kafka source requires a non-empty topic")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_value_projection(df: DataFrame, schema: StructType | str) -> DataFrame:
    """Project a Kafka source frame's binary ``value`` into typed columns via
    from_json — the reference's DeserializationSchema step. Pure DataFrame
    transform: unit-testable on any frame with a binary ``value`` column."""
    import pyspark.sql.functions as F

    return df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("_v")
    ).select("_v.*")


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source (reference FlinkKafkaConsumer010): offsets tracked in the
    streaming checkpoint — same exactly-once read semantics."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        bootstrap_servers,
        topic,
        starting_offsets,
        fail_on_data_loss,
        max_offsets_per_trigger,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


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
