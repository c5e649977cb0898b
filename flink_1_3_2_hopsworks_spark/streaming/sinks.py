"""Streaming sinks (§2.1 sink rows).

Reference parity: BucketingSink (time/size-bucketed exactly-once files),
Kafka producer sink (FlinkKafkaProducer — at-least-once), Elasticsearch /
Cassandra batched sinks (via foreachBatch fan-out), print sink.

Spark-first mapping: ``writeStream`` sinks — the file sink is exactly-once
via the checkpoint + file-commit protocol (strictly stronger than
BucketingSink's valid-length truncation recovery); arbitrary external
systems go through ``foreachBatch`` with idempotent/upsert writes.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Exactly-once bucketed file sink (reference BucketingSink):
    ``partition_by`` gives the directory bucketing (e.g. on a derived
    date/hour column for time buckets)."""
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """Assemble the Kafka sink option dict (pure — unit-testable without a
    broker). At-least-once via checkpointed batch replay, matching the
    reference FlinkKafkaProducer010's default (its exactly-once txn producer
    arrived post-1.3)."""
    if not topic:
        raise ValueError("kafka sink requires a non-empty topic")
    if not checkpoint:
        raise ValueError("kafka sink requires a checkpointLocation")
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
) -> StreamingQuery:
    """Kafka producer sink (reference FlinkKafkaProducer010): expects
    ``key``/``value`` binary or string columns."""
    writer = df.writeStream.format("kafka")
    for k, v in kafka_sink_options(bootstrap_servers, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer.start()


def foreach_batch_sink(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "append",
    available_now: bool = False,
) -> StreamingQuery:
    """External-system sink (reference Elasticsearch/Cassandra/JDBC sinks):
    ``fn(batch_df, batch_id)`` runs per micro-batch; make it idempotent on
    batch_id for exactly-once to transactional targets."""
    writer = (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def console_sink(df: DataFrame, output_mode: str = "append") -> StreamingQuery:
    """Debug print sink (reference print())."""
    return df.writeStream.format("console").outputMode(output_mode).start()