"""Stream iterations (reference DataStream#iterate / IterativeStream —
flink-streaming-java api/datastream/IterativeStream.java: a feedback edge
re-injects selected records into the operator until they exit the loop).

Structured Streaming's DAG cannot contain cycles, so the Spark-first shape
routes the feedback edge through durable storage the SAME query watches: the
micro-batch step splits each batch into (done, feedback), appends feedback
as files into a watched directory, and the file source picks them up on the
next trigger. On a cluster the feedback channel is a Kafka topic with the
query both producing to and consuming from it — the identical topology, and
the standard Spark idiom for feedback loops.

Like the reference (IterativeStream#closeWith with a maxWaitTime), the loop
has no structural termination: it drains when no records flow. ``
await_drained`` mirrors the reference's loop-timeout — stop after N empty
triggers.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def stream_iterate(
    spark: SparkSession,
    source: DataFrame,
    schema,
    step: Callable[[DataFrame], tuple[DataFrame, DataFrame]],
    feedback_dir: str,
    out_sink: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_seconds: float = 0.5,
) -> StreamingQuery:
    """Run ``source ∪ feedback → step → (out, feedback)`` as one streaming
    query (reference iterate().closeWith(feedback)).

    ``step`` is a BATCH DataFrame transform (runs per micro-batch) returning
    ``(done, feedback)``; feedback rows must have ``schema``. ``out_sink``
    receives the done rows per batch (idempotent on batch_id for
    exactly-once, same contract as foreach_batch_sink).
    """
    os.makedirs(feedback_dir, exist_ok=True)
    feedback = spark.readStream.schema(schema).parquet(feedback_dir)
    unioned = source.unionByName(feedback)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)  # one pass, two uses
        done, fb = step(batch_df)
        # Skip empty feedback writes: every file written is listing work for
        # all future triggers — don't grow the directory with empties.
        if fb.limit(1).count() > 0:
            fb.coalesce(1).write.mode("append").parquet(feedback_dir)
        out_sink(done, batch_id)
        batch_df.unpersist()

    return (
        unioned.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def await_drained(
    query: StreamingQuery,
    idle_triggers: int = 3,
    timeout_seconds: float = 120.0,
    poll_seconds: float = 0.3,
) -> bool:
    """Stop the loop once ``idle_triggers`` consecutive completed triggers
    processed zero rows (reference IterativeStream maxWaitTime semantics).
    Returns True if drained, False on timeout (query stopped either way)."""
    deadline = time.time() + timeout_seconds
    drained = False
    while time.time() < deadline:
        progress = [
            p["numInputRows"] if isinstance(p, dict) else p.numInputRows
            for p in query.recentProgress
        ]
        if len(progress) >= idle_triggers:
            tail = progress[-idle_triggers:]
            if all(n == 0 for n in tail) and any(n > 0 for n in progress):
                drained = True
                break
        if not query.isActive:
            break
        time.sleep(poll_seconds)
    query.stop()
    query.awaitTermination(30)
    return drained
