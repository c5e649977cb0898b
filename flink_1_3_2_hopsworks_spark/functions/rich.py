"""RichFunction context: broadcast sets, distributed cache, accumulators
(§2.10).

Reference parity: ``RuntimeContext`` (flink-core api/common/functions/
RuntimeContext.java) — ``getBroadcastVariable`` (withBroadcastSet),
``DistributedCache`` (env.registerCachedFile), accumulators
(IntCounter/LongCounter/Histogram) read after job completion.

Spark-first mapping:
  - broadcast sets → ``sparkContext.broadcast`` of collected small data (for
    Python-side use) or a broadcast join (for plan-side use — preferred).
  - distributed cache → ``SparkContext.addFile`` + ``SparkFiles.get``.
  - accumulators → ``df.observe`` (named metrics riding the plan, no extra
    job) or SparkContext accumulators for imperative UDF counting.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


def broadcast_set(df: DataFrame):
    """withBroadcastSet analogue for Python-side access: collect a SMALL
    DataFrame and broadcast it to executors. For joins, prefer
    ``F.broadcast(df)`` — it stays JVM-side."""
    rows = [r.asDict() for r in df.collect()]
    return df.sparkSession.sparkContext.broadcast(rows)


def register_cached_file(spark, path: str) -> str:
    """Distributed cache (reference env.registerCachedFile): ship a file to
    every executor; UDFs resolve it via SparkFiles.get(name)."""
    spark.sparkContext.addFile(path)
    return path.rsplit("/", 1)[-1]


def observe(
    df: DataFrame, name: str, metrics: Sequence[Column]
) -> tuple[DataFrame, Observation]:
    """Accumulator analogue: named metrics computed as the plan runs
    (reference IntCounter/LongCounter read from JobExecutionResult).
    ``observation.get`` blocks until an action ran the plan."""
    observation = Observation(name)
    return df.observe(observation, *metrics), observation


def counter(spark, name: str = "counter"):
    """Imperative accumulator for Python UDF paths (reference IntCounter)."""
    return spark.sparkContext.accumulator(0)
