"""Queryable state (reference flink-runtime queryable-state: a running job's
keyed state served to out-of-band readers via QueryableStateClient —
``stream.keyBy(...).asQueryableState("name")``).

Structured Streaming has no state-serving RPC, so the Spark-first shape is
the *materialized-view* pattern: the stateful query's UPDATE stream upserts
into a view store per micro-batch via ``foreachBatch``; readers query the
store instead of the job. That is also the 100-TB posture — on a cluster the
store is an external KV/serving system (Cassandra, Redis, a Delta table);
``foreachBatch`` is the documented Spark idiom for exactly that, and the
upsert is idempotent on (key, batch) so checkpoint replays are safe.

This module ships two stores with one contract:
- ``MemoryStateStore`` — driver-local dict, the test/local twin of the
  reference's QueryableStateClient (lookups without touching the job);
- ``ParquetStateStore`` — key-partition-pruned parquet upserts: the same
  contract against durable storage, scale path for local[*] and small
  clusters (swap for a real KV sink in production).
"""

from __future__ import annotations

import os
import threading
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.streaming import StreamingQuery


class MemoryStateStore:
    """In-memory keyed-state view (reference QueryableStateClient twin).

    ``get(key)`` returns the latest state row for a key; ``snapshot(spark)``
    the whole state as a DataFrame. Thread-safe: foreachBatch runs on the
    stream's microbatch thread while readers query concurrently — exactly
    the reference's concurrent state-access model (QueryableStateServer
    serves reads while the task thread updates).
    """

    def __init__(self, key_cols: Sequence[str]):
        self.key_cols = list(key_cols)
        self._state: dict[tuple, Row] = {}
        self._lock = threading.Lock()
        self._schema = None

    # -- writer side (wired by as_queryable_state) ----------------------

    def _upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()  # update-mode micro-batch: only changed keys
        if self._schema is None:
            self._schema = batch_df.schema
        with self._lock:
            for row in rows:
                k = tuple(row[c] for c in self.key_cols)
                self._state[k] = row

    # -- reader side -----------------------------------------------------

    def get(self, *key) -> Row | None:
        with self._lock:
            return self._state.get(tuple(key))

    def keys(self) -> list[tuple]:
        with self._lock:
            return list(self._state)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        with self._lock:
            rows = list(self._state.values())
        if not rows:
            return spark.createDataFrame([], self._schema or "key STRING")
        return spark.createDataFrame(rows, self._schema)

    def __len__(self) -> int:
        with self._lock:
            return len(self._state)


class ParquetStateStore:
    """Durable keyed-state view: upserts land as one parquet write per
    micro-batch under ``root/state/``, replacing only the partitions whose
    keys changed (dynamic partition overwrite on a bucket column). Readers
    get the current state with a key-pruned scan — the lookup reads ONE
    bucket directory, not the table.
    """

    def __init__(self, root: str, key_cols: Sequence[str], num_buckets: int = 16):
        self.root = root
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        self._path = os.path.join(root, "state")

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "_bucket", F.pmod(F.hash(*self.key_cols), F.lit(self.num_buckets))
        )

    def _upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = self._bucketed(batch_df)
        if os.path.isdir(self._path):
            touched = [r._bucket for r in new.select("_bucket").distinct().collect()]
            if not touched:
                return
            current = spark.read.parquet(self._path).filter(
                F.col("_bucket").isin(touched)
            )
            keep = current.join(
                new.select(*self.key_cols).distinct(), self.key_cols, "left_anti"
            )
            # Materialize before overwriting the path we just read —
            # Spark rejects writes whose plan still scans the target.
            merged = keep.unionByName(new).localCheckpoint(eager=True)
        else:
            merged = new
        (
            merged.repartition(1, "_bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(self._path)
        )

    def get(self, spark: SparkSession, *key) -> Row | None:
        if not os.path.isdir(self._path):
            return None
        # Compute the key's bucket with the same Spark hash (one local-only
        # row, no scan). Literals must carry the stored column types — a
        # bigint column hashed as int32 would land in the wrong bucket.
        table = spark.read.parquet(self._path)
        types = {f.name: f.dataType for f in table.schema.fields}
        lits = [
            F.lit(v).cast(types[c]) for c, v in zip(self.key_cols, key)
        ]
        bucket = (
            spark.range(1)
            .select(F.pmod(F.hash(*lits), F.lit(self.num_buckets)).alias("b"))
            .collect()[0]
            .b
        )
        cond = F.col("_bucket") == bucket
        for c, v in zip(self.key_cols, key):
            cond = cond & (F.col(c) == F.lit(v))
        rows = table.filter(cond).drop("_bucket").limit(1).collect()
        return rows[0] if rows else None

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._path).drop("_bucket")


def as_queryable_state(
    state_df: DataFrame,
    store,
    checkpoint: str,
    available_now: bool = False,
) -> StreamingQuery:
    """``keyedStream.asQueryableState(name)`` — attach a stateful streaming
    result (e.g. ``running_agg`` in update mode) to a state store. The
    UPDATE stream carries only changed keys per micro-batch, so the upsert
    cost tracks the *change rate*, not state size."""
    writer = (
        state_df.writeStream.foreachBatch(store._upsert_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
