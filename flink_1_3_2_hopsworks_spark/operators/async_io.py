"""Async I/O — concurrent external lookups (§2.7).

Reference parity: ``AsyncDataStream.orderedWait/unorderedWait`` +
``AsyncFunction`` (flink-streaming-java api/datastream/AsyncDataStream.java,
api/operators/async/AsyncWaitOperator.java, 1.2): per-record async requests
against an external system with bounded in-flight capacity, a per-request
timeout, and ordered (emit in input order) or unordered (emit on completion)
modes.

Spark-first mapping: ``mapInPandas`` — requests are batched per Arrow batch
and driven by one asyncio event loop per batch, so concurrency happens
inside the Python worker without per-row round trips. The capacity
semaphore bounds in-flight requests exactly like the reference's queue;
``ordered`` reproduces orderedWait's emission order within each partition
(the reference's order guarantee is also per parallel subtask, not global).

Scale notes: no shuffle — a narrow transformation; concurrency × executors
= cluster-wide request rate, so size ``capacity`` against what the external
service tolerates. For lookups against a SMALL static table, prefer a
broadcast join; this operator is for true remote services (HTTP, KV store,
model endpoint).
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

Lookup = Callable[[dict], "Awaitable[dict] | dict"]


def async_lookup(
    df: DataFrame,
    lookup: Lookup,
    result_schema: str,
    capacity: int = 100,
    timeout_seconds: float | None = None,
    ordered: bool = True,
    on_timeout: str = "error",
) -> DataFrame:
    """Enrich ``df`` by calling ``lookup(row_dict) -> dict`` concurrently
    (async def or plain function) with at most ``capacity`` in flight per
    partition.

    ``result_schema`` is DDL for the appended columns (e.g. ``"tier string,
    score double"``). ``on_timeout="null"`` emits NULL result columns on a
    timed-out request (reference AsyncFunction#timeout override);
    ``"error"`` fails the task (reference default).
    """
    if on_timeout not in ("error", "null"):
        raise ValueError("on_timeout must be 'error' or 'null'")
    extra = StructType.fromDDL(result_schema)
    out_schema = StructType(list(df.schema) + list(extra))
    null_result = {f.name: None for f in extra}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def call(sem, row):
            async with sem:
                res = lookup(row)
                if not asyncio.iscoroutine(res):
                    return row, res  # plain-function lookups work too
                if timeout_seconds is None:
                    return row, await res
                try:
                    return row, await asyncio.wait_for(res, timeout_seconds)
                except asyncio.TimeoutError:
                    if on_timeout == "null":
                        return row, None
                    raise

        async def drive(rows):
            sem = asyncio.Semaphore(capacity)
            tasks = [asyncio.create_task(call(sem, r)) for r in rows]
            if ordered:
                return await asyncio.gather(*tasks)
            return [await t for t in asyncio.as_completed(tasks)]

        res_cols = [f.name for f in extra]
        for pdf in batches:
            if pdf.empty:
                continue
            pairs = asyncio.run(drive(pdf.to_dict("records")))
            if ordered:
                # Vectorized assembly (guide §4.2): gather() preserves task
                # creation order == input row order, so the result columns
                # concat positionally onto the untouched input batch —
                # no per-row dict merge, no list-of-dicts frame build.
                res = pd.DataFrame.from_records(
                    [r if r is not None else null_result for _, r in pairs],
                    columns=res_cols,
                )
                yield pd.concat((pdf.reset_index(drop=True), res), axis=1)
            else:
                # Completion order: rows must be rebuilt alongside results.
                yield pd.DataFrame(
                    [
                        {**row, **(res if res is not None else null_result)}
                        for row, res in pairs
                    ]
                )

    return df.mapInPandas(run, out_schema)
