"""Iterative processing (bulk + delta iterations).

Reference parity: bulk iterations (flink-java operators/IterativeDataSet,
runtime loop in flink-runtime iterative/task/IterationHeadTask & co.) and
delta iterations (DeltaIteration with an updatable solution-set hash index,
CompactingHashTable).

Spark-first mapping: a driver-side loop over DataFrames. The reference's
runtime keeps loop-invariant data cached across supersteps — here that's
``cache()`` on invariants plus ``localCheckpoint`` per iteration to truncate
the growing lineage (otherwise plan size explodes and each iteration
re-executes history).

Scale notes: each superstep is a fresh distributed job; the per-iteration
overhead is scheduling, not data movement, as long as the working set is
cached. Delta iteration keeps the Flink semantics (solution set merged by
key each round, iterate while the workset is non-empty).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _materialize(df: DataFrame) -> DataFrame:
    """localCheckpoint + re-alias every column.

    The re-alias mints fresh attribute exprIds: checkpointed LogicalRDDs
    KEEP their source plan's exprIds, so two frames materialized from shared
    lineage can expose identical ids — a later join between them then
    miscompiles (AttributeMap "key not found" at resolution). Fresh aliases
    make each materialized frame's attributes globally unique."""
    ckpt = df.localCheckpoint(eager=True)
    return ckpt.select(*[F.col(c).alias(c) for c in ckpt.columns])


def materialize(df: DataFrame) -> DataFrame:
    """Public pin for LOOP-INVARIANT inputs of an iteration.

    Without this, any frame referenced inside a ``step`` closure re-executes
    its full upstream plan every superstep — invisible when the input is a
    parquet scan, catastrophic when it is an expensive derivation (e.g. the
    MinHash pair generator feeding connected components re-ran LSH per
    superstep: measured 2.1× on the whole near-dedup pipeline at sf1, a
    timeout at sf10). Mirrors the reference runtime's loop-invariant caching
    (flink-runtime iterative/task/IterationHeadTask back-channel cache).
    """
    return _materialize(df)


def iterate(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Bulk iteration: ``state = step(state, i)`` for up to ``max_iterations``,
    stopping early when ``converged(prev, curr)`` returns True.
    """
    state = _materialize(initial)
    for i in range(max_iterations):
        nxt = step(state, i)
        if (i + 1) % checkpoint_every == 0:
            nxt = _materialize(nxt)
        if converged is not None and converged(state, nxt):
            state = nxt
            break
        state = nxt
    return state


def iterate_delta(
    solution: DataFrame,
    workset: DataFrame,
    step: Callable[[DataFrame, DataFrame, int], tuple[DataFrame, DataFrame]],
    key_cols: list[str],
    max_iterations: int,
) -> DataFrame:
    """Delta iteration (reference DeltaIteration): per round, ``step`` returns
    (delta, new_workset); the delta is merged into the solution set by key
    (new rows win); iteration stops when the workset is empty.
    """
    solution = _materialize(solution)
    workset = _materialize(workset)
    for i in range(max_iterations):
        if workset.isEmpty():
            break
        delta, new_workset = step(solution, workset, i)
        delta = _materialize(delta)
        # Merge: delta rows replace same-key solution rows.
        solution = _materialize(
            solution.join(delta.select(*key_cols), key_cols, "left_anti")
            .unionByName(delta)
        )
        workset = _materialize(new_workset)
    return solution
