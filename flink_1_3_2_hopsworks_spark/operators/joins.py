"""Join operator surface.

Reference parity: the DataSet join API (flink-java .../DataSet.java#join,
operators/JoinOperator.java) with its JoinHint strategies, outer joins
(LeftOuterJoinDriver & co.), cross (CrossOperator), and coGroup
(CoGroupOperator). The reference requires at least one equi-predicate and
applies theta residuals as a post-filter — Spark's ExtractEquiJoinKeys does
exactly that, so we simply expose the declarative join and map hints.

Scale notes: hints map to Spark's native strategies — BROADCAST ships the
small side to every executor (no shuffle), SHUFFLE_HASH builds a hash table
per partition (good when one side is much smaller but too big to broadcast),
MERGE sorts both sides (stable for huge ~equal inputs). With AQE enabled the
OPTIMIZER_CHOOSES default is usually right; hints exist for the cases where
runtime stats mislead (e.g. exploding joins).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType

# Flink JoinHint (flink-core JoinOperatorBase.JoinHint) → Spark strategy hint.
_HINTS = {
    "OPTIMIZER_CHOOSES": None,
    "BROADCAST_HASH_FIRST": ("left", "broadcast"),
    "BROADCAST_HASH_SECOND": ("right", "broadcast"),
    "REPARTITION_HASH_FIRST": ("left", "shuffle_hash"),
    "REPARTITION_HASH_SECOND": ("right", "shuffle_hash"),
    "REPARTITION_SORT_MERGE": ("left", "merge"),
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: Column | str | Sequence[str],
    how: str = "inner",
    hint: str = "OPTIMIZER_CHOOSES",
) -> DataFrame:
    """Equi-join with a Flink-style join hint.

    ``how`` accepts Spark's join types — inner/left/right/full cover the
    reference's join/leftOuterJoin/rightOuterJoin/fullOuterJoin; left_semi /
    left_anti are native extras (the reference only reached them via
    IN/EXISTS rewrites in batch SQL).
    """
    mapped = _HINTS.get(hint.upper())
    if mapped is None and hint.upper() not in _HINTS:
        raise ValueError(f"unknown join hint: {hint}")
    if mapped:
        side, strategy = mapped
        if side == "left":
            left = left.hint(strategy)
        else:
            right = right.hint(strategy)
    return left.join(right, on, how)


def join_with_tiny(left: DataFrame, tiny_right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Reference ``joinWithTiny`` sugar: broadcast the right side."""
    return left.join(F.broadcast(tiny_right), on, how)


def join_with_huge(tiny_left: DataFrame, huge_right: DataFrame, on, how: str = "inner") -> DataFrame:
    """Reference ``joinWithHuge`` sugar: broadcast the (tiny) left side."""
    return F.broadcast(tiny_left).join(huge_right, on, how)


def cross(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product (reference CrossOperator / block-nested-loop).

    At scale: only ever sane when one side is tiny — Spark plans
    BroadcastNestedLoopJoin then; a true huge×huge cross is a design bug.
    """
    return left.crossJoin(right)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Left-semi join (EXISTS): rows of ``left`` with a match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Left-anti join (NOT EXISTS): rows of ``left`` without a match."""
    return left.join(right, on, "left_anti")


def co_group(
    left: DataFrame,
    right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    func: Callable,
    schema: StructType | str,
) -> DataFrame:
    """Group-wise two-input apply — the reference's coGroup
    (flink-java operators/CoGroupOperator.java): for each key, the user
    function sees the FULL group from each side (possibly empty on one side),
    unlike a join which sees pairs.

    Spark-first mapping: ``groupBy().cogroup().applyInPandas`` — both sides
    shuffle on their keys once, then each co-grouped pair crosses the Arrow
    boundary as two pandas DataFrames. ``func(left_pdf, right_pdf) -> pdf``.
    """
    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(func, schema)
    )
