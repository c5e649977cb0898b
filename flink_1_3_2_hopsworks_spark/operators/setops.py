"""Set operations.

Reference parity: union (flink-java operators/UnionOperator.java — bag/ALL
semantics), SQL UNION (DataSetUnion + dedup aggregate), INTERSECT [ALL]
(DataSetIntersect via coGroup) and EXCEPT/MINUS [ALL] (DataSetMinus via
coGroup).

Scale notes: Spark's native INTERSECT/EXCEPT plan as left-semi/anti hash
joins after local dedup — strictly better than the reference's coGroup
formulation (no full-group materialization). ``union`` is metadata-only
(no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Bag union — the reference's only DataSet union semantics (ALL)."""
    return left.unionByName(right)


def union_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """SQL UNION: bag union + dedup (one shuffle on all columns)."""
    return left.unionByName(right).distinct()


def intersect(left: DataFrame, right: DataFrame, all: bool = False) -> DataFrame:
    """INTERSECT [ALL]."""
    return left.intersectAll(right) if all else left.intersect(right)


def minus(left: DataFrame, right: DataFrame, all: bool = False) -> DataFrame:
    """EXCEPT/MINUS [ALL]."""
    return left.exceptAll(right) if all else left.subtract(right)
