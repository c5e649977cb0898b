"""Skew-handling operators — the 100-TB posture for hot keys.

The reference's DataSet runtime rebalances skew only by hash-partition fan-out
(flink-runtime partition/ + optimizer's ShipStrategy choice); it has no
automatic skew mitigation, so hot keys were handled by hand in user code.
Spark's AQE skew-join (`spark.sql.adaptive.skewJoin`, on by default in
session.py) rewrites oversized *shuffle-join* partitions at runtime — but
AQE cannot help two cases that matter at 100 TB:

1. **Aggregations over hot keys**: partial (map-side) aggregation absorbs
   skew only when the per-key state is tiny; for high-fanout aggregates
   (collect_list, count-distinct buckets, large UDAF state) one reducer
   still receives the whole hot key. → ``salted_aggregate``: two hash
   aggregates, (key, salt) then key, both partial-aggregated.
2. **Joins AQE can't rewrite**: stream-static joins, joins over bucketed /
   pre-partitioned inputs (no exchange to split), or any plan pinned away
   from sort-merge. → ``salted_join``: replicate the small side per salt,
   randomize the big side's salt — classic fan-out join. The hybrid variant
   salts ONLY the declared hot keys, so the non-skewed bulk pays no
   replication.

Both operators are pure DataFrame compositions — Catalyst sees through them
(pushdown, codegen, partial aggregation all intact).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SALT = "__salt"

# (partial_phase, merge_phase) per re-aggregatable op: the merge phase runs
# over the partial results, e.g. count → sum of partial counts.
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys: ``aggs`` maps output column →
    (op, input column), op ∈ sum/count/min/max/avg.

    Phase 1 aggregates on (keys, salt) — the hot key fans out over
    ``num_salts`` reducers; phase 2 merges per key. avg decomposes into
    sum+count merged at the end (the only non-trivial merge)."""
    plan: dict[str, tuple] = {}
    for out, (op, col) in aggs.items():
        op = op.lower()
        if op == "avg":
            plan[f"{out}__s"] = ("sum", col, None)
            plan[f"{out}__c"] = ("count", col, None)
        elif op in _MERGEABLE:
            plan[out] = (op, col, None)
        else:
            raise ValueError(f"non-mergeable aggregate for salting: {op}")

    salted = df.withColumn(_SALT, (F.rand(seed=42) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _MERGEABLE[op][0](col).alias(name)
            for name, (op, col, _) in plan.items()
        ]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            _MERGEABLE[op][1](name).alias(name)
            for name, (op, col, _) in plan.items()
        ]
    )
    # stitch avg back together; drop its helper columns
    final_cols: list[Column] = [F.col(k) for k in keys]
    for out, (op, col) in aggs.items():
        if op.lower() == "avg":
            final_cols.append((F.col(f"{out}__s") / F.col(f"{out}__c")).alias(out))
        else:
            final_cols.append(F.col(out))
    return merged.select(*final_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    num_salts: int = 16,
    hot_keys: DataFrame | None = None,
    how: str = "inner",
) -> DataFrame:
    """Fan-out equi-join for skewed keys.

    Full salting (``hot_keys=None``): every big-side row gets a random salt,
    the small side is replicated ``num_salts``× — total work scales with
    |small| × num_salts, so use only when the small side is modest.

    Hybrid (``hot_keys`` = DataFrame of key columns): ONLY rows whose key is
    hot are salted/replicated; the bulk joins unsalted. hot_keys is
    broadcast twice (it is by construction tiny — the handful of keys that
    overflow a reducer), so the split adds no shuffle."""
    if hot_keys is None:
        return _salted_equi_join(big, small, keys, num_salts, how)

    hot = F.broadcast(hot_keys.select(*keys).distinct())
    big_hot = big.join(hot, list(keys), "left_semi")
    big_cold = big.join(hot, list(keys), "left_anti")
    small_hot = small.join(hot, list(keys), "left_semi")

    cold = big_cold.join(small, list(keys), how)
    hot_joined = _salted_equi_join(big_hot, small_hot, keys, num_salts, how)
    return cold.unionByName(hot_joined)


def _salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    num_salts: int,
    how: str,
) -> DataFrame:
    if how.replace("_outer", "") not in ("inner", "left", "leftouter", "left_semi", "leftsemi", "semi"):
        # right/full would emit one unmatched small-side row PER SALT copy
        raise ValueError(f"salted join supports inner/left/semi, not {how!r}")
    big_s = big.withColumn(_SALT, (F.rand(seed=7) * num_salts).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return big_s.join(small_s, [*keys, _SALT], how).drop(_SALT)
