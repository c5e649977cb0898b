"""As-of (temporal) join and banded range join — custom operators the
reference era lacked a first-class spelling for (users composed them from
coGroup + sorted iteration; post-1.3 Flink added temporal table joins:
flink-table runtime/join/TemporalProcessTimeJoin et al.). North-star
extension here, composed purely from DataFrame ops.

Spark-first design:

* ``asof_join`` — the UNION-MERGE formulation, not a range join: tag both
  inputs, union them, and carry the right side's columns forward with
  ``last(ignorenulls)`` over a (key, time)-ordered window, then keep left
  rows. ONE shuffle on the key, a single linear window scan per key —
  at 100 TB this is the difference between a merge and a quadratic
  time-range join explosion. Right rows at the same timestamp sort BEFORE
  left rows (inclusive as-of: a quote at exactly t matches a trade at t),
  ties among right rows broken by ``right_tiebreak`` so the match is
  deterministic.

* ``range_join`` — join a fact column into banded [lo, hi) intervals. The
  band table is small by construction, so Spark plans a broadcast
  nested-loop join: every executor streams its facts against the in-memory
  band list — the correct physical plan for band joins at any fact-side
  scale (an equi-join can't express BETWEEN; a shuffle NLJ would be a
  disaster).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, append the ``right_cols`` of the most recent right
    row with the same ``on`` keys and ``right_time`` <= ``left_time``
    (NULLs when no right row precedes). Both time columns must be mutually
    comparable (timestamps or numerics)."""
    on = list(on)
    right_cols = list(right_cols)
    lcols = left.columns
    # The right payload rides as ONE struct column so the window fill below is
    # row-atomic: if the newest right row has a NULL in some right_col, the
    # output still takes ALL its columns from that row (matching the oracle's
    # row-level ROW_NUMBER pick and the streaming twin's whole-row state)
    # instead of mixing in that column from an older right row.
    r_struct_type = (
        "struct<" + ",".join(f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
    )
    tagged_l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast("long").alias("_rtb"),
        *[F.col(c) for c in lcols if c not in on],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    tagged_r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_l"),
        tb.alias("_rtb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # Right rows first at equal _t (inclusive as-of); among them the largest
    # tiebreak LAST, so last(ignorenulls) picks it deterministically.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_l").asc(), F.col("_rtb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_f"),
    )
    return filled.filter(F.col("_is_l") == 1).select(
        *on,
        F.col("_t").alias(left_time),
        *[F.col(c) for c in lcols if c not in on and c != left_time],
        *[F.col("_f").getField(c).alias(f"last_{c}") for c in right_cols],
    )


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str | Column,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join each fact row to the band row(s) with lo <= value < hi. ``bands``
    must be small (it is broadcast); overlapping bands fan out like SQL."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    cond = (v >= F.col(lo_col)) & (v < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, how)
