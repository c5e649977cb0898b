"""Streaming as-of (temporal) join — the stream twin of
operators/asof.py#asof_join (reference lineage: post-1.3 Flink temporal
table joins, flink-table runtime/join/TemporalRowTimeJoinOperator; in 1.3
users hand-built this with a CoProcessFunction holding the latest build
row per key, which is exactly the shape below).

Spark-first mapping: connect-style tagged union of both streams →
``applyInPandasWithState`` keyed on the join keys. State per key is ONE
compact record — the best (latest ``(t, tiebreak)``) right row seen so far —
so state size is O(keys), not O(events). Within each micro-batch, rows
replay in ``(t, is_left, tiebreak)`` order (right before left at equal t:
inclusive as-of, same as the batch operator); a right row that arrives in a
LATER micro-batch than a left row it precedes by timestamp cannot
retroactively enrich it — the documented micro-batch divergence, identical
to the reference's processing-time temporal join. The batch operator is the
exact event-time answer; equivalence holds whenever batch boundaries
respect event-time order (tested in tests/test_streaming_asof.py).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.streaming.keys import (
    key_casters,
    key_fields_ddl,
    key_py_values,
)


def _jsafe(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if hasattr(v, "item"):
        return v.item()
    return v


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    right_tiebreak: str | None = None,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """For each left-stream row, append ``last_<c>`` for the latest
    right-stream row with the same keys at-or-before its timestamp (NULLs
    when none has arrived). ``right_cols`` must be scalar (numeric/string/
    bool) — they ride in JSON keyed state."""
    on = list(on)
    right_cols = list(right_cols)
    l_pass = [c for c in left.columns if c not in on]
    l_types = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    r_types = {f.name: f.dataType.simpleString() for f in right.schema.fields}

    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    lt = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_l"),
        F.lit(None).cast("long").alias("_rtb"),
        *[F.col(c) for c in l_pass],
        *[F.lit(None).cast(r_types[c]).alias(f"_r_{c}") for c in right_cols],
    )
    rt = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_l"),
        tb.alias("_rtb"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_pass],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    union = lt.unionByName(rt).withWatermark("_t", watermark_delay)

    out_schema = ", ".join(
        [
            key_fields_ddl(left, on),
            f"{left_time} timestamp",
            *[f"{c} {l_types[c]}" for c in l_pass if c != left_time],
            *[f"last_{c} {r_types[c]}" for c in right_cols],
        ]
    )
    casters = key_casters(left, on)
    pass_cols = [c for c in l_pass if c != left_time]

    def process(key, pdf_iter, state):
        if state.exists:
            best = json.loads(state.get[0])
        else:
            best = None
        key_vals = dict(zip(on, key_py_values(casters, key)))
        # applyInPandasWithState guarantees no ordering ACROSS the Arrow
        # chunks of one key group, so a key whose micro-batch data spans
        # multiple chunks must be concatenated and sorted ONCE — sorting per
        # chunk would replay rows out of (t, is_left, tiebreak) order (same
        # pattern as streaming/process.py's _ordered helper).
        chunks = list(pdf_iter)
        rows: list[dict] = []
        if chunks:
            merged = pd.concat(chunks, ignore_index=True)
            merged = merged.assign(
                _ts_ms=lambda p: p["_t"].astype("int64") // 1_000_000,
                _tb=lambda p: p["_rtb"].fillna(-1).astype("int64"),
            ).sort_values(["_ts_ms", "_is_l", "_tb"], kind="mergesort")
            rows = merged.to_dict("records")
        out: list[dict] = []
        for r in rows:
            if r["_is_l"] == 0:  # right: keep the latest (t, tiebreak)
                cand = (r["_ts_ms"], r["_tb"])
                if best is None or cand >= (best["t"], best["tb"]):
                    best = {
                        "t": int(r["_ts_ms"]),
                        "tb": int(r["_tb"]),
                        "vals": {c: _jsafe(r[f"_r_{c}"]) for c in right_cols},
                    }
            else:  # left: emit enriched
                out.append(
                    {
                        **key_vals,
                        left_time: r["_t"],
                        **{c: _jsafe(r[c]) for c in pass_cols},
                        **{
                            f"last_{c}": (
                                best["vals"][c] if best is not None else None
                            )
                            for c in right_cols
                        },
                    }
                )
        if best is not None:
            state.update((json.dumps(best),))
        if out:
            yield pd.DataFrame(out)

    return union.groupBy(*on).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType="data string",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
