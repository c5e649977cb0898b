"""Stream routing: split/select, side outputs, connect (§2.7).

Reference parity: ``split``/``select`` (flink-streaming-java
api/datastream/SplitStream.java), typed OutputTag side outputs (1.3,
util/OutputTag.java), and ``connect`` / CoProcessFunction
(api/datastream/ConnectedStreams.java).

Spark-first mapping: multiple filtered branches off one DataFrame — Spark's
DAG dedups the shared scan (and ``foreachBatch`` fans one micro-batch out to
several sinks in streaming). ``connect`` is a tagged union: both inputs
normalized to one schema with a source tag, so downstream stateful ops see
one keyed stream (the two-input-operator encoding).
"""

from __future__ import annotations

from collections.abc import Mapping

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def split(df: DataFrame, routes: Mapping[str, Column]) -> dict[str, DataFrame]:
    """split/select: named predicate routes over one input. A record can
    reach several routes (reference split semantics). Each branch is a
    filter off the same plan — one scan, N outputs."""
    return {name: df.filter(cond) for name, cond in routes.items()}


def side_output(
    df: DataFrame, main_cond: Column
) -> tuple[DataFrame, DataFrame]:
    """Main output + side output (reference OutputTag): rows failing
    ``main_cond`` route to the side channel (e.g. a dead-letter sink)."""
    return df.filter(main_cond), df.filter(~main_cond)


def connect(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    tag_col: str = "_source",
) -> DataFrame:
    """connect: tagged union of two inputs on a shared key schema (the
    CoProcessFunction encoding — downstream stateful operators branch on
    ``tag_col``). Non-key columns are kept from both sides, null-padded."""
    l_types = dict(left.dtypes)
    r_types = dict(right.dtypes)
    all_cols = [*left.columns, *[c for c in right.columns if c not in l_types]]

    def pad(df_types, other_types):
        return [
            F.col(c) if c in df_types else F.lit(None).cast(other_types[c]).alias(c)
            for c in all_cols
        ]

    lt = left.select(*pad(l_types, r_types), F.lit("left").alias(tag_col))
    rt = right.select(*pad(r_types, l_types), F.lit("right").alias(tag_col))
    return lt.unionByName(rt)
