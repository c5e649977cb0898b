"""Exact deduplication.

North-star extension (SURVEY.md §2.14). Exact dedup at 100 TB is a
hash-groupBy on a fingerprint: fingerprint each row JVM-side (md5 of
normalized content — cheap, reproducible cross-engine), then keep one
deterministic representative per group. One shuffle on the fingerprint;
partial aggregation makes the shuffle carry one row per (partition, key).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_3_2_hopsworks_spark.functions.text import fingerprint


def dedup_exact(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one arbitrary row per distinct combination of ``cols``
    (dropDuplicates — nondeterministic representative, cheapest)."""
    return df.dropDuplicates(cols)


def dedup_exact_keep_min(
    df: DataFrame, key: Column | str, id_col: str
) -> DataFrame:
    """Keep the row with the smallest ``id_col`` per ``key`` — deterministic
    representative selection (min_by under the hood)."""
    key_col = F.col(key) if isinstance(key, str) else key
    other = [c for c in df.columns if c != id_col]
    return (
        df.withColumn("_k", key_col)
        .groupBy("_k")
        .agg(F.min(F.struct(id_col, *other)).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in [id_col, *other]])
    )


def dedup_documents(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-normalization dedup for documents: fingerprint =
    md5(lowercased, whitespace-collapsed text); keep the lowest id per
    fingerprint and report the duplicate-group size."""
    fp = fingerprint(text_col)
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
