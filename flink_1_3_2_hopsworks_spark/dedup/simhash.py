"""SimHash near-duplicate detection.

North-star extension (SURVEY.md §2.14). 64-bit Charikar simhash: each token
hashes to 64 bits; each bit position accumulates +1/-1 across tokens; the
sign vector is the fingerprint. Near-duplicates have small Hamming distance.

Implementation: the bit-majority accumulation is genuinely awkward as a SQL
expression (64 per-bit aggregates per row), so this is one of the few
deliberate Pandas-UDF operators — Arrow-batched, numpy-vectorized inside,
still a narrow map (no shuffle). Candidate pairing blocks on 4 16-bit
fingerprint chunks (any pair within Hamming distance 3 shares at least one
chunk — pigeonhole), then verifies exact Hamming distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_MASK64 = (1 << 64) - 1


def _token_hash(token: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a — stable across workers,
    unlike Python's salted hash())."""
    h = 0xCBF29CE484222325
    for byte in token.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & _MASK64
    return h


def simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized simhash of a text series → int64 series (bit 63 used as
    sign bit; stored as signed int64)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        tokens = (text or "").lower().split()
        if not tokens:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for tok in tokens:
            h = np.uint64(_token_hash(tok))
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += bits * 2 - 1
        fp = 0
        for b in range(64):
            if acc[b] > 0:
                fp |= 1 << b
        out[i] = np.int64(fp - (1 << 64) if fp >= (1 << 63) else fp)
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    # UDF created lazily: module-level pandas_udf would re-run on executors
    # at unpickle time, where no SparkSession exists.
    simhash_udf = F.pandas_udf(simhash64, "long")
    return df.withColumn(out_col, simhash_udf(F.col(text_col)))


def _chunk(col: Column, i: int) -> Column:
    """16-bit chunk i of a 64-bit signed fingerprint."""
    return F.shiftrightunsigned(col, i * 16).bitwiseAND(F.lit(0xFFFF))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
) -> DataFrame:
    """Pairs (id_a < id_b) with simhash Hamming distance <= max_distance.

    Scale path: 4-chunk blocking turns the quadratic pair space into
    per-chunk-value buckets (one shuffle per chunk via union+groupBy-free
    join); verification is an integer XOR popcount.
    """
    fps = with_simhash(df.select(F.col(id_col).alias("_id"), text_col), text_col)
    chunked = fps.select(
        "_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("ci"), _chunk(F.col("simhash"), i).alias("cv"))
                for i in range(4)
            ])
        ).alias("_c"),
    ).select("_id", "simhash", F.col("_c.ci").alias("ci"), F.col("_c.cv").alias("cv"))

    left = chunked.select("ci", "cv", F.col("_id").alias("id_a"), F.col("simhash").alias("fp_a"))
    right = chunked.select("ci", "cv", F.col("_id").alias("id_b"), F.col("simhash").alias("fp_b"))
    return (
        left.join(right, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )
