"""Bloom-filter semi-join: scan-level pre-filtering for selective joins.

The 100-TB regime this serves: the dim side's key set is too large (or too
dynamic) to broadcast as an exact set, but its BITS fit anywhere — an
m-bit Bloom filter is m/8 bytes regardless of key count. The fact scan
drops non-joining rows BEFORE the shuffle; the actual join then removes
the false positives, so the RESULT is exactly the plain join (which is
what the oracle checks). Spark's AQE injects runtime bloom filters for
some shuffle joins (spark.sql.optimizer.runtime.bloomFilter.enabled); this
operator makes the pattern explicit, portable (md5-derived probe
positions — any engine builds the identical filter), and applicable where
the optimizer won't inject one (stream-static joins, pre-bucketed inputs).

Filter build: k probe positions per key → (word index, bit) → one
BIT_OR hash-aggregate over m/64 words → a collect of at most m/64 longs
(8 KiB at m=2^16 — the documented driver-side footprint, independent of
dim cardinality). Probe: pure codegen'd expression over a constant-folded
literal array; arithmetic shift semantics make bit 63 work on signed longs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _probe_positions(
    cols: Sequence[str], k: int, num_bits: int, salt: str
) -> list[Column]:
    """k md5-derived probe positions in [0, num_bits)."""
    out = []
    for i in range(k):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(c).cast("string") for c in cols],
                        F.lit(f"{salt}{i}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        out.append(h % num_bits)
    return out


def bloom_build(
    dim: DataFrame,
    key_cols: Sequence[str],
    num_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bf42",
) -> list[int]:
    """Build the filter: list of num_bits/64 longs (driver-side, 8 KiB at
    the default m — bounded by m, NOT by dim cardinality)."""
    num_words = (num_bits + 63) // 64
    pos = _probe_positions(key_cols, k, num_bits, salt)
    bits = (
        dim.select(
            F.explode(F.array(*pos)).alias("_pos")
        )
        .select(
            (F.col("_pos") / 64).cast("int").alias("_idx"),
            # shiftleft by a COLUMN is SQL-only (the python wrapper takes a
            # literal int), hence the expr.
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("_idx")
        .agg(F.expr("bit_or(_bit)").alias("_word"))
        .collect()
    )
    words = [0] * num_words
    for r in bits:
        words[r["_idx"]] = r["_word"]
    return words


def bloom_filter_rows(
    df: DataFrame,
    key_cols: Sequence[str],
    words: list[int],
    num_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bf42",
) -> DataFrame:
    """Keep only rows that MIGHT be in the filter: AND over the k probe
    bits (no false negatives; false positives are removed by the caller's
    subsequent join). Pure codegen'd expressions over a constant-folded
    literal array — a narrow map over the scan."""
    lit_words = F.array(*[F.lit(w) for w in words])  # constant-folded
    out = df.withColumn("_bf_words", lit_words)
    probes = _probe_positions(key_cols, k, num_bits, salt)
    cond = F.lit(True)
    for i, pos in enumerate(probes):
        out = out.withColumn(f"_bf_p{i}", pos)
        # shiftright by a COLUMN is SQL-only; arithmetic shift keeps bit 63
        # correct on signed longs ((w >> 63) & 1 reads the sign bit).
        bit = F.expr(
            f"shiftright(element_at(_bf_words, CAST(_bf_p{i} / 64 AS INT) + 1),"
            f" CAST(_bf_p{i} % 64 AS INT)) & CAST(1 AS BIGINT)"
        )
        cond = cond & (bit == 1)
    return out.filter(cond).drop(
        "_bf_words", *[f"_bf_p{i}" for i in range(len(probes))]
    )


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    num_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bf42",
) -> DataFrame:
    """Plain ``fact JOIN dim ON keys`` with a Bloom pre-filter on the fact
    scan: non-joining fact rows never reach the shuffle. Result ≡ the
    plain join (false positives fall out of the real join)."""
    words = bloom_build(dim, keys, num_bits, k, salt)
    pre = bloom_filter_rows(fact, keys, words, num_bits, k, salt)
    return pre.join(dim, list(keys), how)
