"""Portable approximate sketches for profiling at scale.

Spark's built-in approx_count_distinct (HLL++) and approx_percentile are
the production defaults, but their register layouts are engine-private —
no other system can replay them, so estimates are unauditable. These
sketches trade a little accuracy theory for full portability: every number
derives from md5 via exact integer/double ops, so DuckDB (the oracle), or
any engine, reproduces the estimate bit-for-bit.

- KMV (k-minimum-values) distinct sketch [Bar-Yossef et al. 2002]:
  est = (k−1) / u_k where u_k is the k-th smallest normalized hash.
  Distributed shape: hash → hash-aggregate distinct (partial map-side) →
  TakeOrderedAndProject (per-partition k-min, merged once) → one-row
  estimator. The full corpus never sorts; only k values leave a partition.

- Sampled percentiles: deterministic salted-hash Bernoulli sample (the
  portable draw shared by the samplers) + EXACT interpolated percentiles
  on the sample. The sample is replayable, so the sketch is auditable —
  the production answer to "approx_percentile said WHAT?".
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

FULL_32 = 1 << 32


def _h32(cols: Sequence[str], salt: str) -> Column:
    """First 32 bits of md5(cols|salt) as a bigint in [0, 2^32)."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", *[F.col(c).cast("string") for c in cols], F.lit(salt)
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def kmv_distinct(
    df: DataFrame, cols: Sequence[str], k: int = 256, salt: str = "kmv42"
) -> DataFrame:
    """One-row distinct-count estimate for the value tuple ``cols``:
    ``(k, n_sketch, kth_hash, est_distinct)``. When fewer than k distinct
    hashes exist the estimate IS the exact distinct count."""
    hashes = df.select(_h32(cols, salt).alias("_h")).distinct()
    sketch = hashes.orderBy("_h").limit(k)
    return sketch.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("_h").alias("kth_hash"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(float(FULL_32)) / F.max("_h")
            ),
            4,
        ).alias("est_distinct"),
    )


def sampled_percentiles(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
    fraction: float,
    percentiles: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    salt: str = "sp42",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact interpolated percentiles over a deterministic hash-sample of
    ``fraction`` of the rows (keyed by ``key_cols``). Any engine replays
    the identical sample, so the estimate is auditable."""
    threshold = int(fraction * FULL_32)
    sampled = df.filter(_h32(key_cols, salt) < threshold)
    aggs = [
        F.round(
            F.expr(f"percentile({value_col}, {p!r})"), 4
        ).alias(f"p{int(p * 100)}")
        for p in percentiles
    ]
    if group_cols:
        return sampled.groupBy(*group_cols).agg(*aggs)
    return sampled.agg(*aggs)


def cms_build(
    df: DataFrame,
    cols: Sequence[str],
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms42",
) -> DataFrame:
    """Count-min sketch [Cormode & Muthukrishnan 2005] of the value tuple
    ``cols``: ``(row, bucket, n)`` with ``depth × width`` counters — each
    input row increments one bucket per hash row. Distributed shape: one
    explode to depth rows + ONE hash-aggregate over a BOUNDED group domain
    (depth·width keys, map-side partials collapse everything), so the
    sketch costs a scan regardless of corpus size and MERGES by addition
    across partitions, days, or streams — the point of a CMS at 100 TB.
    Portable: buckets come from the salted-md5 draw, so any engine builds
    the identical sketch."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    F.pmod(_h32(cols, f"{salt}|{j}"), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for j in range(depth)
            ]
        )
    ).alias("_rb")
    return (
        df.select(rows)
        .select("_rb.row", "_rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    cols: Sequence[str],
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms42",
) -> DataFrame:
    """Point-frequency estimates for ``candidates`` (distinct value tuples
    carrying ``cols``): est = min over hash rows of the counter at the
    tuple's bucket — the classic one-sided estimator, NEVER below the true
    count (every counter the tuple hashes to includes all its increments;
    pytest-pinned). The sketch (≤ depth·width rows) broadcasts; candidate
    estimation is a narrow map + min-aggregate. Output: candidates'
    ``cols`` + ``est_n``."""
    probes = candidates.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.pmod(_h32(cols, f"{salt}|{j}"), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_rb"),
    ).select(*cols, F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*cols)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est_n"))
    )
