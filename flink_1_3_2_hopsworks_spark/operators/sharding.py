"""Deterministic corpus shuffle + sharding — training-data layout.

Not in the reference (north-star extension, SURVEY.md §2.14): the final
step of an LLM data pipeline lays the curated corpus out as N shard files
in a pseudo-random document order (so each training batch is an unbiased
corpus sample and restarts are reproducible). A true global sort by a
random key is a needless range-partition at 100 TB; the standard layout is
hash sharding plus a within-shard order:

  - shard  = portable_hash(key | salt) mod n_shards — a narrow map over
    the scan, no RNG state, any engine replays it;
  - order  = the full hash string within the shard — one shuffle keyed by
    shard, each shard sorts independently (pick n_shards so a shard fits
    a task; thousands at 100 TB). Together the (shard, pos) pair is a
    reproducible global shuffle: change ``salt`` to redraw the epoch.

Composes with ``functions.text.pack_sequences(shard_cols=["shard"])`` —
the shard is exactly the parallel packing unit it asks for.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def corpus_shuffle_shard(
    df: DataFrame,
    key_cols: Sequence[str],
    n_shards: int,
    salt: str = "sh42",
    min_shard_parallelism: int = 1,
) -> DataFrame:
    """Assign every row a reproducible ``(shard, pos)`` training position.

    Output = input columns + ``shard`` (0..n_shards-1) + ``pos`` (1-based
    within the shard, ordered by the salted md5 of the key — ties, which
    need an md5 collision, fall back to the key itself). Deterministic in
    (key, salt): the draw is the same portable salted-md5 scheme as the
    samplers in ``operators.sampling``.

    Parallelism contract: the per-shard ``row_number`` means within-shard
    parallelism IS ``n_shards`` — each shard is one (spillable) sorted
    task. Size ``n_shards`` to the cluster, not the data: thousands at
    100 TB, never a handful. The sort spills rather than OOMs, but a tiny
    ``n_shards`` on a huge corpus serializes the epoch behind a few tasks
    — ``min_shard_parallelism`` (default 1, i.e. off) raises when
    ``n_shards`` falls below it, as a deploy-time guard for pipelines
    that template this call."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_shards < min_shard_parallelism:
        raise ValueError(
            f"n_shards={n_shards} is below min_shard_parallelism="
            f"{min_shard_parallelism}: within-shard parallelism equals "
            "n_shards (one sorted task per shard) — size n_shards to the "
            "cluster (thousands at 100 TB)."
        )
    keys = [F.col(c).cast("string") for c in key_cols]
    h = F.md5(F.concat_ws("|", *keys, F.lit(salt)))
    h32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    w = Window.partitionBy("shard").orderBy(
        F.col("_h"), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (h32 % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )
