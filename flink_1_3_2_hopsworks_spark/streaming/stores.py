"""Key-bucketed layout for the epoch-partitioned dedup/ANN stores.

The r9/r10 ingest loops read their store as ``batch_id < N`` — correct
and slim, but probe I/O grows linearly with corpus LIFETIME regardless of
batch size: a 1k-item crawl increment against a year of epochs scans
every epoch's full store. The fix is the same trick the IVF code store
already uses with ``_cell``: bucket each epoch's partition by the PROBE
KEY, so a small batch's broadcast probe reaches the scan as
``PartitionFilters`` and skips every file whose bucket the batch does not
touch — probe I/O becomes O(batch buckets / total buckets) of the store
instead of all of it.

Soundness: pruning a store scan by key-hash bucket is only valid when the
probe joins on EQUALITY of that exact key (equal keys hash to the same
bucket, so no match can live in a skipped file). That holds for the
fingerprint stores (probe key ``_fp`` / ``simhash``). Band-bucket and
chunk probes prune via their own materialized key columns (the posting
layouts in dedup/incremental.py and dedup/simhash.py).

The bucket list is COLLECTED from the batch (bounded by ``n_buckets``
distinct values by construction — never by batch size) because partition
pruning needs literal predicates; a join cannot prune files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

N_KEY_BUCKETS = 64


def key_bucket(*cols: Column, n_buckets: int = N_KEY_BUCKETS) -> Column:
    """The store bucket of a probe key (single- or multi-column):
    pmod(xxhash64(key...), n_buckets)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")


def _key_cols(key) -> list:
    names = [key] if isinstance(key, str) else list(key)
    return [F.col(n) for n in names]


def write_bucketed_partition(
    df: DataFrame,
    store_path: str,
    batch_id: int,
    key,
    legacy_flat: bool = False,
    n_buckets: int = N_KEY_BUCKETS,
) -> None:
    """Overwrite ``store_path/batch_id=<batch_id>`` with ``df`` bucketed
    by ``_kb = key_bucket(key...)`` (hive-partitioned inside the epoch
    dir; ``key`` is a column name or a list of them).
    ``legacy_flat=True`` preserves a pre-r11 store's flat layout — parquet
    partition discovery rejects mixed directory depths, so a store is
    either uniformly bucketed (new) or uniformly flat (legacy)."""
    target = f"{store_path}/batch_id={batch_id}"
    if legacy_flat:
        df.write.mode("overwrite").parquet(target)
        return
    # Repartition ON the bucket before the partitioned write: without it
    # every upstream task writes a file into every bucket dir it touches
    # (tasks × buckets tiny files per epoch — measured 2.5x slower epoch
    # loops at sf0.1). One O(batch) shuffle → one file per bucket.
    df.withColumn(
        "_kb", key_bucket(*_key_cols(key), n_buckets=n_buckets)
    ).repartition(n_buckets, F.col("_kb")).write.mode(
        "overwrite"
    ).partitionBy("_kb").parquet(target)


def prune_store_by_key(
    store: DataFrame,
    probe: DataFrame,
    key,
    n_buckets: int = N_KEY_BUCKETS,
) -> DataFrame:
    """Restrict a ``_kb``-bucketed store scan to the probe's key buckets
    (PartitionFilters — files in untouched buckets are never opened). A
    legacy flat store (no ``_kb`` column) passes through unpruned.
    ``key`` is a column name or a list of them, present in BOTH frames
    with identical semantics. The collect is bounded by ``n_buckets``
    rows by construction."""
    if "_kb" not in store.columns:
        return store
    buckets = [
        r[0]
        for r in probe.select(
            key_bucket(*_key_cols(key), n_buckets=n_buckets).alias("_kb")
        )
        .distinct()
        .collect()
    ]
    return store.filter(F.col("_kb").isin(buckets))
