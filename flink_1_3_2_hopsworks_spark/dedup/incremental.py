"""Incremental corpus-ingestion dedup: new batch vs an existing corpus.

North-star extension (SURVEY.md §2.14). A continuously-updated training
corpus never re-dedups 100 TB per crawl; it dedups the NEW batch against
the existing fingerprint store, then within itself, and appends the
survivors. The scale-critical property is that the EXISTING store — the
100-TB side — is only ever SCANNED, never shuffled:

1. ``collisions`` = store fingerprints ∩ new-batch fingerprints, computed
   as a LEFT SEMI join with the (small) new-batch key set BROADCAST — the
   store streams map-side through a hash probe; parquet min/max or a
   Bloom pre-filter (operators/bloom.py) prune further on a real store.
2. The collision set is bounded by the new batch size, so it broadcasts
   BACK for the anti-join that drops already-seen new docs.
3. Within-batch dedup is a hash-groupBy on the fingerprint — one shuffle
   of the (small) batch only.

Both joins put the 100-TB relation on the streamed side of a broadcast
hash join; total shuffle volume is O(|new batch|), independent of store
size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.functions.text import fingerprint


def incremental_ingest(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Dedup a new document batch against an existing corpus and within
    itself. Output, one row per SURVIVING new document:
    ``(id_col, fp, batch_dups)`` — the deterministic representative
    (min id) of each new fingerprint group not already present in the
    corpus, with the within-batch duplicate count.

    ``corpus`` may be the raw document table (fingerprinted here) or a
    pre-computed store carrying a ``fp`` column.
    """
    if "fp" in corpus.columns:
        corpus_fp = corpus.select("fp")
    else:
        corpus_fp = corpus.select(fingerprint(text_col).alias("fp"))
    new_fp = new_docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    new_keys = new_fp.select("fp").distinct()
    # Store scan → map-side broadcast semi probe; result ⊆ new_keys, so the
    # post-semi distinct shuffles at most |new batch| rows.
    collisions = (
        corpus_fp.join(F.broadcast(new_keys), "fp", "left_semi").distinct()
    )
    survivors = new_fp.join(F.broadcast(collisions), "fp", "left_anti")
    return (
        survivors.groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("batch_dups"),
        )
        .select(id_col, "fp", "batch_dups")
    )
