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
    # An EMPTY frame under dynamic partitionBy writes only _SUCCESS — no
    # data file carries the schema, so a store whose FIRST epoch has zero
    # survivors (or any empty micro-batch) would make the next epoch's
    # whole-store read fail with UNABLE_TO_INFER_SCHEMA (not the
    # missing-path condition the loops treat as "no store yet") and crash
    # the stream permanently. Flat writes never had this hole (an empty
    # flat write emits one schema-bearing empty file). Restore that
    # invariant at the same directory DEPTH: when no bucket directory
    # landed, write one empty schema-bearing file under ``_kb=0`` —
    # driver-side metadata listing only, no extra job on the data path.
    if not _has_bucket_dirs(df.sparkSession, target):
        df.drop("_kb").limit(0).write.mode("overwrite").parquet(
            f"{target}/_kb=0"
        )


def _fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def count_store_files(spark, store_path: str) -> int:
    """Number of DATA files under ``store_path`` (recursive; ``_``/``.``
    names skipped) — the quantity partition discovery has to LIST on
    every store read, which otherwise grows with crawl lifetime
    (~epochs × buckets). Driver-side namenode walk, no Spark job."""
    fs, root = _fs(spark, store_path)
    if not fs.exists(root):
        return 0
    n = 0
    stack = [root]
    while stack:
        for st in fs.listStatus(stack.pop()):
            name = st.getPath().getName()
            # Spark's own discovery rule: _/. names are invisible UNLESS
            # they are partition dirs (contain '='$) — _kb=3 counts.
            if name.startswith(("_", ".")) and "=" not in name:
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                n += 1
    return n


def compaction_due(batch_id: int, compact_every) -> bool:
    """True when a crawl loop configured with ``compact_every=N`` should
    compact epochs ``[*, batch_id)`` at the START of epoch ``batch_id``.
    Epochs below the current one are checkpoint-committed (foreachBatch
    replays at most the current epoch), so the compact_store watermark
    contract holds; a replayed epoch re-runs the same compaction, which
    is idempotent (recover + no-op on an already-consolidated store)."""
    return (
        bool(compact_every) and batch_id > 0
        and batch_id % compact_every == 0
    )


_COMPACT_MANIFEST = "_compact_manifest.json"


def _write_compact_manifest(spark, store_path: str, todo: list) -> None:
    """Atomically record the epoch set an in-flight compaction is about
    to delete: create ``_compact_manifest.json.tmp`` then rename — a
    crash mid-write can never leave a readable-but-partial manifest, so
    manifest-exists ⇒ the consolidated tmp base is complete."""
    import json

    fs, _ = _fs(spark, store_path)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{store_path}/{_COMPACT_MANIFEST}.tmp"
    )
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps({"todo": todo}).encode("utf-8")))
    out.close()
    fs.rename(
        tmp, jvm.org.apache.hadoop.fs.Path(f"{store_path}/{_COMPACT_MANIFEST}")
    )


def recover_compaction(spark, store_path: str) -> dict | None:
    """Finish an interrupted :func:`compact_store` run, idempotently.

    The manifest is written only AFTER the consolidated base is fully
    under ``_compact_tmp/batch_id=-1``, so its presence means the data is
    safe and only the deletes/rename may be partial. Recovery replays
    them: delete every manifest epoch still present (skipping ``-1`` when
    the tmp base is already gone — that means the rename landed and the
    current ``batch_id=-1`` IS the new base), rename the tmp base in if
    it still exists, and clear the tmp root + manifest. Returns the
    recovered manifest dict, or ``None`` when there was nothing to
    recover (the overwhelmingly common case — one existence check).

    Called automatically at the start of every ``compact_store``; safe to
    call directly after a crash before any store read."""
    import json

    fs, _ = _fs(spark, store_path)
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    man = P(f"{store_path}/{_COMPACT_MANIFEST}")
    # A crash between creating and renaming the .tmp manifest leaves only
    # the .tmp: the deletes never started, the store is intact — discard.
    man_tmp = P(f"{store_path}/{_COMPACT_MANIFEST}.tmp")
    if fs.exists(man_tmp):
        fs.delete(man_tmp, False)
    if not fs.exists(man):
        return None
    inp = fs.open(man)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(inp, "UTF-8")
    finally:
        inp.close()
    manifest = json.loads(raw)
    tmp_base = P(f"{store_path}/_compact_tmp/batch_id=-1")
    tmp_exists = fs.exists(tmp_base)
    for e in manifest["todo"]:
        if e == -1 and not tmp_exists:
            # rename already landed: batch_id=-1 is the NEW base
            continue
        p = P(f"{store_path}/batch_id={e}")
        if fs.exists(p):
            fs.delete(p, True)
    if tmp_exists:
        fs.rename(tmp_base, P(f"{store_path}/batch_id=-1"))
    fs.delete(P(f"{store_path}/_compact_tmp"), True)
    fs.delete(man, False)
    return manifest


def compact_store(
    spark,
    store_path: str,
    key,
    before_batch_id: int,
    n_buckets: int = N_KEY_BUCKETS,
    inner_col: str = "_kb",
    writer=None,
) -> dict:
    """OFFLINE compaction of an epoch-partitioned store: rewrite every
    epoch ``batch_id < before_batch_id`` into ONE consolidated
    key-bucketed base partition under the reserved ``batch_id=-1`` —
    the crawl-lifetime lever the per-epoch layout cannot provide. Probe
    I/O is already lifetime-bounded by bucket pruning, but FILE COUNT
    (and with it partition discovery/listing cost on every store read)
    grows ~epochs × buckets; compaction resets it to ≤ ``n_buckets``
    files for the whole compacted history. Also the legacy-migration
    path: a pre-r11 FLAT store comes out uniformly key-bucketed (row
    layout unchanged — only the directory layout upgrades), after which
    the ingest loops' probes prune it like any r11 store.

    Correctness contract (the caller's side):
    - ``before_batch_id`` must not exceed the stream's COMMITTED
      watermark: the base partition is visible to every epoch (reads
      filter ``batch_id < N`` and −1 < N), so folding a not-yet-committed
      epoch into it would let that epoch's crash replay see its own
      append and drop every document as a corpus dup.
    - A FLAT store must be compacted in full (every epoch <
      ``before_batch_id``): a bucketed base next to remaining flat
      epochs would mix directory depths, which partition discovery
      rejects. Raises otherwise.
    - Verdict equivalence is exact: reads only ever filter
      ``batch_id < N``, and every compacted row keeps its columns —
      only its epoch attribution collapses to −1 (pytest-pinned against
      a live ingest loop).

    Crash-safe (write-ahead manifest): the consolidated base is fully
    written under ``<store>/_compact_tmp`` (invisible to readers —
    ``_``-prefixed), then ``<store>/_compact_manifest.json`` records the
    epoch list about to be deleted (atomic create-then-rename), and only
    then do the deletes + final rename run. A crash anywhere leaves one
    of two states: no manifest → the store is untouched (a half-written
    tmp is simply overwritten next time); manifest present → the base is
    complete, and :func:`recover_compaction` (run automatically at the
    next ``compact_store`` call on the same path, or callable directly)
    finishes the deletes/rename idempotently. This is what lets the
    ingest loops run compaction INSIDE a replayable foreachBatch epoch
    (``compact_every``) without a crash window.

    Returns ``{"epochs_compacted", "rows", "files_before",
    "files_after"}``.
    """
    recover_compaction(spark, store_path)
    store = spark.read.parquet(store_path)
    if "batch_id" not in store.columns:
        raise ValueError(
            f"store at {store_path!r} is not epoch-partitioned (no "
            "batch_id partition column) — nothing to compact."
        )
    # ``inner_col`` names the store family's inner partition column
    # (``_kb`` for the key-bucketed dedup stores, ``_cell`` for the ANN
    # code stores) — its absence marks a legacy FLAT store, which must
    # compact in full (mixed directory depths are rejected by parquet
    # partition discovery).
    flat = inner_col not in store.columns
    fs, root = _fs(spark, store_path)
    epochs = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(root)
        if st.isDirectory()
        and st.getPath().getName().startswith("batch_id=")
    )
    todo = [e for e in epochs if e < before_batch_id]
    if flat and len(todo) < len(epochs):
        raise ValueError(
            f"flat store at {store_path!r} must be compacted in full: "
            f"epochs {sorted(set(epochs) - set(todo))} are >= "
            f"before_batch_id={before_batch_id}, and a bucketed base "
            "next to flat epochs mixes directory depths (partition "
            "discovery rejects the whole store)."
        )
    files_before = count_store_files(spark, store_path)
    if len(todo) < 2 and not flat:
        # nothing to consolidate (0 or 1 bucketed epochs) — no-op
        return {
            "epochs_compacted": 0, "rows": 0,
            "files_before": files_before, "files_after": files_before,
        }
    base = store.filter(F.col("batch_id") < before_batch_id).drop(
        "batch_id"
    )
    tmp_root = f"{store_path}/_compact_tmp"
    if writer is not None:
        # store families with their own inner layout (e.g. the ANN code
        # stores' ``_cell``) write the consolidated base themselves; the
        # base keeps ``inner_col`` as a regular column (the writer
        # re-partitions on it) and the writer MUST land the result under
        # ``<tmp_root>/batch_id=-1`` at the store's regular depth.
        writer(base, tmp_root)
    else:
        write_bucketed_partition(
            base.drop(inner_col), tmp_root, -1, key, n_buckets=n_buckets
        )
    rows = spark.read.parquet(f"{tmp_root}/batch_id=-1").count()
    jvm = spark._jvm
    # Point of no return: the manifest commits the delete set AFTER the
    # base is fully written — from here a crash recovers forward.
    _write_compact_manifest(spark, store_path, todo)
    for e in todo:
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            f"{store_path}/batch_id={e}"
        ), True)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(f"{tmp_root}/batch_id=-1"),
        jvm.org.apache.hadoop.fs.Path(f"{store_path}/batch_id=-1"),
    )
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp_root), True)
    fs.delete(
        jvm.org.apache.hadoop.fs.Path(f"{store_path}/{_COMPACT_MANIFEST}"),
        False,
    )
    return {
        "epochs_compacted": len(todo), "rows": rows,
        "files_before": files_before,
        "files_after": count_store_files(spark, store_path),
    }


def store_layout_is_flat(spark, store_path: str) -> bool:
    """True when an EXISTING store at ``store_path`` was written in the
    pre-r11 flat layout (no ``_kb`` partition column). The seed functions
    use this to preserve a legacy store's layout when re-seeding
    ``batch_id=-1`` into it — mixing a bucketed seed partition into a
    flat store (or vice versa) gives parquet partition discovery mixed
    directory depths and breaks every later read of the WHOLE store. A
    missing store reads as not-flat: fresh stores take the bucketed
    layout. Any error other than the missing-path condition propagates
    (same rationale as ``_is_path_not_found``)."""
    from pyspark.errors import AnalysisException

    from flink_1_3_2_hopsworks_spark.streaming.neardup import (
        _is_path_not_found,
    )

    try:
        store = spark.read.parquet(store_path)
    except AnalysisException as e:
        if _is_path_not_found(e):
            return False
        raise
    return "_kb" not in store.columns


def _has_bucket_dirs(spark, target: str) -> bool:
    """True when ``target`` contains at least one ``_kb=<n>`` partition
    directory — a pure namenode listing (no Spark job)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(target)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    return any(
        st.isDirectory() and st.getPath().getName().startswith("_kb=")
        for st in fs.listStatus(path)
    )


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
