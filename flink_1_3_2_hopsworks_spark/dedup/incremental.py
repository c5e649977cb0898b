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

# Signature stores stamp their hash-family parameters into a marker column
# name (schema-only check — no data read): _mh_params_k{shingle_k}_n{num_
# hashes}_p{0|1}. incremental_near_ingest refuses a store whose stamp
# disagrees with the call's parameters.
_STAMP_PREFIX = "_mh_params_"
_KEYS_STAMP_PREFIX = "_mh_keys_"


def _store_stamp(shingle_k: int, num_hashes: int, portable: bool) -> str:
    return f"{_STAMP_PREFIX}k{shingle_k}_n{num_hashes}_p{int(portable)}"


def _keys_stamp(
    shingle_k: int, num_hashes: int, bands: int, portable: bool
) -> str:
    # A keys store FIXES the banding (unlike the signature store, which
    # serves any banding), so the stamp carries it.
    return (
        f"{_KEYS_STAMP_PREFIX}k{shingle_k}_n{num_hashes}"
        f"_b{bands}_p{int(portable)}"
    )


def banded_bucket_keys(
    sig: DataFrame, num_hashes: int, bands: int, portable: bool
) -> DataFrame:
    """``(_id, _h0.._h{n-1}, _band, _bucket)`` — one row per (doc, band):
    the LSH band bucket keys derived from a signature frame (``_id`` +
    ``_h*`` columns). THE single derivation shared by the probe path and
    the posting-key store writer, so store keys and probe keys can never
    drift."""
    rows = num_hashes // bands
    sig_cols = [f"_h{i}" for i in range(num_hashes)]
    if portable:
        keys = [
            F.concat_ws(
                "|", *[F.col(f"_h{b * rows + r}") for r in range(rows)]
            ).cast("string").alias(f"_k{b}")
            for b in range(bands)
        ]
    else:
        keys = [
            F.xxhash64(
                *[F.col(f"_h{b * rows + r}") for r in range(rows)]
            ).cast("string").alias(f"_k{b}")
            for b in range(bands)
        ]
    wide = sig.select("_id", *sig_cols, *[k for k in keys])
    return wide.select(
        "_id",
        *sig_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("_band"),
                        F.col(f"_k{b}").alias("_bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select("_id", *sig_cols, "_bb._band", "_bb._bucket")


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


def incremental_near_ingest(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
    portable: bool = False,
    broadcast_batch: bool = True,
    batch_signatures: DataFrame | None = None,
    corpus_keys: DataFrame | None = None,
    materialize_probe: bool = True,
) -> DataFrame:
    """NEAR-duplicate ingestion dedup: drop new docs that are fuzzy dups of
    the existing corpus, then fuzzy-dedup the batch within itself.

    **EAGER by default** (same contract note as ``write_zordered``'s bounds
    job): with ``materialize_probe=True`` this call RUNS the corpus-probe
    sub-job at plan-build time — the probe's duplicate-id frame is pinned
    via ``localCheckpoint`` because the survivor frame derived from it
    fans out into the within-batch star, cluster resolution, AND the
    verdict join; unpinned, every one of those references re-executed the
    whole corpus probe (measured 4-5× re-runs, 37 s of a 46 s epoch at
    gate scale). The pinned blocks are slim (ids only, bounded by the
    batch) and live until the driver drops its last reference to the
    returned frame — Spark's ContextCleaner then unpersists them on GC,
    so a long crawl loop that discards each epoch's verdict frame stays
    bounded (pinned by tests/test_streaming_neardup.py's many-epoch
    replay). Pass ``materialize_probe=False`` for a fully-lazy plan:
    correct for a caller that triggers exactly ONE action on the result
    (and for plan audits — the probe subtree, including its broadcast
    exchange, stays visible in the returned plan), but every extra
    action re-pays the probe.

    One verdict row per new document: ``(id_col, kept, reason)`` with
    ``reason`` ∈ {'kept', 'corpus_near_dup', 'batch_near_dup'} — a new doc
    is dropped when the MinHash estimator puts it within ``threshold`` of
    any corpus doc sharing an LSH band bucket, else clustered within the
    batch (star edges → connected components, min id survives).

    Scale shape (the whole point — the corpus NEVER self-joins): corpus
    signatures/bucket keys stream straight out of the scan projection into
    ONE probe join against the batch's bucket keys, which are BROADCAST
    (bounded by the batch); the estimator verifies inline on the join
    output, so corpus-side work is a scan plus a map-side hash probe —
    on a real store the banded keys are precomputed at append time and
    this reads them back instead of re-shingling. Oversized corpus buckets
    (> ``max_bucket``) are excluded exactly like minhash_near_dups caps
    its pair expansion; the within-batch step is the linear star
    reduction. Only the batch ever shuffles.

    The broadcast side costs ~``batch_rows × bands × (num_hashes+2) × 8``
    bytes on every executor — right for the intended small crawl
    increment. For an unusually large batch (beyond a few hundred MB of
    signatures), pass ``broadcast_batch=False``: the probe becomes a
    shuffled hash join, correctness unchanged, the corpus pays its one
    bucket-keyed shuffle.

    ``batch_signatures`` (optional) supplies the new batch's PRE-COMPUTED
    signature frame (:func:`minhash_signature_store` output, typically
    persisted by the caller). With it, the text is never shingled here at
    all — the corpus probe AND the within-batch star both project the
    supplied signatures — so an ingest loop that also appends survivor
    signatures to its store computes the epoch's signatures exactly ONCE:
    ``sig = minhash_signature_store(batch).persist(); verdicts =
    incremental_near_ingest(..., batch_signatures=sig); append
    sig ⋉ survivor_ids``. Same hash-family stamp rules as a signature
    store (mismatch raises).

    ``corpus_keys`` (optional) supplies the corpus's POSTING-KEY store
    (:func:`minhash_key_store` output: one ``(id, _band, _bucket)`` row
    per stored (doc, band), typically key-bucketed on disk by
    ``_kb = pmod(xxhash64(_band, _bucket), 64)``). With it, the probe
    reads the slim keys table PRUNED to the batch's bucket set
    (PartitionFilters — probe I/O stops growing with corpus lifetime),
    joins candidates, and fetches ONLY the candidate ids' signatures
    from ``corpus`` for the estimator verify (pruned again by id bucket
    when the signature store carries ``_kb``). Verdicts are identical to
    the store-only path: bucket caps computed on the pruned keys are
    exact for every PROBED bucket (all rows of a bucket share its
    ``_kb``), and unprobed buckets never join. The keys store must match
    this call's hash family AND banding (its stamp carries both;
    mismatch raises).
    """
    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        _shingles,
        _signatures,
        minhash_star_edges,
    )
    from flink_1_3_2_hopsworks_spark.dedup.neardup import (
        resolve_duplicate_clusters,
    )

    sig_cols = [f"_h{i}" for i in range(num_hashes)]
    expected_stamp = _store_stamp(shingle_k, num_hashes, portable)

    def _sig(docs: DataFrame) -> DataFrame:
        # A frame that already carries the signature columns (a persisted
        # store written by minhash_signature_store) skips re-shingling —
        # the production append-time contract. Stores written since r7
        # carry a parameter-stamp column; a stamp that disagrees with this
        # call's hash family raises instead of silently reading as "no
        # duplicates" (signatures from different families never agree).
        stamps = [c for c in docs.columns if c.startswith(_STAMP_PREFIX)]
        if stamps and stamps != [expected_stamp]:
            raise ValueError(
                "signature store was built with a different hash family: "
                f"store stamp(s) {stamps}, this ingest expects "
                f"{expected_stamp!r} (shingle_k={shingle_k}, "
                f"num_hashes={num_hashes}, portable={portable}) — "
                "mismatched families silently read as 'no duplicates'."
            )
        if set(sig_cols) <= set(docs.columns):
            return docs.select(F.col(id_col).alias("_id"), *sig_cols)
        return _signatures(
            _shingles(docs, id_col, text_col, shingle_k), num_hashes, portable
        )

    batch_sig = _sig(
        new_docs if batch_signatures is None else batch_signatures
    )
    # Text-derived batch signatures are referenced by the probe AND the
    # within-batch star below; in the EAGER path pin them once (slim:
    # batch × num_hashes ids+ints) so the shingle+hash pass runs once,
    # not once per consumer. Lazy path keeps the plan untouched (audits).
    batch_sig_pinned = False
    if materialize_probe and batch_signatures is None:
        from flink_1_3_2_hopsworks_spark.operators.iterate import materialize

        batch_sig = materialize(batch_sig)
        batch_sig_pinned = True
    batch_b = banded_bucket_keys(batch_sig, num_hashes, bands, portable)

    agree = sum(
        F.when(F.col(f"_c{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = agree / F.lit(float(num_hashes))
    jac = est if portable else F.round(est, 4)
    batch_side = batch_b.select(
        "_band", "_bucket", F.col("_id").alias("_bid"),
        *[F.col(c).alias(f"_b{i}") for i, c in enumerate(sig_cols)],
    )
    corpus_sig_cached = None
    if corpus_keys is None:
        corpus_sig = _sig(corpus)
        # The corpus-signature subtree feeds TWO consumers — the
        # oversized-bucket aggregate and the capped probe side — and
        # Spark shares nothing between them, so an un-pinned text-derived
        # corpus paid the md5 shingle+hash pass TWICE per probe (measured
        # ~2× the one-pass cost at gate scale). In the EAGER path the
        # probe runs inside this call, so a persist is strictly scoped:
        # cache → materialize(probe) → unpersist below. Store-backed
        # corpora (signature columns present) skip the cache — their
        # second consumer is just a second slim parquet scan.
        if materialize_probe and not set(sig_cols) <= set(corpus.columns):
            corpus_sig_cached = corpus_sig.persist()
            corpus_sig = corpus_sig_cached
        corpus_b = banded_bucket_keys(corpus_sig, num_hashes, bands, portable)
        # Cap degenerate corpus buckets (a store would drop these keys at
        # append time) — hash-aggregate + anti-join, same rationale as
        # minhash_near_dups.
        oversized = (
            corpus_b.groupBy("_band", "_bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("_band", "_bucket")
        )
        corpus_capped = corpus_b.join(
            oversized, ["_band", "_bucket"], "left_anti"
        )
        corpus_side = corpus_capped.select(
            "_band", "_bucket",
            *[F.col(c).alias(f"_c{i}") for i, c in enumerate(sig_cols)],
        )
        corpus_dup_ids = (
            corpus_side.join(
                F.broadcast(batch_side) if broadcast_batch else batch_side,
                ["_band", "_bucket"],
            )
            .filter(jac >= threshold)
            .select(F.col("_bid").alias(id_col))
            .distinct()
        )
    else:
        corpus_dup_ids = _keyed_corpus_dup_ids(
            corpus, corpus_keys, batch_side, id_col, jac, threshold,
            shingle_k, num_hashes, bands, max_bucket, portable,
            broadcast_batch, sig_cols, expected_stamp,
        )
    # MATERIALIZED (bounded by the batch — ids only): the survivor frame
    # below is referenced by the within-batch star, cluster resolution,
    # and the verdict join — unpinned, each reference re-ran the whole
    # corpus probe (store scan + broadcast exchanges). EAGER: see the
    # docstring's contract note; materialize_probe=False keeps the probe
    # subtree lazy (single-action callers, plan audits).
    if materialize_probe:
        from flink_1_3_2_hopsworks_spark.operators.iterate import materialize

        corpus_dup_ids = materialize(corpus_dup_ids)
        if corpus_sig_cached is not None:
            # Probe executed above — the scoped corpus-signature cache has
            # served both consumers; release it before returning.
            corpus_sig_cached.unpersist()

    survivors = new_docs.join(
        corpus_dup_ids.withColumnRenamed(id_col, "_drop"),
        F.col(id_col) == F.col("_drop"),
        "left_anti",
    )
    edges = minhash_star_edges(
        survivors, id_col, text_col, threshold=threshold,
        shingle_k=shingle_k, num_hashes=num_hashes, bands=bands,
        max_bucket=max_bucket, portable=portable,
        # Geometry recall is this composition's own documented trade; the
        # corpus-probe step above shares it, so one warning would fire
        # per ingest on every default call — accuracy is gate-measured.
        recall_floor=None,
        # With pre-computed signatures, restrict them to the corpus-stage
        # survivors by id semi-join (signatures are per-doc independent —
        # star_edges' documented id_filter equivalence) instead of
        # re-shingling the survivor text. The EAGER path reuses its own
        # pinned batch signatures the same way — the epoch's text is
        # shingled exactly once.
        signatures=(
            batch_sig if batch_sig_pinned and batch_signatures is None
            else batch_signatures
        ),
        id_filter=(
            None
            if batch_signatures is None and not batch_sig_pinned
            else survivors.select(id_col)
        ),
    )
    clustered = resolve_duplicate_clusters(survivors, edges, id_col)

    verdict = new_docs.select(id_col).join(
        clustered.select(id_col, "kept"), id_col, "left"
    )
    return verdict.select(
        id_col,
        F.coalesce(F.col("kept"), F.lit(False)).alias("kept"),
        F.when(F.col("kept").isNull(), F.lit("corpus_near_dup"))
        .when(F.col("kept"), F.lit("kept"))
        .otherwise(F.lit("batch_near_dup"))
        .alias("reason"),
    )


def _keyed_corpus_dup_ids(
    corpus: DataFrame,
    corpus_keys: DataFrame,
    batch_side: DataFrame,
    id_col: str,
    jac,
    threshold: float,
    shingle_k: int,
    num_hashes: int,
    bands: int,
    max_bucket: int,
    portable: bool,
    broadcast_batch: bool,
    sig_cols: list[str],
    expected_stamp: str,
) -> DataFrame:
    """The posting-key probe path of :func:`incremental_near_ingest` —
    batch ids that are near-dups of the stored corpus, computed WITHOUT a
    full signature-store scan:

    1. the slim keys table is pruned to the batch's (band, bucket)
       bucket-hash set (PartitionFilters when ``_kb``-bucketed on disk);
    2. probed-bucket caps + the candidate join against the broadcast
       batch keys give the bounded (corpus id, batch id) candidate set,
       MATERIALIZED (it is referenced by the id-bucket collect and the
       verify join — slim ids only, bounded by batch × max_bucket);
    3. only the candidates' signatures are fetched from the store
       (pruned by id bucket when the store carries ``_kb``) and verified
       against the broadcast batch signatures.
    """
    from flink_1_3_2_hopsworks_spark.operators.iterate import materialize
    from flink_1_3_2_hopsworks_spark.streaming.stores import (
        key_bucket,
        prune_store_by_key,
    )

    kstamps = [
        c for c in corpus_keys.columns if c.startswith(_KEYS_STAMP_PREFIX)
    ]
    expected_keys = _keys_stamp(shingle_k, num_hashes, bands, portable)
    if kstamps and kstamps != [expected_keys]:
        raise ValueError(
            "posting-key store was built with a different hash family or "
            f"banding: store stamp(s) {kstamps}, this ingest expects "
            f"{expected_keys!r} — mismatched keys silently read as 'no "
            "duplicates'."
        )
    for c in ("_band", "_bucket"):
        if c not in corpus_keys.columns:
            raise ValueError(
                f"posting-key store has no {c!r} column — keys stores are "
                "written from minhash_key_store(...) output."
            )
    if not set(sig_cols) <= set(corpus.columns):
        raise ValueError(
            "the posting-key probe needs a SIGNATURE-STORE corpus "
            "(id + _h* columns) to fetch candidate signatures from — got "
            f"columns {corpus.columns}."
        )
    stamps = [c for c in corpus.columns if c.startswith(_STAMP_PREFIX)]
    if stamps and stamps != [expected_stamp]:
        raise ValueError(
            "signature store was built with a different hash family: "
            f"store stamp(s) {stamps}, this ingest expects "
            f"{expected_stamp!r}."
        )

    keys = prune_store_by_key(
        corpus_keys.select(
            F.col(id_col).alias("_cid"), "_band", "_bucket",
            *(["_kb"] if "_kb" in corpus_keys.columns else []),
        ),
        batch_side,
        ["_band", "_bucket"],
    )
    # Caps on the pruned keys are exact for every probed bucket: all rows
    # of a (band, bucket) share its _kb, and unprobed buckets never join.
    oversized = (
        keys.groupBy("_band", "_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select("_band", "_bucket")
    )
    keys_capped = keys.join(oversized, ["_band", "_bucket"], "left_anti")
    batch_keys = batch_side.select("_band", "_bucket", "_bid")
    cand = materialize(
        keys_capped.join(
            F.broadcast(batch_keys) if broadcast_batch else batch_keys,
            ["_band", "_bucket"],
        )
        .select("_cid", "_bid")
        .distinct()
    )

    store_sig = corpus
    if "_kb" in corpus.columns:
        ibs = [
            r[0]
            for r in cand.select(key_bucket(F.col("_cid")).alias("_kb"))
            .distinct()
            .collect()
        ]
        store_sig = store_sig.filter(F.col("_kb").isin(ibs))
    corp_sig = store_sig.select(
        F.col(id_col).alias("_cid"),
        *[F.col(c).alias(f"_c{i}") for i, c in enumerate(sig_cols)],
    ).join(F.broadcast(cand.select("_cid").distinct()), "_cid", "left_semi")
    batch_sigs = batch_side.select(
        "_bid", *[f"_b{i}" for i in range(len(sig_cols))]
    ).dropDuplicates(["_bid"])
    return (
        cand.join(corp_sig, "_cid")
        .join(F.broadcast(batch_sigs) if broadcast_batch else batch_sigs,
              "_bid")
        .filter(jac >= threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
    )


def minhash_key_store(
    signatures: DataFrame,
    id_col: str,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    portable: bool = False,
) -> DataFrame:
    """The POSTING-KEY half of the r11 store layout: one
    ``(id_col, _band, _bucket)`` row per (doc, band), derived from a
    :func:`minhash_signature_store` frame with the SAME banding algebra
    the probe uses (:func:`banded_bucket_keys`), plus a stamp column
    carrying hash family AND banding. Persist each epoch's keys next to
    the signature store (``<sig_store>_keys/batch_id=N``), bucketed by
    ``["_band", "_bucket"]`` via streaming/stores.write_bucketed_partition
    — a small batch's probe then prunes the keys scan to its own buckets
    instead of scanning every epoch, and the signature store is only
    touched for the candidates' ids (see incremental_near_ingest's
    ``corpus_keys``). A stamped ``signatures`` frame (any
    :func:`minhash_signature_store` output since r7) must agree with this
    call's ``shingle_k``/``num_hashes``/``portable`` — otherwise the keys
    store's OWN stamp would misrepresent the hash family its rows were
    derived from, and the keyed probe (which can only verify the keys
    stamp) would trust it and silently read the mismatched dimension as
    'no duplicates'. Same check as ``incremental_near_ingest``'s
    signature-frame guard; mismatch raises."""
    stamps = [c for c in signatures.columns if c.startswith(_STAMP_PREFIX)]
    expected = _store_stamp(shingle_k, num_hashes, portable)
    if stamps and stamps != [expected]:
        raise ValueError(
            "signatures frame was built with a different hash family: "
            f"frame stamp(s) {stamps}, this keys derivation was told "
            f"{expected!r} (shingle_k={shingle_k}, num_hashes={num_hashes},"
            f" portable={portable}) — a keys store stamped from mismatched "
            "arguments would misrepresent its hash family and the keyed "
            "probe would silently read it as 'no duplicates'."
        )
    src = "_id" if "_id" in signatures.columns else id_col
    sig = signatures.select(
        F.col(src).alias("_id"), *[f"_h{i}" for i in range(num_hashes)]
    )
    return (
        banded_bucket_keys(sig, num_hashes, bands, portable)
        .select(F.col("_id").alias(id_col), "_band", "_bucket")
        .withColumn(
            _keys_stamp(shingle_k, num_hashes, bands, portable), F.lit(True)
        )
    )


def minhash_signature_store(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 64,
    portable: bool = False,
) -> DataFrame:
    """The append-time half of fuzzy ingestion dedup: compute each doc's
    MinHash signature ONCE and persist it alongside the corpus
    (``df.write.parquet(store_path)``), so every later
    :func:`incremental_near_ingest` call reads ``(id, _h0.._h{k-1})``
    back instead of re-shingling 100 TB of text — pass the store frame as
    ``corpus`` and it is detected by its signature columns. Columns:
    ``(id_col, _h0.._h{num_hashes-1}, _mh_params_k{k}_n{n}_p{0|1})`` —
    num_hashes longs per doc, tiny next to the text, plus one constant
    boolean whose NAME stamps the hash-family parameters (parquet RLE
    makes it free; the check is schema-only). Band bucket keys are derived
    from the signature at read time (pure projection), so one store
    serves any banding.

    The store and every ingest against it MUST share ``shingle_k``,
    ``num_hashes``, and ``portable`` — signatures from different hash
    families never agree, which silently reads as "no duplicates".
    :func:`incremental_near_ingest` enforces this via the stamp column
    and raises on mismatch (pre-stamp stores are accepted unchecked).
    """
    from flink_1_3_2_hopsworks_spark.dedup.minhash import (
        _shingles,
        _signatures,
    )

    sig = _signatures(
        _shingles(docs, id_col, text_col, shingle_k), num_hashes, portable
    )
    return sig.withColumnRenamed("_id", id_col).withColumn(
        _store_stamp(shingle_k, num_hashes, portable), F.lit(True)
    )
