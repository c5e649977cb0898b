"""MinHash + LSH near-duplicate detection.

North-star extension (SURVEY.md §2.14). The classic Broder pipeline,
expressed entirely in JVM-side expressions (no Python in the hot path):

  shingle (char n-grams) → base hash (xxhash64 mod 2^31-1) → k minhashes
  (affine permutations a_i*h+b_i mod 2^31-1, MLlib MinHashLSH's family)
  → band the signature (b bands × r rows) → explode bands → groupBy
  (band_id, band_hash) buckets → same-bucket candidate pairs → verify with
  exact shingle Jaccard.

Scale notes: the only shuffles are the band-bucket groupBy and the final
verify join — both on well-distributed hash keys. Signature computation is
a narrow map over the scan. Mega-buckets (a band hash shared by thousands of
docs) are capped via ``max_bucket`` to bound the quadratic pair expansion —
at 100 TB this cap is what keeps a degenerate band from exploding a task.
"""

from __future__ import annotations

import random
import warnings

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Universal-hash family over a Mersenne prime (the MLlib MinHashLSH scheme):
# each minhash function is h_i(x) = (a_i * base(x) + b_i) mod P where
# base(x) = xxhash64(x) mod P. One string hash per shingle; the per-function
# work is two long ops that stay inside whole-stage codegen, and a_i*base
# (< 2^31 * 2^31) can never overflow a long, so it is ANSI-mode safe.
_MERSENNE = (1 << 31) - 1


def _coeffs(num_hashes: int) -> list[tuple[int, int]]:
    rng = random.Random(0x5EED)
    return [
        (rng.randint(1, _MERSENNE - 1), rng.randint(0, _MERSENNE - 1))
        for _ in range(num_hashes)
    ]


def _perm(base: Column, a: int, b: int) -> Column:
    return F.pmod(F.lit(a) * base + F.lit(b), F.lit(_MERSENNE))


def lsh_catch_probability(threshold: float, bands: int, rows: int) -> float:
    """P(a pair at exactly ``threshold`` Jaccard shares >=1 LSH band) =
    1-(1-j^r)^b — the band-geometry recall at the operating point."""
    return 1.0 - (1.0 - threshold**rows) ** bands


def _warn_if_low_recall(
    threshold: float, bands: int, rows: int, recall_floor: float | None
) -> None:
    """The r=8 default geometry trades recall at low thresholds for a
    measured ~2× decade-scale win (SCALE_MINHASH_PARAMS.json). That trade
    must be CONSCIOUS: when the band-geometry catch probability at the
    caller's own threshold falls below ``recall_floor``, warn with the
    fix (scale bands with num_hashes so r stays put, or lower r)."""
    if recall_floor is None:
        return
    p = lsh_catch_probability(threshold, bands, rows)
    if p < recall_floor:
        warnings.warn(
            f"minhash LSH geometry {bands} bands x {rows} rows catches a "
            f"j={threshold} pair with p={p:.3f} < recall_floor="
            f"{recall_floor}. Scale num_hashes and bands together to keep "
            f"r while raising catch probability (e.g. num_hashes="
            f"{2 * bands * rows}, bands={2 * bands} keeps r={rows} and "
            f"lifts p to {lsh_catch_probability(threshold, 2 * bands, rows):.3f}), "
            f"lower num_hashes for a smaller r, or pass recall_floor=None "
            f"to accept the trade.",
            RuntimeWarning,
            stacklevel=3,
        )


def char_shingles(text: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of normalized text (array<string>)."""
    col = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    n = F.length(normalized)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: normalized.substr(i, F.lit(k)))
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """k-minhash signature (array<bigint>): each component is the min over
    the shingle set of one affine permutation of the shingle's base hash."""
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    return F.array(
        *[
            F.array_min(F.transform(base, lambda h, ab=ab: _perm(h, *ab)))
            for ab in _coeffs(num_hashes)
        ]
    )


def band_hashes(signature: Column, bands: int, rows: int) -> Column:
    """Group the signature into ``bands`` bands of ``rows`` values; hash each
    band to one bucket key (array<struct<band:int, bucket:bigint>>)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at(signature, b * rows + r + 1) for r in range(rows)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array-sets."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def exact_shingle_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    threshold_num: int = 8,
    threshold_den: int = 10,
    persist: bool = True,
) -> DataFrame:
    """EXACT Jaccard >= threshold_num/threshold_den pairs over the SAME
    character-``shingle_k`` shingle sets MinHash estimates on — the ground
    truth for recall evaluation of the LSH geometry (dd_minhash_recall).
    Inverted-index intersections over distinct shingles; the threshold is
    the integer cross-multiplication ``den·|A∩B| >= num·|A∪B|`` (no float
    boundary). Output: (id_a, id_b) with id_a < id_b.

    Quadratic by output like every exact pair listing — an EVALUATION
    query for gate-scale corpora; MinHash is the scale path. The distinct
    shingle table is referenced three times (two join sides + sizes), so
    it is pinned by default (library-internal cache caller-owned — the
    signature-table contract; ``persist=False`` in shared-cache tests).
    """
    sh = _shingles(df, id_col, text_col, shingle_k).distinct()
    if persist:
        sh = sh.persist()
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    inter = (
        sh.select(F.col("_id").alias("id_a"), "_shingle")
        .join(sh.select(F.col("_id").alias("id_b"), "_shingle"), "_shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    union_sz = F.col("_sza") + F.col("_szb") - F.col("_i")
    return (
        inter.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb")),
            "id_b",
        )
        .filter(
            F.col("_i") * threshold_den >= union_sz * threshold_num
        )
        .select("id_a", "id_b")
    )


def _shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """(_id, _shingle) — character k-shingles of the normalized text.

    Generate (explode) materializes the normalized string per doc; substr
    per position is then O(k) — the direct HOF formulation would
    re-evaluate the whole normalization per element (interpreted, O(len²)).
    """
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    norm = df.select(F.col(id_col).alias("_id"), normalized.alias("_norm"))
    n = F.length("_norm")
    positions = F.sequence(F.lit(1), F.greatest(n - (shingle_k - 1), F.lit(1)))
    return norm.select(
        "_id", F.explode(positions).alias("_pos"), F.col("_norm")
    ).select(
        "_id", F.col("_norm").substr(F.col("_pos"), F.lit(shingle_k)).alias("_shingle")
    )


def _signatures(shingles: DataFrame, num_hashes: int, portable: bool) -> DataFrame:
    """(_id, _h0.._h{k-1}) — the minhash signature table.

    Min is duplicate-insensitive, so no distinct needed — one hash-aggregate
    over the exploded shingle stream, ``num_hashes`` codegen'd mins. Each
    shingle is string-hashed ONCE; the per-function minhashes are affine
    permutations of that base hash (two long ops each).
    """
    if portable:
        from flink_1_3_2_hopsworks_spark.dedup.simhash import portable_hash60

        base_hash = F.pmod(portable_hash60(F.col("_shingle")), F.lit(_MERSENNE))
    else:
        base_hash = F.pmod(F.xxhash64("_shingle"), F.lit(_MERSENNE))
    based = shingles.select("_id", base_hash.alias("_base"))
    return based.groupBy("_id").agg(
        *[
            F.min(_perm(F.col("_base"), *ab)).alias(f"_h{i}")
            for i, ab in enumerate(_coeffs(num_hashes))
        ]
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
    verify: str = "estimate",
    portable: bool = False,
    persist: bool = True,
    candidate_budget: int | None = None,
    on_over_budget: str = "raise",
    recall_floor: float | None = 0.9,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    This is the PAIR-LISTING (audit) form of fuzzy dedup: output size is the
    candidate pair count, inherently super-linear on low-entropy corpora.
    When the goal is duplicate CLUSTERS, use :func:`minhash_star_edges`
    (Θ(docs × bands) regardless of bucket sizes) — the default composition
    in ``pipe_near_dedup``.

    ``portable=True`` swaps the two xxhash64 uses for DuckDB-reproducible
    forms — the base hash becomes the md5-prefix portable hash (see
    simhash.portable_hash60) and band buckets become '|'-joined value
    strings — and skips the jaccard rounding (k/num_hashes is exactly
    representable when num_hashes is a power of two), so an oracle can
    replay the ENTIRE pipeline in SQL. Default (False) keeps the faster
    hashes for production.

    ``verify="estimate"`` (default, the scale path) scores candidates by the
    MinHash estimator — the fraction of agreeing signature components,
    num_hashes integer compares per pair. ``verify="exact"`` re-joins the candidate
    docs' shingle sets and computes true Jaccard (unbiased, costs a
    collect_set + array intersection per pair — fine when candidates are few).

    LSH recall: with b bands of r rows, P(candidate) = 1-(1-j^r)^b. The
    default geometry is 8 bands × 8 rows (num_hashes=64, r=8): a j=0.8 pair
    is caught with p≈0.77, j=0.85 → 0.91, j=0.9 → 0.98, j=0.95 → 0.9998.
    When that catch probability AT THE CALLER'S THRESHOLD falls below
    ``recall_floor`` (default 0.9) the call warns so the trade is conscious
    — pass ``recall_floor=None`` to accept the geometry silently.
    r=8 is the measured scale default — on a low-entropy corpus it halved
    the decade-scale wall vs r=4 with identical results, because the
    band-collision candidate stream (the pairs-mode cost driver) shrinks
    roughly as j^r per colliding pair (SCALE_MINHASH_PARAMS.json: r=4
    10.6× on 10× data, r=8 5.1×). For maximum recall near the 0.8
    operating point pass ``num_hashes=32, bands=8`` (r=4, p≈0.99 at j=0.8)
    and accept the quadratic-leaning candidate stream, or keep r=8 and add
    bands (``num_hashes=96, bands=12`` → p≈0.89 at j=0.8).

    ``candidate_budget`` (optional guard): before enumerating pairs, the
    under-cap candidate count Σ size·(size-1)/2 is estimated from the
    bucket-size aggregate (one extra job over the persisted signatures —
    this makes the call partially EAGER). If it exceeds the budget the
    call raises (``on_over_budget="raise"``, default) or warns and
    proceeds (``"warn"``), pointing at the scale-safe alternatives:
    star-edge mode for cluster goals, more rows per band, or a lower
    ``max_bucket``. ``None`` (default) keeps the call fully lazy.

    Plan shape (everything whole-stage-codegen'd, no interpreted HOF hot
    path): normalize text once per row → explode shingle positions (Generate
    keeps the normalized string materialized — substr per shingle is O(k)) →
    project ``num_hashes`` xxhash64 columns → hash-aggregate per-doc minima →
    band → bucket-join. Signature cost is linear in corpus size. In the
    default estimate mode the verify runs INSIDE the bucket join: both join
    sides carry the num_hashes signature longs, the estimator is a codegen'd
    on the pipelined join output, and the only pair-keyed shuffle is the
    distinct over SURVIVING pairs (r6 — the previous
    distinct-then-two-signature-joins shape shuffled the full candidate
    stream three times, which a measured 198M-band-collision corpus at
    sf10 turned into a timeout; 601 s → 210 s, SCALE_SF10.json).
    """
    rows = num_hashes // bands
    _warn_if_low_recall(threshold, bands, rows, recall_floor)
    shingles = _shingles(df, id_col, text_col, shingle_k)
    sig = _signatures(shingles, num_hashes, portable)
    # Lifecycle: callers looping over corpora pass persist=False and accept
    # the recompute, or clearCache between runs — the returned plan executes
    # after this function, so no unpersist hook can fire here.
    if persist:
        sig = sig.persist()

    # Buckets ride WITHOUT the shingle sets: 8 small rows per doc, not 8
    # copies of a multi-KB array (the arrays join back only for candidates).
    def _bucket_key(b: int) -> Column:
        cols = [F.col(f"_h{b * rows + r}") for r in range(rows)]
        if portable:
            return F.concat_ws("|", *cols).cast("string")
        return F.xxhash64(*cols).cast("string")

    buckets = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _bucket_key(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select("_id", F.col("_b.band").alias("_band"), F.col("_b.bucket").alias("_bucket"))

    # Cap degenerate buckets before the quadratic pair join — ANTI-join
    # against the oversized-bucket list rather than a window count: the hot
    # bucket the cap exists for is exactly the partition a WindowExec would
    # buffer whole in one task, while the hash-aggregate takes a map-side
    # partial. No broadcast hint: unlike simhash's chunk domain (bounded at
    # 4·65536 values), (_band, _bucket) is unbounded — a templated corpus
    # can yield up to rows/max_bucket oversized entries, so let AQE
    # broadcast the list when it is actually small and degrade to a
    # shuffled anti-join when it is not.
    bucket_sizes = buckets.groupBy("_band", "_bucket").agg(
        F.count(F.lit(1)).alias("_bsize")
    )
    oversized = bucket_sizes.filter(F.col("_bsize") > max_bucket).select(
        "_band", "_bucket"
    )
    capped = buckets.join(oversized, ["_band", "_bucket"], "left_anti")

    if candidate_budget is not None:
        if on_over_budget not in ("raise", "warn"):
            raise ValueError(
                f"on_over_budget must be 'raise' or 'warn', got {on_over_budget!r}"
            )
        est = (
            bucket_sizes.filter(F.col("_bsize") <= max_bucket)
            .agg(
                F.coalesce(
                    F.sum(F.col("_bsize") * (F.col("_bsize") - 1) / 2),
                    F.lit(0.0),
                ).alias("n")
            )
            .collect()[0]["n"]
        )
        if est > candidate_budget:
            msg = (
                f"minhash_near_dups: estimated {est:.0f} under-cap candidate "
                f"pairs exceeds candidate_budget={candidate_budget}. Pair "
                "listing is inherently quadratic in bucket co-membership; "
                "use minhash_star_edges for cluster resolution, raise "
                "rows-per-band (lower bands for the same num_hashes, or a "
                "larger num_hashes), or lower max_bucket."
            )
            if on_over_budget == "raise":
                raise ValueError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)

    if verify != "exact":
        # ESTIMATE PATH — verify INSIDE the bucket join, dedup survivors.
        # On a low-entropy corpus the under-cap candidate stream is
        # quadratic-ish until the cap regime (measured at sf10: 198M
        # band-collisions from 500k docs, none of them over the cap), so
        # the old shape — distinct 198M pairs, then TWO signature joins
        # against them, then filter — paid three shuffles of the full
        # candidate stream before a single pair was rejected. Instead the
        # num_hashes signature longs ride the (already bucket-shuffled) join
        # sides, the estimator evaluates as a codegen'd filter directly on
        # the pipelined join output (no materialization), and the only
        # pair-keyed shuffle is the final distinct over SURVIVORS — the
        # output, not the candidates. Same result set: the estimator is a
        # pure function of the two signatures, so per-band duplicates agree
        # and distinct-after-filter ≡ distinct-before-join.
        # The signature payload rides as LONGs. The r12 int-cast "width
        # halving" here was REVERTED in r13: UnsafeRow stores every
        # fixed-width field in an 8-byte slot, so casting long→int does
        # NOT shrink the exchange payload — it only adds 2·num_hashes cast
        # expressions per candidate row (and inflates Janino compile:
        # 9.6 s vs 3.6 s cold). Quiet-gated interleaved A/B: long median
        # 3.97 s vs int-cast 4.25 s, and the r12 driver bench regressed
        # this gate 19% (plans/r13/ab_dedup_components_r13.json).
        sig_cols = [f"_h{i}" for i in range(num_hashes)]
        wide = sig.select("_id", *sig_cols).join(capped, "_id")
        left = wide.select(
            "_band",
            "_bucket",
            F.col("_id").alias("id_a"),
            *[F.col(c).alias(f"_a{i}") for i, c in enumerate(sig_cols)],
        )
        right = wide.select(
            "_band",
            "_bucket",
            F.col("_id").alias("id_b"),
            *[F.col(c).alias(f"_b{i}") for i, c in enumerate(sig_cols)],
        )
        agree = sum(
            F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
            for i in range(num_hashes)
        )
        # k/num_hashes is exact (dyadic) for power-of-two num_hashes — the
        # portable path skips rounding so the oracle matches bit-for-bit.
        est = agree / F.lit(float(num_hashes))
        jac = est if portable else F.round(est, 4)
        return (
            left.join(right, ["_band", "_bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
            .distinct()
        )

    candidates = (
        capped.select("_band", "_bucket", F.col("_id").alias("id_a"))
        .join(
            capped.select("_band", "_bucket", F.col("_id").alias("id_b")),
            ["_band", "_bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # EXACT PATH: shingle sets are built ONLY for candidate-involved docs
    # (left-semi prune before the collect_set shuffle) — candidate count,
    # not corpus size, bounds the verify cost.
    cand_ids = candidates.select(
        F.explode(F.array("id_a", "id_b")).alias("_id")
    ).distinct()
    sets = (
        shingles.join(cand_ids, "_id", "left_semi")
        .groupBy("_id")
        .agg(F.collect_set("_shingle").alias("_sh"))
    )
    return (
        candidates.join(
            sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")),
            "id_b",
        )
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_star_edges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket: int = 1000,
    portable: bool = False,
    persist: bool = True,
    recall_floor: float | None = 0.9,
    id_filter: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """LINEAR near-dup edge generation for cluster resolution (the 100 TB
    shape of fuzzy dedup): per LSH bucket, emit only the star edges
    (bucket-min id ↔ member), verified by the MinHash estimator — O(size)
    edges per bucket instead of the O(size²) pair expansion.

    This is the anchor/star reduction used when the goal is CLUSTERS (feed
    :func:`resolve_duplicate_clusters`), not the full pair listing: for
    connected components, the star edges of a bucket connect exactly the
    members the estimator accepts against the bucket's min doc — a strict
    subset of the pair graph, so precision is identical (every emitted edge
    passed the same ``>= threshold`` check) and connectivity can only split
    where a bucket's min is NOT a near-dup of two members that ARE near-dups
    of each other; each of the ``bands`` independent band buckets gives such
    a pair another chance to meet through a shared anchor. True duplicate
    clusters (estimator 1.0, identical signatures) co-locate in ALL bands.
    Recall vs the pair mode is corpus-dependent — measured at the gate in
    tests/test_dedup.py; choose pairs mode when exact pair semantics matter.

    Why it scales where pairs cannot: a low-entropy corpus measured 198M
    band collisions from 500k docs at sf10 (SCALE_SF10.json) — every one a
    joined-and-filtered row in pairs mode. Star mode's work per bucket is
    one hash-aggregate row (min of a struct — the anchor id plus its
    signature, no second pass) plus one bucket-keyed join, so total work is
    Θ(docs × bands) regardless of bucket sizes. Same capping as pairs mode.

    ``id_filter`` (optional, a one-column DataFrame named ``id_col``)
    restricts the dedup to a document SUBSET without a text shuffle:
    signatures are per-doc independent, so semi-joining the SIGNATURE
    table (id + 64 longs) on the survivor ids is exactly equivalent to
    pre-joining ``df`` — anchors, buckets, and edges all see only the
    subset — while the corpus text never leaves the scan projection
    (pre-joining shuffles the text column on the id at scale). The trade:
    signatures are computed for every ``df`` row; pre-filter ``df``
    instead when the subset is tiny and signing CPU dominates.

    ``signatures`` (optional) supplies a PRE-COMPUTED signature frame —
    ``(id_col | _id, _h0.._h{num_hashes-1}, ...)``, e.g. the output of
    :func:`~flink_1_3_2_hopsworks_spark.dedup.incremental.
    minhash_signature_store` — and skips the shingle+hash pass entirely,
    the same reuse contract incremental_near_ingest applies to a persisted
    store. The frame MUST come from the same hash family (shingle_k,
    num_hashes, portable); caller owns its lifecycle, so ``persist`` is
    ignored (no hidden double-cache of an already-pinned frame).
    """
    rows = num_hashes // bands
    _warn_if_low_recall(threshold, bands, rows, recall_floor)
    if signatures is not None:
        src = "_id" if "_id" in signatures.columns else id_col
        sig = signatures.select(
            F.col(src).alias("_id"),
            *[f"_h{i}" for i in range(num_hashes)],
        )
    else:
        sig = _signatures(
            _shingles(df, id_col, text_col, shingle_k), num_hashes, portable
        )
    if id_filter is not None:
        # No distinct on the filter side: LEFT SEMI is insensitive to
        # right-side duplicates, so the pre-r12 distinct only added an
        # exchange + aggregate to every probe-filtered call.
        sig = sig.join(
            id_filter.select(F.col(id_col).alias("_id")),
            "_id",
            "left_semi",
        )
    if persist and signatures is None:
        sig = sig.persist()

    def _bucket_key(b: int) -> Column:
        cols = [F.col(f"_h{b * rows + r}") for r in range(rows)]
        if portable:
            return F.concat_ws("|", *cols).cast("string")
        return F.xxhash64(*cols).cast("string")

    sig_cols = [f"_h{i}" for i in range(num_hashes)]
    # Signatures ride the bucket rows from the start (one explode over the
    # persisted signature table) — the anchor aggregate below needs them and
    # a separate sig⋈bucket join would just re-shuffle the same longs.
    # They ride as LONGs: the r12 int-cast was reverted in r13 — UnsafeRow
    # gives every fixed-width field an 8-byte slot, so the cast saved no
    # exchange bytes and only added per-row cast work (A/B + driver-bench
    # evidence in plans/r13/ab_dedup_components_r13.json).
    wide = sig.select(
        "_id",
        *sig_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _bucket_key(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_b"),
    ).select(
        "_id", *sig_cols,
        F.col("_b.band").alias("_band"), F.col("_b.bucket").alias("_bucket"),
    )
    oversized = (
        wide.groupBy("_band", "_bucket")
        .agg(F.count(F.lit(1)).alias("_bsize"))
        .filter(F.col("_bsize") > max_bucket)
        .select("_band", "_bucket")
    )
    capped = wide.join(oversized, ["_band", "_bucket"], "left_anti")

    # The anchor row per bucket in ONE hash-aggregate: min of a struct whose
    # first field is the id picks the min-id row WITH its signature — no
    # second join against a min-id list.
    anchors = capped.groupBy("_band", "_bucket").agg(
        F.min(F.struct(F.col("_id"), *[F.col(c) for c in sig_cols])).alias("_m")
    )
    agree = sum(
        F.when(F.col(f"_m._h{i}") == F.col(f"_h{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = agree / F.lit(float(num_hashes))
    jac = est if portable else F.round(est, 4)
    return (
        capped.join(anchors, ["_band", "_bucket"])
        .filter(F.col("_id") > F.col("_m._id"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("_m._id").alias("id_a"),
            F.col("_id").alias("id_b"),
            "jaccard",
        )
        .distinct()
    )
