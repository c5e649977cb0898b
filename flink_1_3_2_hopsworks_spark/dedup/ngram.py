"""Token n-gram Jaccard near-duplicate detection.

North-star extension (SURVEY.md §2.14). Word n-gram sets + exact Jaccard.

Scale design — ADAPTIVE exact set-similarity join. Two physical strategies,
both exact (identical output; the strategy choice never changes results):

1. PREFIX-FILTERED inverted-index join (AllPairs/PPJoin, Bayardo et al.
   WWW'07) — the default for real (Zipfian) corpora. A naive posting-list
   self-join explodes quadratically on frequent grams; under a global
   rarest-first gram order, two sets with J ≥ t MUST share a gram inside
   their first |X| − ⌈t·|X|⌉ + 1 grams, so only those are indexed, plus the
   AllPairs length filter t·max(|A|,|B|) ≤ min(|A|,|B|). Hot grams sort
   last and stay out of the index.

2. BITMAP BROADCAST SWEEP — for LOW-ENTROPY corpora (distinct-gram
   universe ≤ universe_cap), where no token-based blocking is selective
   (measured: a 31-word-vocabulary corpus has 931 bigram types with a
   tail-less df distribution — every doc shares grams with every doc, and
   the prefix join degenerates toward all-pairs: 499 s at sf1). Each gram
   set becomes a U-bit bitmap (U ≤ 4096 → ≤ 64 longs); the full bitmap
   matrix (N·U/8 bytes — 6 MB at N=50k) broadcasts into an Arrow-batched
   sweep computing exact intersections via vectorized AND + SWAR popcount.
   No shuffle at all; work is N²·U/128 word-ops spread evenly over all
   cores, with upper-triangle chunk pruning. Capped by broadcast_doc_cap —
   beyond it the prefix path takes over (correct, slower; on a genuinely
   degenerate corpus at that size the OUTPUT itself is quadratic and no
   exact algorithm wins — MinHash is the documented scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flink_1_3_2_hopsworks_spark.functions.text import tokens

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit SWAR popcount (numpy < 2.0 has no bitwise_count)."""
    v = v - ((v >> np.uint64(1)) & _M1)
    v = (v & _M2) + ((v >> np.uint64(2)) & _M2)
    v = (v + (v >> np.uint64(4))) & _M4
    return (v * _H01) >> np.uint64(56)


def token_ngrams(text: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams (array<string>), space-joined."""
    toks = tokens(F.lower(text if isinstance(text, Column) else F.col(text)))
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(cnt < n, F.array_distinct(F.array(F.concat_ws(" ", toks)))).otherwise(
        F.array_distinct(F.transform(idx, gram))
    )


def _gram_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    short_doc_whole_text: bool = True,
) -> DataFrame:
    """(_id, _g) with _g = distinct word n-grams — same strings as
    ``token_ngrams`` but produced in an Arrow-batched pandas pass: the
    Catalyst higher-order-function formulation is interpreted per element
    and measured ~20x slower at corpus scale (71 s for 2.7M grams at sf1).

    ``short_doc_whole_text`` selects the under-n convention:
    True = the whole text as one gram (``token_ngrams``); False = no grams
    (``word_ngrams`` / contamination semantics)."""
    import re

    # Mirror engine semantics EXACTLY: Catalyst TRIM strips ASCII space
    # only, and Java-regex \s is the ASCII class [ \t\n\x0B\f\r] — Python's
    # default .strip()/\s are Unicode-aware and would produce different
    # gram sets for docs with tab/newline/Unicode whitespace at the edges.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def build(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                t = "" if text is None else text.strip(" ").lower()
                toks = ws.split(t) if t else []
                if len(toks) < n:
                    grams = [" ".join(toks)] if short_doc_whole_text else []
                else:
                    grams = list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                out.append(grams)
            yield pd.DataFrame({"_id": pdf[id_col], "_g": out})

    return df.select(id_col, text_col).mapInPandas(
        build, schema="_id long, _g array<string>"
    )


def _prefix_candidates(grams: DataFrame, threshold: float) -> DataFrame:
    """Strategy 1: prefix-filtered candidates, verified with the exact
    array intersection. Returns (id_a, id_b, _i, _na, _nb)."""
    posting = grams.select("_id", F.explode("_g").alias("_gram"))
    gram_df = posting.groupBy("_gram").agg(F.count(F.lit(1)).alias("_df"))
    ranked = posting.join(gram_df, "_gram").withColumn(
        "_rank",
        F.row_number().over(Window.partitionBy("_id").orderBy("_df", "_gram")),
    )
    with_size = ranked.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("_id"))
    )
    # Prefix length |G| − ⌈t·|G|⌉ + 1: a pair with J ≥ t must overlap
    # inside both prefixes under the common (df, gram) order. The ε nudge
    # keeps IEEE rounding from pushing t·n just past an exact integer
    # (e.g. 0.07·100 = 7.000000000000001 → ceil 8 → prefix one short →
    # silently missed pairs); erring low only lengthens the prefix, which
    # stays exact (verification is exact) and merely admits a candidate.
    prefix = with_size.filter(
        F.col("_rank")
        <= F.col("_n")
        - F.ceil(F.lit(threshold) * F.col("_n") - F.lit(1e-9))
        + 1
    ).select("_id", "_gram", "_n")
    cand = (
        prefix.select(F.col("_id").alias("id_a"), "_gram", F.col("_n").alias("_pna"))
        .join(
            prefix.select(
                F.col("_id").alias("id_b"), "_gram", F.col("_n").alias("_pnb")
            ),
            "_gram",
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # Length filter: J ≥ t ⟹ t·max(|A|,|B|) ≤ min(|A|,|B|); the ε
            # slack keeps IEEE rounding of t·max from spuriously rejecting
            # exact-boundary pairs (t·max mathematically == min).
            & (
                F.lit(threshold) * F.greatest("_pna", "_pnb") - F.lit(1e-9)
                <= F.least("_pna", "_pnb")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        cand.join(
            grams.select(F.col("_id").alias("id_a"), F.col("_g").alias("_ga")),
            "id_a",
        )
        .join(
            grams.select(F.col("_id").alias("id_b"), F.col("_g").alias("_gb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_ga", "_gb")).alias("_i"),
            F.size("_ga").alias("_na"),
            F.size("_gb").alias("_nb"),
        )
    )


def _bitmap_pairs(
    grams: DataFrame, threshold: float, vocab: list[str]
) -> DataFrame:
    """Strategy 2: exact all-pairs intersections over broadcast bitmaps.
    Returns (id_a, id_b, _i, _na, _nb) for pairs meeting the threshold."""
    spark = grams.sparkSession
    U = len(vocab)
    W = (U + 63) // 64
    index = {g: i for i, g in enumerate(vocab)}
    wcols = [f"_w{j}" for j in range(W)]

    def to_bitmaps(batches):
        for pdf in batches:
            bm = np.zeros((len(pdf), W), dtype=np.uint64)
            for r, arr in enumerate(pdf["_g"]):
                for g in arr:
                    i = index[g]
                    bm[r, i >> 6] |= np.uint64(1) << np.uint64(i & 63)
            out = {"_id": pdf["_id"]}
            signed = bm.view(np.int64)  # Spark longs carry the bit pattern
            for j, c in enumerate(wcols):
                out[c] = signed[:, j]
            yield pd.DataFrame(out)

    schema = "_id long, " + ", ".join(f"{c} long" for c in wcols)
    local = (
        grams.mapInPandas(to_bitmaps, schema=schema)
        .toPandas()  # N × (U/8) bytes — bounded by the caller's caps
        .sort_values("_id", ignore_index=True)
    )
    # One executor-side copy via a real broadcast (not a fat task closure).
    bc = spark.sparkContext.broadcast(
        (
            local["_id"].to_numpy(),
            local[wcols].to_numpy().astype(np.int64),
            )
    )
    t = float(threshold)
    # Temp arrays are chunk_a × chunk_m × W uint64 (~16 MB at W=15) and
    # _popcount holds a handful of them — keeps 32 concurrent workers
    # inside a modest memory envelope.
    chunk_a, chunk_m = 128, 2048

    def sweep(batches):
        ids, m_signed = bc.value
        M = m_signed.view(np.uint64)
        sizes = _popcount(M).sum(axis=1).astype(np.int64)
        n_rows = len(ids)
        for pdf in batches:
            a_ids = pdf["_id"].to_numpy()
            A = pdf[wcols].to_numpy().astype(np.int64).view(np.uint64)
            a_sz = _popcount(A).sum(axis=1).astype(np.int64)
            out_a, out_b, out_i, out_na, out_nb = [], [], [], [], []
            for a0 in range(0, len(a_ids), chunk_a):
                a1 = min(a0 + chunk_a, len(a_ids))
                Ac, aic, asc = A[a0:a1], a_ids[a0:a1], a_sz[a0:a1]
                a_min = aic.min()
                for m0 in range(0, n_rows, chunk_m):
                    m1 = min(m0 + chunk_m, n_rows)
                    if ids[m1 - 1] <= a_min:
                        continue  # upper-triangle pruning (M sorted by id)
                    inter = _popcount(
                        Ac[:, None, :] & M[None, m0:m1, :]
                    ).sum(axis=2)
                    union = asc[:, None] + sizes[None, m0:m1] - inter
                    # Slightly loose prefilter — the engine-side jaccard
                    # filter makes the final boundary call with the same
                    # arithmetic the oracle uses.
                    mask = (
                        (aic[:, None] < ids[None, m0:m1])
                        & (inter >= t * union - 1e-9)
                    )
                    ai, mi = np.nonzero(mask)
                    if len(ai):
                        out_a.append(aic[ai])
                        out_b.append(ids[m0:m1][mi])
                        out_i.append(inter[ai, mi])
                        out_na.append(asc[ai])
                        out_nb.append(sizes[m0:m1][mi])
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "_i": np.concatenate(out_i).astype(np.int64),
                        "_na": np.concatenate(out_na),
                        "_nb": np.concatenate(out_nb),
                    }
                )

    # Redistribute the collected bitmaps so every core sweeps a slice; the
    # matrix rides to executors once inside the UDF closure (a few MB).
    pdf_all = local
    sweep_in = spark.createDataFrame(pdf_all).repartition(
        spark.sparkContext.defaultParallelism
    )
    return sweep_in.mapInPandas(
        sweep, schema="id_a long, id_b long, _i long, _na long, _nb long"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 2,
    universe_cap: int = 4096,
    broadcast_doc_cap: int = 500_000,
    broadcast_bytes_cap: int = 64 * 2**20,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >=
    threshold). Adaptive physical strategy (see module docstring): bitmap
    broadcast sweep when the distinct-gram universe is tiny (low-entropy
    corpus — no selective blocking exists), prefix-filtered inverted-index
    join otherwise. Both are exact, so the choice never changes output;
    the final jaccard arithmetic runs engine-side either way (identical
    rounding to the SQL oracle).

    Note: the bitmap path requires a numeric (long) ``id_col``; non-numeric
    ids always take the prefix path.
    """
    numeric_id = dict(df.dtypes).get(id_col) in ("bigint", "int", "smallint", "tinyint")
    grams = (
        _gram_sets(df, id_col, text_col, n)
        if numeric_id
        else df.select(
            F.col(id_col).alias("_id"), token_ngrams(text_col, n).alias("_g")
        )
    )
    vocab = None
    if numeric_id:
        # Strategy probe: a capped TakeOrdered over distinct grams — if it
        # comes back short, the universe is tiny and the bitmap path wins.
        # The gram sets are persisted across the probe and the bitmap
        # build (released at the materialization point below).
        grams = grams.persist()
        probe = (
            grams.select(F.explode("_g").alias("_gram"))
            .distinct()
            .orderBy("_gram")
            .limit(universe_cap + 1)
            .collect()
        )
        if len(probe) <= universe_cap:
            n_docs = df.count()
            # The bitmap matrix costs docs × ⌈U/64⌉ × 8 bytes on the
            # driver: gate on the actual BYTE footprint (default ≤ 64 MB),
            # not just the row count, so a wide-universe corpus can't ask
            # the driver for hundreds of MB.
            words = (len(probe) + 63) // 64
            if (
                n_docs <= broadcast_doc_cap
                and n_docs * words * 8 <= broadcast_bytes_cap
            ):
                vocab = [r["_gram"] for r in probe]
    if vocab is not None:
        scored = _bitmap_pairs(grams, threshold, vocab)
        grams.unpersist()  # _bitmap_pairs materialized them via toPandas
    else:
        if numeric_id:
            grams.unpersist()  # no materialization point in the lazy path
        scored = _prefix_candidates(grams, threshold)
    return (
        scored.withColumn(
            "jaccard",
            F.round(F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 4),
        )
        .filter(F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")) >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def item_set_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    item_col: str,
    threshold: float = 0.6,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact Jaccard pairs over arbitrary ITEM sets — the generic core of
    this module applied to pre-hashed items (video frame hashes, feature
    ids, cluster members) instead of text grams: one distinct
    (id, item) projection, an inverted-index self-join on the item
    (``max_bucket`` anti-joins away degenerate hot items — a capped item
    can no longer witness a pair, the same documented recall trade as
    every other cap here), per-pair intersection counts, and the
    |A∩B| / (|A| + |B| − |A∩B|) verify against per-id set sizes carried
    on the pair rows. Output ``(id_a, id_b, jaccard)`` with id_a < id_b.

    Scale shape: shuffles carry only (item, id) and (id_a, id_b) rows;
    work ∝ Σ bucket² over under-cap items — selective item keys (64-bit
    perceptual hashes) keep buckets at true-duplicate size."""
    items = df.select(
        F.col(id_col).alias("_id"), F.col(item_col).alias("_it")
    ).distinct()
    sizes = items.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    hot = (
        items.groupBy("_it")
        .agg(F.count(F.lit(1)).alias("_b"))
        .filter(F.col("_b") > max_bucket)
        .select("_it")
    )
    capped = items.join(hot, "_it", "left_anti")
    inter = (
        capped.select(F.col("_id").alias("id_a"), "_it")
        .join(capped.select(F.col("_id").alias("id_b"), "_it"), "_it")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    return (
        inter.join(sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na")), "id_a")
        .join(sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
