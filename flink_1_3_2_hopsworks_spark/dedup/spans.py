"""Exact duplicated-span detection/removal over sliding token windows.

Not in the reference (north-star extension, SURVEY.md §2.14): the
exact-substring training-data dedup of Lee et al., "Deduplicating Training
Data Makes Language Models Better" (ACL 2022), re-expressed relationally.
Their suffix-array construction is a single-machine algorithm; the
equivalent corpus-scale relational shape is sliding fixed-length token
windows — a span duplicated at length >= L contains a duplicated L-window,
so L-window collisions are exactly the length->=L duplicated spans.

Scale shape (the 100 TB contract):

- Window grams are hashed to 64 bits IN THE SCAN PROJECTION and the gram
  string is dropped before anything wide — the only corpus-sized shuffle
  key is an 8-byte hash, never the ~L-word string. (xxhash64 collisions
  can over-flag ~(windows^2 / 2^64) spans; at gate scale that is ~1e-10
  expected rows, and for dedup purposes a false extra removal is benign.)
- The duplicate population (windows whose hash occurs more than once)
  bounds every later stage: the flag join, the per-doc interval union, and
  the removal lists all scale with duplicated windows, not the corpus.
- Coverage is an interval union computed with one doc-keyed window (ordered
  running max of span ends) — no per-position explosion.
- Removal rebuilds text with per-doc drop-position LISTS joined back to the
  docs (one narrow enrichment join; AQE broadcasts it when the duplicated
  population is small) — the corpus token stream is never exploded or
  shuffled.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _windows(df: DataFrame, id_col: str, text_col: str, window: int):
    """(id, _toks, _n) plus exploded (id, _p, _g): 0-based window start +
    64-bit gram hash. Tokenization mirrors the repo's engine-wide
    convention (lower, trim, split on ASCII whitespace, drop empties)."""
    # coalesce('') so NULL text degrades to zero tokens (size(NULL) is -1).
    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    wins = (
        toks.filter(F.col("_n") >= window)
        .select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, _n - {window}), "
                    f"i -> xxhash64(array_join(slice(_toks, i + 1, {window}), ' ')))"
                )
            ).alias("_p", "_g"),
        )
    )
    return toks, wins


def duplicated_span_stats(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Per-document duplicated-span coverage: how much of each doc is part
    of a token span that also occurs elsewhere in the corpus (or again in
    the same doc).

    Returns one row per input doc: ``(id, n_tokens, dup_windows,
    covered_tokens, covered_frac)`` where ``dup_windows`` counts this doc's
    windows whose gram occurs >1 time corpus-wide and ``covered_tokens`` is
    the exact interval-union size of those windows' [p, p+window-1] spans.
    """
    toks, wins = _windows(df, id_col, text_col, window)
    base = toks.select(id_col, "_n")

    dup_grams = wins.groupBy("_g").agg(F.count("*").alias("_c")).filter(
        F.col("_c") > 1
    )
    flagged = wins.join(dup_grams.select("_g"), "_g")

    w = (
        Window.partitionBy(id_col)
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("_p") + (window - 1)
    prev_end = F.coalesce(F.max(end).over(w), F.lit(-1))
    contrib = F.greatest(
        F.lit(0), end - F.greatest(F.col("_p") - 1, prev_end)
    )
    per_doc = (
        flagged.withColumn("_add", contrib)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("dup_windows"),
            F.sum("_add").alias("covered_tokens"),
        )
    )

    n = F.col("_n")
    return (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            n.cast("bigint").alias("n_tokens"),
            F.coalesce("dup_windows", F.lit(0)).cast("bigint").alias("dup_windows"),
            F.coalesce("covered_tokens", F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.when(n == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce("covered_tokens", F.lit(0)) / n.cast("double"), 4
                )
            )
            .alias("covered_frac"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Keep-first-occurrence span removal: for every duplicated window gram
    the occurrence in the LOWEST id survives; every other doc drops the
    token positions covered by that gram's windows.

    The owner doc keeps all of its text (including its own internal
    repeats — within-doc repetition is `repetition_stats`' concern); a doc
    can simultaneously own some grams and lose positions to earlier docs.
    Returns one row per input doc: ``(id, clean_text, n_removed)`` where
    ``clean_text`` is the whitespace-normalized lowercase reconstruction of
    the kept tokens (the same normalization every dedup op here applies).
    """
    base_full, wins = _windows(df, id_col, text_col, window)

    owners = (
        wins.groupBy("_g")
        .agg(F.count("*").alias("_c"), F.min(id_col).alias("_owner"))
        .filter(F.col("_c") > 1)
    )
    losing = wins.join(owners, "_g").filter(F.col(id_col) > F.col("_owner"))
    return _rebuild_without(base_full, losing, id_col, window)


def _rebuild_without(
    base_full: DataFrame, losing: DataFrame, id_col: str, window: int
) -> DataFrame:
    """Rebuild each doc's text without the token positions covered by the
    ``losing`` (id, _p) window rows: per-doc sorted drop-position list —
    rows ∝ duplicated windows, list entries ∝ covered positions; the
    corpus token stream never explodes or shuffles."""
    drops = (
        losing.select(
            id_col, F.explode(F.sequence("_p", F.col("_p") + (window - 1))).alias("_pos")
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("_pos")).alias("_drops"))
    )

    kept = F.filter(
        F.expr(
            "transform(_toks, (t, i) -> "
            "IF(array_contains(coalesce(_drops, array()), i), NULL, t))"
        ),
        lambda t: t.isNotNull(),
    )
    return (
        base_full.join(drops, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("clean_text"),
            (F.col("_n") - F.size(kept)).cast("bigint").alias("n_removed"),
        )
    )


def remove_boilerplate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """Boilerplate removal (the CCNet/RefinedWeb shared-line policy applied
    to token windows): a window gram occurring in >= ``min_docs`` DISTINCT
    documents is template text — headers, footers, navigation chrome — and
    is dropped from EVERY document, owner included (contrast
    :func:`remove_duplicated_spans`, whose keep-first policy is for
    genuine content that happens to be duplicated).

    Same scale contract as the other span ops: 8-byte gram hashes are the
    only corpus-sized shuffle key, the countDistinct per gram is one
    hash-aggregate, and everything downstream scales with the BOILERPLATE
    population, not the corpus. Returns ``(id, clean_text, n_removed)``.
    """
    base_full, wins = _windows(df, id_col, text_col, window)
    boiler = (
        wins.groupBy("_g")
        .agg(F.count_distinct(F.col(id_col)).alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_g")
    )
    losing = wins.join(boiler, "_g")
    return _rebuild_without(base_full, losing, id_col, window)
