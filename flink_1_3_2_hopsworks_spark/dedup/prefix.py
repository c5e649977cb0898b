"""Prefix-containment (crawl-truncation) duplicate detection.

North-star extension (SURVEY.md §2.14): web crawls routinely capture the
same page at different truncation lengths (render limits, fetch timeouts,
pagination tails). Such pairs are NOT exact duplicates (different
fingerprints) and can fall below a symmetric-Jaccard threshold when the
truncation is deep, but the short doc's token stream is exactly a PREFIX
of the long one's — the right detector is asymmetric containment, not
Jaccard.

Relational shape, linear in the corpus:

- Block on the hash of each doc's first ``prefix_k`` normalized tokens —
  a true (short ⊑ long) pair ALWAYS shares this key (both streams start
  with the same prefix_k tokens, provided the short doc has at least
  ``prefix_k``; shorter docs are excluded and belong to exact dedup).
  The key is computed in the scan projection; at 100 TB the block key is
  as selective as a fingerprint, so buckets are duplicate groups, not
  hash accidents — ``max_bucket`` caps degenerate template corpora.
- Verify AFTER the bucket join, back on the scan: the candidate is a real
  truncation iff md5(first n_short tokens of the long doc) == md5(short
  doc) over the normalized token stream. The md5 of the short side is
  precomputed in the scan projection; the long side's slice hash is
  computed by re-joining the (cap-bounded, broadcast) candidate list
  against the token scan — so the ONLY corpus-sized shuffle rows are
  (pk, id, n, fp) hashes, never the token arrays (the same hash-only
  shuffle contract dedup/spans.py pins: the corpus text never leaves the
  scan projection; plan-audited in tests/test_plans_audit.py). Work ∝
  candidates, and candidates ∝ true duplicate groups. The second corpus
  scan this costs is the documented trade — a columnar re-scan is cheap
  next to shuffling every ≥prefix_k-token document's full text.

Output pairs are (id_short, id_long): the long doc is the keeper (it
subsumes the short), so the standard removal composition drops id_short.
Exact duplicates (equal token streams) are emitted too — containment is
reflexive on equal streams — with the lower id on the short side.
"""

from __future__ import annotations

import warnings

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def prefix_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix_k: int = 16,
    max_bucket: int = 1000,
    candidate_budget: int | None = None,
    on_over_budget: str = "raise",
) -> DataFrame:
    """Truncation pairs ``(id_short, id_long, n_short_tokens)``: the short
    doc's whitespace-normalized token stream is exactly a prefix of the
    long doc's (ties in length ordered by id; both docs need at least
    ``prefix_k`` tokens to block).

    The verify step BROADCASTS the candidate list back onto the token scan
    — that broadcast is a hard requirement of the hash-only-shuffle
    contract (without it the token arrays would shuffle on id_long), and
    it holds only while candidates stay driver-sized. Candidates scale
    with true duplicate GROUPS (``max_bucket`` caps per-key fan-out, not
    the total), so on a template-heavy corpus pass ``candidate_budget``:
    the under-cap candidate count Σ size·(size−1)/2 is estimated from the
    block-key size aggregate (one extra job — makes the call partially
    EAGER) and the call raises (default) or warns
    (``on_over_budget="warn"``) when it exceeds the budget, pointing at a
    lower ``max_bucket`` / higher ``prefix_k``. ``None`` keeps it lazy.
    """
    # Validate unconditionally: a typo'd on_over_budget must fail at the
    # call site, not months later when someone first sets a budget.
    if on_over_budget not in ("raise", "warn"):
        raise ValueError(
            f"on_over_budget must be 'raise' or 'warn', got {on_over_budget!r}"
        )
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
            ),
            lambda t: t != F.lit(""),
        ).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    # Hash-only projection: the token arrays stay in the scan — every row
    # that reaches an Exchange from here on is (pk, id, n, fp).
    keyed = toks.filter(F.col("_n") >= prefix_k).select(
        "_id",
        "_n",
        F.xxhash64(
            F.expr(f"array_join(slice(_toks, 1, {prefix_k}), ' ')")
        ).alias("_pk"),
        F.md5(F.array_join("_toks", " ")).alias("_fp"),
    )
    bucket_sizes = keyed.groupBy("_pk").agg(F.count(F.lit(1)).alias("_bs"))
    oversized = bucket_sizes.filter(F.col("_bs") > max_bucket).select("_pk")
    capped = keyed.join(oversized, "_pk", "left_anti")

    if candidate_budget is not None:
        est = (
            bucket_sizes.filter(F.col("_bs") <= max_bucket)
            .agg(
                F.coalesce(
                    F.sum(F.col("_bs") * (F.col("_bs") - 1) / 2), F.lit(0.0)
                ).alias("n")
            )
            .collect()[0]["n"]
        )
        if est > candidate_budget:
            msg = (
                f"prefix_containment_pairs: estimated {est:.0f} under-cap "
                f"candidates exceeds candidate_budget={candidate_budget}; "
                "the verify broadcast requires a driver-sized candidate "
                "set. Lower max_bucket or raise prefix_k (a longer block "
                "prefix splits template buckets)."
            )
            if on_over_budget == "raise":
                raise ValueError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)

    short = capped.select(
        "_pk",
        F.col("_id").alias("id_short"),
        F.col("_n").alias("_n_s"),
        F.col("_fp").alias("_fp_s"),
    )
    long_ = capped.select(
        "_pk",
        F.col("_id").alias("id_long"),
        F.col("_n").alias("_n_l"),
    )
    # Canonical orientation: short side strictly smaller, or equal length
    # with the lower id — every unordered pair appears exactly once.
    orient = (F.col("_n_s") < F.col("_n_l")) | (
        (F.col("_n_s") == F.col("_n_l")) & (F.col("id_short") < F.col("id_long"))
    )
    cand = (
        short.join(long_, "_pk")
        .filter(orient)
        .select("id_short", "id_long", "_n_s", "_fp_s")
    )
    # Verify against the token SCAN: the candidate list BROADCASTS back
    # onto the corpus (hard requirement — see docstring; candidate_budget
    # is the measured guard) and the slice hash is computed map-side —
    # one md5 per candidate, no token array ever shuffled.
    verify = (
        F.md5(
            F.array_join(F.slice(F.col("_toks"), F.lit(1), F.col("_n_s")), " ")
        )
        == F.col("_fp_s")
    )
    return (
        toks.select(F.col("_id").alias("id_long"), "_toks")
        .join(F.broadcast(cand), "id_long")
        .filter(verify)
        .select(
            "id_short",
            "id_long",
            F.col("_n_s").cast("long").alias("n_short_tokens"),
        )
    )
