"""Semantic deduplication — SemDeDup re-expressed relationally.

Not in the reference (north-star extension, SURVEY.md §2.14): Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" (2023). The algorithm: k-means the embedding space, call
two documents semantic duplicates when they land in the SAME cluster with
cosine similarity above a threshold, and keep one representative per
duplicate group.

Spark-first composition of pieces this repo already audits:

- Cell assignment reuses the IVF coarse quantizer (similarity/ivf.py):
  frozen centroid literals ride the plan, the argmin is fused into the
  scan projection — no shuffle, no Python, and the same literals make the
  DuckDB oracle replay assignment exactly.
- Candidate pairs are a within-cell self-join — the quadratic work SemDeDup
  prescribes, but bounded per cell: cells ≈ N/k, and k grows with the
  corpus (FAISS-style sqrt(N) cells keeps per-cell cost flat). The join
  shuffles on the cell id only.
- Survivor resolution reuses the near-dedup cluster pipeline
  (neardup.resolve_duplicate_clusters): pairs → connected components
  (loop-invariant-pinned Pregel) → min-id canonical per transitive group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.functions.vectors import (
    cosine_with_norms,
    norm,
)


def semantic_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
    max_cell: int | None = None,
) -> DataFrame:
    """Within-cluster semantic-duplicate pairs: ``(id_a, id_b, cosine)``
    with ``id_a < id_b``, both assigned to the same centroid cell and
    cosine >= threshold. Deterministic given the centroid literals.

    Within-cell pairs are quadratic PER CELL by design (SemDeDup); the
    production contract is cells ∝ √N so per-cell cost stays flat. When
    the quantizer is under-provisioned for the corpus, ``max_cell``
    degrades gracefully instead of quadratically: cells larger than the
    cap are EXCLUDED from pair generation (their members keep themselves),
    mirroring minhash's ``max_bucket`` — the cap is an explicit recall
    trade, never an OOM. ``None`` (default) keeps full SemDeDup semantics.
    """
    # Arrow cell kernel, not ivf_cells_expr: the corpus-scale argmax
    # expression is the measured Janino interpreted-fallback shape
    # (functions/vectors.py) — bit-identical cells, oracle unaffected.
    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        nearest_fixed_vector,
    )

    c = nearest_fixed_vector(
        corpus.select(F.col(id_col), F.col(vec_col).alias("_v")),
        "_v",
        centroids,
        out_col="_cell",
    )
    if max_cell is not None:
        oversized = (
            c.groupBy("_cell")
            .agg(F.count(F.lit(1)).alias("_csize"))
            .filter(F.col("_csize") > max_cell)
            .select("_cell")
        )
        c = c.join(oversized, "_cell", "left_anti")
    # Hoist the L2 norm to one evaluation per VECTOR before the quadratic
    # within-cell join: cosine()'s norms are interpreted HOF aggregates and
    # appear twice per pair (guard + division), so the pre-r12 shape paid
    # 4 norm aggregations per PAIR. cosine_with_norms keeps the arithmetic
    # bit-identical (same guard, same division — just hoisted).
    c = c.withColumn("_n", norm(F.col("_v")))
    a = c.select(
        "_cell", F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = c.select(
        "_cell", F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, "_cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                cosine_with_norms(
                    F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
                ),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.9,
    max_cell: int | None = None,
) -> DataFrame:
    """Per-document semantic-dedup verdicts: ``(id, canonical_id, kept)``
    — one row per corpus document, ``kept`` marking the min-id survivor of
    each transitive semantic-duplicate group (docs with no semantic dup
    keep themselves). ``max_cell``: see :func:`semantic_dup_pairs`."""
    from flink_1_3_2_hopsworks_spark.dedup.neardup import (
        resolve_duplicate_clusters,
    )

    pairs = semantic_dup_pairs(
        corpus, id_col, vec_col, centroids, threshold, max_cell=max_cell
    )
    return resolve_duplicate_clusters(corpus, pairs, id_col)
