"""Embedding-cosine near-duplicate detection.

North-star extension (SURVEY.md §2.14). Pairs of rows whose embedding cosine
similarity exceeds a threshold. Scale path: random-hyperplane LSH — each
vector gets a sign-bit signature from s fixed seeded hyperplanes; vectors
agreeing on all s bits land in one bucket; pairs are generated per bucket and
verified with exact cosine. Hyperplanes are literal arrays baked into the
plan (broadcast-free, deterministic from the seed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_3_2_hopsworks_spark.functions.vectors import dot, norm


def hyperplanes(dim: int, count: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((count, dim)).tolist()


def hyperplane_bit_terms_sql(planes: list[list[float]], var: str = "v") -> str:
    """DuckDB SQL fragment computing the SAME MSB-first packed sign-bit
    signature as ``sign_signature`` — the single source of truth for the
    dd_embedding_pairs and sim_lsh_topk oracles (full-precision float repr
    round-trips to the identical doubles)."""
    n = len(planes)
    return "\n                + ".join(
        f"(CASE WHEN LIST_INNER_PRODUCT({var}, ["
        + ", ".join(repr(x) for x in planes[j])
        + f"]::DOUBLE[]) >= 0 THEN {1 << (n - 1 - j)} ELSE 0 END)"
        for j in range(n)
    )


def sign_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit signature: for each hyperplane, 1 if dot(vec, plane) >= 0.

    Arrow-batched pandas UDF with one numpy matmul per batch — the
    expression-tree formulation (per-plane HOF dot with literal arrays) is
    interpreted per element and an order of magnitude slower at scan scale.
    """
    plane_matrix = np.array(planes, dtype=np.float64).T  # (dim, n_planes)

    @F.pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        mat = np.array(v.tolist(), dtype=np.float64)  # (batch, dim)
        bits = (mat @ plane_matrix >= 0).astype(np.int64)  # (batch, n_planes)
        out = np.zeros(len(v), dtype=np.int64)
        for j in range(bits.shape[1]):
            out = out * 2 + bits[:, j]
        return pd.Series(out)

    return sig(vec)


def _bucket_keys(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int,
    dim: int,
    seed: int,
    extra_planes: int,
    max_bucket: int,
) -> DataFrame:
    """(_id, _key) adaptive-split bucket key for ONE plane set (see
    ``embedding_near_dups`` for the split semantics). Vectors are dropped
    immediately after the signature — candidate generation shuffles only
    (id, key) pairs."""
    total_planes = num_planes + extra_planes
    planes = hyperplanes(dim, total_planes, seed)
    sig = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_sig_all", sign_signature(F.col("_v"), planes))
        .select("_id", "_sig_all")
        .withColumn("_base", F.shiftright("_sig_all", extra_planes))
    )
    counts = sig.groupBy("_base").agg(F.count(F.lit(1)).alias("_bsz"))
    return sig.join(counts, "_base").select(
        "_id",
        F.when(F.col("_bsz") > max_bucket, F.col("_sig_all"))
        .otherwise(F.col("_base") + F.lit(1 << total_planes))
        .alias("_key"),
    )


def embedding_near_dups_amplified(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    num_sets: int = 3,
    extra_planes: int = 16,
    max_bucket: int = 256,
) -> DataFrame:
    """OR-amplified embedding near-dup pairs — the PRODUCTION RECALL LEVER
    over ``embedding_near_dups``: candidates are unioned across
    ``num_sets`` independent hyperplane sets (seeds ``seed … seed+sets-1``;
    set 0 is exactly the single-set gate's planes, so recall is monotone
    non-decreasing in ``num_sets``), deduplicated BEFORE the exact-cosine
    verify so each surviving pair is scored once. A 0.9-cosine pair missed
    by one 8-plane set with p ≈ 0.67 survives s sets with p ≈ 0.67^s —
    three sets push single-bucket recall from ~0.33 to ~0.70.

    Scale shape: per set, one scan + signature (Arrow-batched matmul) and a
    bucketed self-join that shuffles ONLY (id, key) pairs — vectors rejoin
    once, after the candidate distinct. Each set keeps the same adaptive
    hot-bucket split as the base operator. Work is ``num_sets`` × the base
    candidate cost plus one verify of the deduped union."""
    if num_sets < 1:
        raise ValueError(f"num_sets must be >= 1, got {num_sets}")
    cands = None
    for s in range(num_sets):
        keys = _bucket_keys(
            df, id_col, vec_col, num_planes, dim, seed + s,
            extra_planes, max_bucket,
        )
        left = keys.select("_key", F.col("_id").alias("id_a"))
        right = keys.select("_key", F.col("_id").alias("id_b"))
        c = (
            left.join(right, "_key")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    vecs = df.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v")
    ).withColumn("_nrm", norm(F.col("_v")))
    denom = F.col("n_a") * F.col("n_b")
    return (
        cands.join(
            vecs.select(
                F.col("_vid").alias("id_a"),
                F.col("_v").alias("v_a"),
                F.col("_nrm").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("_vid").alias("id_b"),
                F.col("_v").alias("v_b"),
                F.col("_nrm").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn(
            "cosine",
            F.round(
                F.when(denom == 0.0, F.lit(0.0)).otherwise(
                    dot(F.col("v_a"), F.col("v_b")) / denom
                ),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    extra_planes: int = 16,
    max_bucket: int = 256,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold, via hyperplane-LSH
    bucketing + exact verification. Recall rises with fewer planes (bigger
    buckets); 8 planes catches a 0.9-cosine pair in one bucket with
    p = (1 - acos(0.9)/pi)^8 ≈ 0.33 — ``embedding_near_dups_amplified``
    unions several plane sets (OR-amplification) when recall matters more
    than a single compact plan.

    Scale guard — ADAPTIVE BUCKET SPLIT: clustered corpora concentrate
    vectors into a few sign buckets, and an uncapped per-bucket self-join is
    quadratic in the hot-bucket size (measured: 55x wall time on 10x rows at
    sf1 before this fix). The signature is computed ONCE over
    num_planes + extra_planes hyperplanes; rows bucket on the leading
    ``num_planes`` bits, and any bucket larger than ``max_bucket`` re-keys
    on the FULL bit string — work in dense regions is bounded by how finely
    24 bits shatter them, instead of growing quadratically. Deterministic
    (bucket sizes are data-determined, no RNG), hash-agg + join (no
    WindowExec hot partition), and replayed exactly by the DuckDB oracle.
    Recall in split buckets needs all-bit agreement — the documented trade;
    ``embedding_near_dups_amplified`` is the production recall lever.
    """
    total_planes = num_planes + extra_planes
    # NumPy fills row-major, so the first num_planes rows equal the planes
    # an (num_planes, dim) draw would produce — base buckets are unchanged.
    planes = hyperplanes(dim, total_planes, seed)
    sig = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_sig_all", sign_signature(F.col("_v"), planes))
        .withColumn("_base", F.shiftright("_sig_all", extra_planes))
    )
    counts = sig.groupBy("_base").agg(F.count(F.lit(1)).alias("_bsz"))
    # Disjoint key spaces: hot rows key on the full bit string, cold rows on
    # base + 2^total (cannot collide with any full signature).
    keyed = sig.join(counts, "_base").withColumn(
        "_key",
        F.when(F.col("_bsz") > max_bucket, F.col("_sig_all")).otherwise(
            F.col("_base") + F.lit(1 << total_planes)
        ),
    )
    # Per-VECTOR norms ride on the keyed table: cosine verify then costs one
    # dot per pair instead of three interpreted HOF aggregates (Spark HOFs
    # are CodegenFallback — at millions of candidate pairs the two
    # per-pair norms dominated). Same expression dot/(|a|·|b|), same IEEE
    # ops, so the oracle is untouched.
    keyed = keyed.withColumn("_nrm", norm(F.col("_v")))
    left = keyed.select(
        F.col("_key"),
        F.col("_id").alias("id_a"),
        F.col("_v").alias("v_a"),
        F.col("_nrm").alias("n_a"),
    )
    right = keyed.select(
        F.col("_key"),
        F.col("_id").alias("id_b"),
        F.col("_v").alias("v_b"),
        F.col("_nrm").alias("n_b"),
    )
    denom = F.col("n_a") * F.col("n_b")
    return (
        left.join(right, "_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                F.when(denom == 0.0, F.lit(0.0)).otherwise(
                    dot(F.col("v_a"), F.col("v_b")) / denom
                ),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
