"""StochasticOutlierSelection (SOS) — FlinkML parity (§2.13).

Reference: flink-ml ``outlier/StochasticOutlierSelection.scala`` (Janssens,
Huszar, Postma, van den Herik, "Stochastic Outlier Selection", 2012).
Parameters mirror the reference: ``perplexity`` (h), ``max_iterations`` and
``error_tolerance`` for the per-point variance search.

Algorithm (identical semantics to the reference):

1. pairwise squared Euclidean dissimilarities d²(i,j), i ≠ j;
2. per point i, find the Gaussian precision β_i whose affinity distribution
   a_ij = exp(−β_i·d²(i,j)) has entropy log(perplexity) (binary search, as
   in the reference's ``binarySearch``);
3. binding probabilities b_ij = a_ij / Σ_k a_ik;
4. outlier probability P(i) = Π_{j≠i} (1 − b_ji) — the chance no other
   point "binds" to i.

Spark-first plan: the d² computation and the final product-aggregation stay
JVM-side (``zip_with``/``aggregate`` over the feature arrays; ``exp(sum(
log1p(−b)))`` per target point). Only step 2 — an iterative scalar root
search per point — runs in Python, vectorized over each point's full
neighbor row via ``applyInPandas`` (one numpy binary search per point, all
neighbors at once).

Scale notes: SOS is inherently O(n²) in points (the reference broadcasts
the full dataset to every node — strictly worse). The cross join here
broadcasts the smaller projection when Spark can; for large n, sample or
pre-cluster first — the n² pair table, not this plan, is the limit. Each
perplexity-search group is one point's n−1 neighbors: partitions stay
balanced under the hash shuffle on the point id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class StochasticOutlierSelection:
    """FlinkML-shaped transformer: ``transform(df)`` appends
    ``outlier_probability`` per input row."""

    def __init__(
        self,
        perplexity: float = 4.5,
        max_iterations: int = 50,
        error_tolerance: float = 1e-8,
    ):
        if perplexity <= 0:
            raise ValueError("perplexity must be > 0")
        self._perplexity = perplexity
        self._max_iter = max_iterations
        self._tol = error_tolerance

    def transform(
        self,
        df: DataFrame,
        id_col: str = "id",
        features_col: str = "features",
    ) -> DataFrame:
        import math

        left = df.select(F.col(id_col).alias("_i"), F.col(features_col).alias("_fi"))
        right = df.select(F.col(id_col).alias("_j"), F.col(features_col).alias("_fj"))
        d2 = F.aggregate(
            F.zip_with("_fi", "_fj", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        pairs = (
            left.crossJoin(right)
            .filter(F.col("_i") != F.col("_j"))
            .select("_i", "_j", d2.alias("_d2"))
        )

        log_h = math.log(self._perplexity)
        max_iter, tol = self._max_iter, self._tol

        def bind(pdf):
            import numpy as np
            import pandas as pd

            d = pdf["_d2"].to_numpy(dtype="float64")
            # Binary search the precision beta so the affinity entropy hits
            # log(perplexity) — the reference's binarySearch, vectorized
            # over this point's whole neighbor row.
            beta, lo, hi = 1.0, 0.0, np.inf
            b = np.exp(-d * beta)
            for _ in range(max_iter):
                s = b.sum()
                if s <= 0:  # beta overshot: all affinities underflowed
                    entropy_diff = -log_h
                else:
                    # H = log(s) + beta * E[d]
                    entropy_diff = (np.log(s) + beta * (d * b).sum() / s) - log_h
                if abs(entropy_diff) <= tol:
                    break
                if entropy_diff > 0:  # entropy too high → sharpen
                    lo = beta
                    beta = beta * 2 if hi == np.inf else (beta + hi) / 2
                else:
                    hi = beta
                    beta = (beta + lo) / 2
                b = np.exp(-d * beta)
            s = b.sum()
            binding = b / s if s > 0 else np.zeros_like(b)
            return pd.DataFrame(
                {"_i": pdf["_i"], "_j": pdf["_j"], "_b": binding}
            )

        i_t = dict(df.dtypes)[id_col]
        bindings = pairs.groupBy("_i").applyInPandas(
            bind, f"_i {i_t}, _j {i_t}, _b double"
        )

        # P(j) = prod over i of (1 - b_ij): log-space product, JVM-side.
        # Clamp: a binding probability of exactly 1 (two coincident points,
        # everything else far) means certain inlier-ness -> P contribution 0.
        probs = bindings.groupBy("_j").agg(
            F.exp(
                F.sum(F.log(F.greatest(F.lit(1e-300), F.lit(1.0) - F.col("_b"))))
            ).alias("outlier_probability")
        )
        return df.join(
            probs.select(F.col("_j").alias(id_col), "outlier_probability"), id_col
        )
