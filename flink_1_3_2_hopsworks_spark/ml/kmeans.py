"""Spherical k-means — iterative model TRAINING as a driver loop.

North-star extension (SURVEY.md §2.14): the quantizer-training step behind
the IVF / SemDeDup / PQ serving paths (similarity/ivf.py trains through
pyspark.ml once and freezes; THIS module is the same algorithm expressed
on the engine's own primitives so the whole train→serve story is
auditable end-to-end). Spherical variant (assign by max cosine, centroids
L2-normalized after every mean) — the natural choice for embedding spaces
and exactly the assignment expression the IVF serving path already uses
(``ivf_cells_expr``, plan-audited).

Scale + determinism contract:

- One Lloyd iteration = one corpus pass: the cosine argmax over k literal
  centroids is fused into the scan projection (no shuffle, no Python) and
  ONE hash-aggregate computes the per-cell per-dim means (k×D tiny result
  — the MODEL, which lives on the driver like every trained model; the
  per-iteration collect is k rows, not data).
- Every iteration's centroids are rounded to ``round_dp`` decimals after
  normalization: a float mean is summation-order-dependent across engines,
  and the rounding quantizes that last-ulp noise away — which is what
  makes a 3-iteration run replayable bit-for-bit by the DuckDB oracle
  (same discipline as the portable samplers). Empty cells keep their
  previous centroid; a zero-norm mean likewise. Residual hazard (accepted,
  documented): ``F.avg`` partial sums follow the partition schedule, so a
  pathological near-tie could still flip the ``round_dp``-th decimal
  between runs — the oracle gate would catch it, and raising ``round_dp``
  tolerance is the remedy. Rounding mode is HALF_UP (``_round_half_up``),
  matching DuckDB ROUND / Spark F.round.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
from pyspark.sql import DataFrame




def _round_half_up(x: float, dp: int) -> float:
    """Half-AWAY-FROM-ZERO rounding, matching DuckDB ROUND and Spark
    F.round (HALF_UP). Python's builtin round() is banker's (half-to-even):
    an exact .5 tie at the ``dp``-th decimal would break the module's
    bit-for-bit oracle-replay contract. Ties at the 6th decimal of an
    IEEE-754 quotient are astronomically rare — but the contract is exact
    replay, so the rounding mode is pinned, not assumed."""
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP)
    )


def spherical_kmeans_fit(
    df: DataFrame,
    vec_col: str,
    init_centroids: list[list[float]],
    iterations: int = 3,
    round_dp: int = 6,
) -> list[list[float]]:
    """Run ``iterations`` spherical Lloyd steps from ``init_centroids`` and
    return the trained centroids (python lists — the model)."""
    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        nearest_fixed_vector,
    )

    cents = [list(map(float, c)) for c in init_centroids]
    dim = len(cents[0])
    for _ in range(iterations):
        # Arrow cell kernel, not ivf_cells_expr: the k×D-literal argmax
        # expression on a corpus-scale scan is the measured Janino
        # interpreted-fallback shape (see functions/vectors.py) — and
        # training assigns the FULL corpus every iteration. Bit-identical
        # cells (ascending accumulation), so the unrolled SQL oracle is
        # unaffected.
        assigned = nearest_fixed_vector(
            df.select(F.col(vec_col).alias("_v")), "_v", cents, out_col="_cell"
        )
        means = (
            assigned.groupBy("_cell")
            .agg(
                *[
                    F.avg(F.element_at(F.col("_v"), d + 1)).alias(f"_m{d}")
                    for d in range(dim)
                ]
            )
            .collect()
        )
        new = {r["_cell"]: [r[f"_m{d}"] for d in range(dim)] for r in means}
        nxt = []
        for cell, prev in enumerate(cents):
            mv = new.get(cell)
            if mv is None:
                nxt.append(prev)
                continue
            norm = sum(x * x for x in mv) ** 0.5
            if norm == 0.0:
                nxt.append(prev)
                continue
            nxt.append([_round_half_up(x / norm, round_dp) for x in mv])
        cents = nxt
    return cents


def spherical_kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """(id, cell, cosine) — final assignment against trained centroids,
    cosine rounded to 4 dp. Runs in the Arrow cell kernel (one crossing
    emits cell AND winning cosine) — the k×D expression + CASE-chain
    variant is the measured Janino interpreted-fallback shape on a
    corpus-scale scan (functions/vectors.py); values are bit-identical,
    rounding stays JVM-side (half-up contract)."""
    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        nearest_fixed_vector,
    )

    out = nearest_fixed_vector(
        df.select(F.col(id_col), F.col(vec_col).alias("_v")),
        "_v",
        centroids,
        out_col="cell",
        out_cos="_cos",
    )
    return out.select(id_col, "cell", F.round("_cos", 4).alias("cosine"))
