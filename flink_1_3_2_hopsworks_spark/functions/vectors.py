"""Vector functions over array<float/double> embedding columns.

North-star extension (SURVEY.md §2.14): the primitives for similarity
search. Built on higher-order functions (``zip_with`` / ``aggregate``) so the
arithmetic runs JVM-side inside codegen — no Python crossing, no UDF — and
scales linearly with a parquet scan.

All functions up-cast to double before accumulating: both for precision and
so results are bit-comparable with a double-based oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (left-to-right summation —
    deterministic, order-stable)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_with_norms(
    a: Column, b: Column, norm_a: Column, norm_b: Column
) -> Column:
    """:func:`cosine` with the two L2 norms PRE-computed per vector.

    Bit-identical to ``cosine(a, b)`` when ``norm_a``/``norm_b`` are
    :func:`norm` of the same vectors: the expression shape (the
    ``denom == 0`` guard, the single division) is unchanged — only the
    norm evaluations are hoisted out of the per-pair expression. The HOF
    aggregates here are interpreted (never codegen'd), so a join that
    scores P pairs over N vectors drops from 4·P interpreted norm
    aggregations (each norm appears in the guard AND the division) to N —
    the r12 measured fix for the within-cell SemDeDup join and the
    brute-force/LSH top-k scorers."""
    denom = norm_a * norm_b
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# --------------------------------------------------------------------------
# Arrow-batched kernels for corpus-scale scans against a FIXED vector set.
#
# The Column-expression path above is the right tool when each row meets a
# HANDFUL of fixed vectors. Meeting K fixed vectors per row (K×D literal
# terms — e.g. 16 cells × 64 dims = 1024-term trees) re-runs the measured
# Janino failure from round 7 (similarity/pq.py module docstring): codegen
# exceeds the 64 KB method limit and Spark silently falls back to
# interpreted eval. Round 8 measured exactly that on the cell-assignment
# scan: sf1→sf10 ratios of 10.28× (cluster-balanced sample) and 10.15×
# (semantic decontamination) — time ∝ rows with zero amortization, the
# interpreted signature. These kernels are the same fix pq_encode used:
# numpy multiply-adds with an EXPLICIT d-ascending accumulation loop, which
# reproduces the zip_with/aggregate left-to-right summation (and therefore
# DuckDB's LIST_COSINE_SIMILARITY) bit-for-bit — the oracle contract.
# --------------------------------------------------------------------------


def _seq_norms(vectors: list[list[float]]) -> list[float]:
    """L2 norms via a sequential python loop — same addition order as
    ``norm()``'s aggregate (and the oracle's)."""
    import math

    out = []
    for c in vectors:
        s = 0.0
        for x in c:
            s += float(x) * float(x)
        out.append(math.sqrt(s))
    return out


def _batch_cosines(x, cents, cnorms):
    """(n, K) cosine matrix with ``cosine()``'s exact semantics: ascending-
    index accumulation, denom = |v|·|c|, 0.0 where denom is 0."""
    import numpy as np

    n, dim = x.shape
    dot = np.zeros((n, cents.shape[0]))
    vsq = np.zeros(n)
    for d in range(dim):
        dot += x[:, d, None] * cents[:, d][None, :]
        vsq += x[:, d] * x[:, d]
    denom = np.sqrt(vsq)[:, None] * cnorms[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom == 0.0, 0.0, dot / denom)


def nearest_fixed_vector(
    df,
    vec_col: str,
    vectors: list[list[float]],
    out_col: str = "_cell",
    out_cos: str | None = None,
):
    """Append ``out_col`` (int): the index of the nearest (cosine desc,
    ties → lower index) of the K fixed ``vectors`` — identical cells to
    ``similarity.ivf.ivf_cells_expr(vec, vectors, 1)[0]``, computed in an
    Arrow-batched kernel instead of a K×D-term expression tree. Use THIS
    on corpus-scale scans; the expression stays right for query-sized
    frames (it keeps the plan pure-Catalyst). ``out_cos`` additionally
    emits the winning cosine (double, unrounded — round JVM-side to keep
    the half-up contract)."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(vectors, dtype=np.float64)
    cnorms = np.asarray(_seq_norms(vectors))
    fields = [
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ]
    extra = [f"{out_col} int"] + ([f"{out_cos} double"] if out_cos else [])
    schema = ", ".join(fields + extra)
    cols = [f.name for f in df.schema.fields]

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            cos = _batch_cosines(x, cents, cnorms)
            best = cos.argmax(axis=1)
            out = {c: pdf[c] for c in cols}
            out[out_col] = best.astype("int32")
            if out_cos:
                out[out_cos] = cos[np.arange(len(pdf)), best]
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema)
