"""Product-quantization ANN — asymmetric distance computation (ADC).

North-star extension (SURVEY.md §2.14), the memory-side scale path of
similarity search (Jégou et al., "Product quantization for nearest
neighbor search", TPAMI 2011): split each D-dim vector into M subvectors,
quantize every subvector to its nearest centroid in a per-subspace
codebook (K centroids), and store only the M small codes — 8 bytes per
vector at the default 8×16 instead of 512 (64 doubles). Queries stay
full-precision: the score of a code against a query is a LOOKUP-TABLE sum
(ADC), never a reconstruction per pair.

Spark-first shape (mirrors similarity/ivf.py's frozen-model serving):

- ``pq_codes_expr`` — the M argmin code expressions over LITERAL
  codebooks, fused into the corpus scan projection: encode is a narrow
  map, no shuffle, no Python. On a real deployment the codes are written
  back to parquet once (tiny columns) and every later query reads codes
  only — the 100 TB corpus is never re-scanned at full width.
- ``pq_topk`` — per query, the 16-entry lookup tables (one per subspace)
  are computed ONCE on the (broadcast) query side; the corpus side joins
  carrying only its codes, and the approximate cosine is M element_at
  lookups + one divide, all whole-stage codegen. The only shuffle is the
  per-query top-k window, proportional to |queries| × k under AQE.

Approximate cosine: cos(q, x̂) where x̂ is the codebook reconstruction —
numerator Σ_s <q_s, c_{s,code_s}> via the LUT, ‖x̂‖² = Σ_s ‖c_{s,code_s}‖²
(exact because subspaces are orthogonal coordinate blocks), ‖q‖ exact.
Deterministic given frozen codebooks (argmin ties break to the lower
code), so a SQL oracle replays encode → LUT → rank bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flink_1_3_2_hopsworks_spark.functions.vectors import as_double, dot, norm


def _sub(vec: Column, s: int, d: int) -> Column:
    """Subvector s (0-based) of width d — 1-based slice into the array."""
    return F.slice(as_double(vec), s * d + 1, d)


def _sqnorms(book: list[list[float]]) -> list[float]:
    return [float(sum(x * x for x in c)) for c in book]


def pq_codes_expr(vec: Column, codebooks: list[list[list[float]]]) -> list[Column]:
    """One argmin code Column per subspace, over literal codebooks.

    argmin_j ‖sub − c_j‖² = argmin_j (‖c_j‖² − 2·<sub, c_j>) — ‖sub‖² is
    constant per row, so each candidate costs one dot product against a
    literal. Ties break to the lower code (struct-min on (dist, code)),
    matching the oracle's ORDER BY dist, code."""
    cols = []
    for s, book in enumerate(codebooks):
        d = len(book[0])
        sub = _sub(vec, s, d)
        scored = F.array(
            *[
                F.struct(
                    (F.lit(sq) - 2.0 * dot(sub, F.lit(c))).alias("dist"),
                    F.lit(j).alias("code"),
                )
                for j, (c, sq) in enumerate(zip(book, _sqnorms(book)))
            ]
        )
        cols.append(F.array_min(scored)["code"].alias(f"code_{s}"))
    return cols


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(id, code_0..code_{M-1}) — the persisted form of a PQ index."""
    return corpus.select(
        F.col(id_col), *pq_codes_expr(F.col(vec_col), codebooks)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k cosine per query via ADC over PQ codes.

    Output shape matches ``brute_force_topk``: (query_id, id, cosine,
    rank), rank deterministic via (score desc, id asc) — ``cosine`` is the
    APPROXIMATE reconstruction cosine, rounded to 4 dp. Recall vs the
    exact baseline is a property of codebook quality (pytest-covered);
    determinism is the gate's contract."""
    coded = pq_encode(corpus, id_col, vec_col, codebooks)
    luts = [
        F.array(
            *[dot(_sub(F.col(vec_col), s, len(book[0])), F.lit(c)) for c in book]
        ).alias(f"_lut{s}")
        for s, book in enumerate(codebooks)
    ]
    q = queries.select(
        F.col(query_id),
        norm(F.col(vec_col)).alias("_qnorm"),
        *luts,
    )
    num = sum(
        F.element_at(F.col(f"_lut{s}"), F.col(f"code_{s}") + 1)
        for s in range(len(codebooks))
    )
    xsq = sum(
        F.element_at(
            F.lit(_sqnorms(book)).cast("array<double>"),
            F.col(f"code_{s}") + 1,
        )
        for s, book in enumerate(codebooks)
    )
    denom = F.col("_qnorm") * F.sqrt(xsq)
    scored = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn(
            "cosine",
            F.round(F.when(denom == 0.0, F.lit(0.0)).otherwise(num / denom), 4),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )
