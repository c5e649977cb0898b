"""Product-quantization ANN — asymmetric distance computation (ADC).

North-star extension (SURVEY.md §2.14), the memory-side scale path of
similarity search (Jégou et al., "Product quantization for nearest
neighbor search", TPAMI 2011): split each D-dim vector into M subvectors,
quantize every subvector to its nearest centroid in a per-subspace
codebook (K centroids), and store only the M small codes — 8 bytes per
vector at the default 8×16 instead of 512 (64 doubles). Queries stay
full-precision: the score of a code against a query is a LOOKUP-TABLE sum
(ADC), never a reconstruction per pair.

Spark shape (mirrors similarity/embedding's Arrow-batched signatures):

- ``pq_encode`` — the M×K candidate distances are DENSE LINEAR ALGEBRA
  (1024 multiply-adds per vector at the default geometry), which is
  exactly the workload that belongs in an Arrow-batched numpy kernel,
  not in Catalyst codegen: the equivalent literal expression tree was
  measured to blow Janino's 64 KB method limit (Spark silently falls
  back to INTERPRETED evaluation — the worst of both worlds), while the
  numpy batch kernel streams the scan at memory bandwidth. Encode stays
  a narrow map: no shuffle, one pass; on a real deployment the codes are
  written back to parquet once and every later query reads codes only —
  the 100 TB corpus is never re-scanned at full width.
- ``pq_topk`` — the per-query 16-entry lookup tables (one per subspace)
  are computed ONCE on the (tiny, broadcast) query side by the same
  kernel; the corpus side joins carrying only its codes, and the
  approximate cosine is M ``element_at`` lookups + one divide — small
  expressions that DO stay whole-stage codegen. The only shuffle is the
  per-query top-k window, proportional to |queries| × k under AQE.

Determinism / oracle contract: every accumulation in the numpy kernel is
an explicit d-ascending loop (numpy's pairwise summation never kicks in
— and the loop IS the sequential order DuckDB's LIST_INNER_PRODUCT and a
left-to-right SQL chain use), argmin ties break to the lower code
(np.argmin first-occurrence ≡ ORDER BY dist, code), and ‖x̂‖² derives
from the same python-float ``_sqnorms`` on both sides — so a SQL oracle
replays encode → LUT → rank bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _sqnorms(book: list[list[float]]) -> list[float]:
    return [float(sum(x * x for x in c)) for c in book]


def _id_ddl(df: DataFrame, id_col: str) -> str:
    return f"{id_col} {df.schema[id_col].dataType.simpleString()}"


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    passthrough_cols: tuple[str, ...] = (),
    cell_centroids: list[list[float]] | None = None,
    cell_col: str = "_cell",
) -> DataFrame:
    """(id, [passthrough...], code_0..code_{M-1}) — the persisted form of a
    PQ index. ``passthrough_cols`` ride the Arrow batch unchanged (e.g. the
    IVF ``_cell`` computed in the upstream scan projection — see
    ``ivfpq_topk``).

    argmin_j ‖sub − c_j‖² = argmin_j (‖c_j‖² − 2·<sub, c_j>): ‖sub‖² is
    constant per row, so encoding is one (n × D)·(D × M·K)-shaped batch of
    multiply-adds — computed in an Arrow-batched numpy kernel with an
    explicit d-ascending accumulation loop (see module docstring for why
    not Catalyst codegen and why the loop order is the oracle contract).

    ``cell_centroids``: also compute the IVF coarse cell (``cell_col``,
    int) INSIDE the same kernel — identical cells to
    ``ivf_cells_expr(vec, cell_centroids, 1)[0]`` (the expression on a
    corpus-scale scan is itself the Janino interpreted-fallback shape:
    round 8 measured the composed ivfpq gate at sf1→sf10 6.65× before
    this, with the cell projection dominating the scan). One Python
    crossing encodes codes AND cell.
    """
    import numpy as np
    import pandas as pd

    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        _batch_cosines,
        _seq_norms,
    )

    m = len(codebooks)
    d = len(codebooks[0][0])
    cents = np.asarray(codebooks, dtype=np.float64)  # (M, K, D)
    sq = np.asarray([_sqnorms(b) for b in codebooks])  # (M, K)
    if cell_centroids is not None:
        ccents = np.asarray(cell_centroids, dtype=np.float64)
        cnorms = np.asarray(_seq_norms(cell_centroids))
    passthrough = list(passthrough_cols)
    schema_parts = [_id_ddl(corpus, id_col)]
    schema_parts += [
        f"{c} {corpus.schema[c].dataType.simpleString()}" for c in passthrough
    ]
    if cell_centroids is not None:
        schema_parts += [f"{cell_col} int"]
    schema_parts += [f"code_{s} int" for s in range(m)]
    schema = ", ".join(schema_parts)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            out = {id_col: pdf[id_col]}
            for c in passthrough:
                out[c] = pdf[c]
            if cell_centroids is not None:
                cos = _batch_cosines(x, ccents, cnorms)
                out[cell_col] = cos.argmax(axis=1).astype("int32")
            for s in range(m):
                acc = np.zeros((len(pdf), cents.shape[1]))
                for k in range(d):
                    acc += x[:, s * d + k, None] * cents[s, :, k][None, :]
                dist = sq[s][None, :] - 2.0 * acc
                out[f"code_{s}"] = dist.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return corpus.select(id_col, *passthrough, vec_col).mapInPandas(kernel, schema)


def _query_luts(
    queries: DataFrame,
    query_id: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(query_id, _qnorm, _lut0.._lut{M-1}) — per-query ADC lookup tables
    (lut_s[j] = <q_s, c_{s,j}>), same sequential-accumulation kernel."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    d = len(codebooks[0][0])
    cents = np.asarray(codebooks, dtype=np.float64)
    schema = _id_ddl(queries, query_id) + ", _qnorm double, " + ", ".join(
        f"_lut{s} array<double>" for s in range(m)
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.zeros(len(pdf))
            for k in range(x.shape[1]):
                nrm += x[:, k] * x[:, k]
            out = {query_id: pdf[query_id], "_qnorm": np.sqrt(nrm)}
            for s in range(m):
                acc = np.zeros((len(pdf), cents.shape[1]))
                for k in range(d):
                    acc += x[:, s * d + k, None] * cents[s, :, k][None, :]
                out[f"_lut{s}"] = list(acc)
            yield pd.DataFrame(out)

    return queries.select(query_id, vec_col).mapInPandas(kernel, schema)


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
    APPROXIMATE reconstruction cosine, rounded to 4 dp; approximate cosine
    = (Σ_s lut_s[code_s]) / (‖q‖·√(Σ_s ‖c_{s,code_s}‖²)) — ‖x̂‖² is exact
    because subspaces are orthogonal coordinate blocks. Recall vs the
    exact baseline is a property of codebook quality (pytest-covered);
    determinism is the gate's contract. The scoring expressions after the
    broadcast join are M lookups + a divide — small, codegen'd."""
    coded = pq_encode(corpus, id_col, vec_col, codebooks)
    q = _query_luts(queries, query_id, vec_col, codebooks)
    scored = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn("cosine", _adc_cosine(codebooks))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def _adc_cosine(codebooks: list[list[list[float]]]):
    """The ADC approximate-cosine expression over (code_*, _lut*, _qnorm)
    columns: (Σ_s lut_s[code_s]) / (‖q‖·√(Σ_s ‖c_{s,code_s}‖²)), rounded
    to 4 dp — M element_at lookups + a divide, whole-stage codegen'd."""
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
    return F.round(F.when(denom == 0.0, F.lit(0.0)).otherwise(num / denom), 4)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF-ADC: the composed serving structure of Jégou et al. 2011 and the
    canonical 100 TB ANN shape — a frozen coarse quantizer prunes the
    corpus to the query's ``nprobe`` Voronoi cells, and PQ codes score the
    survivors via lookup-table sums. ``pq_topk``'s flat ADC still scans
    every code for every query; here the ADC join carries an equi-key on
    ``_cell``, so per-query work is ∝ corpus × nprobe / num_cells.

    Plan shape: corpus scan → ONE Arrow-batched kernel computing the
    ``_cell`` argmax AND the PQ codes (the k×D Column-expression variant
    of the cell argmax is the measured Janino interpreted-fallback shape
    on a corpus-scale scan — sf1→sf10 6.65× before the kernel; the
    query-side probe moved to its own kernel in round 10 after the
    literal HOF tree's analysis+codegen measured ~27 s of fixed planning
    tax per query — ``ivf_probe_cells``)
    → equi-JOIN on ``_cell`` against the broadcast
    (query × nprobe) LUT probe set → codegen'd ADC cosine → per-query
    top-k window (the only shuffle, WindowGroupLimit-bounded). On a real
    deployment codes+cells persist partitioned by ``_cell``
    (write_partitioned) and a query reads ``nprobe`` directories —
    partition pruning IS the inverted file; the full-width corpus is
    never re-scanned.

    Variant note (documented divergence, now MEASURED): codes quantize the
    RAW vector, not the residual (vec − coarse centroid) of the original
    IVFADC — residual encoding needs per-cell codebooks trained jointly
    with the quantizer; raw-vector codes let one frozen codebook serve any
    coarse geometry (the composition is what prunes). The round-9 A/B
    (tests/test_similarity_pq.py::test_residual_vs_raw_pq_recall_ab, equal
    M=8/K=16 budget on the gate corpus) measured residual-trained codes at
    LOWER recall@10 than the frozen raw codes (0.305 vs 0.335) despite a
    slightly lower reconstruction MSE — the corpus is near-isotropic, so
    the coarse cells explain little variance and residual rotation spends
    the same budget on a harder distribution. Deterministic end-to-end
    given both frozen models — the registry gate hash-matches a DuckDB
    oracle; recall vs flat PQ is pytest-covered.
    """
    from flink_1_3_2_hopsworks_spark.similarity.ivf import ivf_probe_cells

    coded = pq_encode(
        corpus,
        id_col,
        vec_col,
        codebooks,
        cell_centroids=coarse_centroids,
    )
    # Query-side probing uses the Arrow kernel, not ivf_cells_expr: the
    # k×dim literal HOF tree's ANALYSIS+CODEGEN alone measured ~27 s per
    # query at 16×64 — a fixed planning tax (5 probe rows). Same cosine
    # contract, same tie order — oracle-identical (see ivf_probe_cells).
    probe = ivf_probe_cells(
        queries, query_id, vec_col, coarse_centroids, nprobe
    )
    q = _query_luts(queries, query_id, vec_col, codebooks).join(probe, query_id)
    scored = (
        coded.join(F.broadcast(q), "_cell")
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn("cosine", _adc_cosine(codebooks))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 4,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF-PQ with an EXACT rerank refinement — the standard production
    serving pattern (Jégou et al. 2011 §V "re-ranking"; every large-scale
    ANN deployment ships this shape): the compressed index shortlists
    ``shortlist`` candidates per query by ADC, then ONLY those candidates'
    full-precision vectors are fetched and scored exactly, and the final
    top-``k`` ranks by true cosine. Recall approaches the exact baseline
    while the expensive math touches |queries| × shortlist rows instead
    of the corpus (measured on the gate corpus:
    tests/test_similarity_pq.py::test_rerank_recall_beats_plain_ivfpq).

    Scale shape: the shortlist pass is ``ivfpq_topk``'s audited contract
    (one fused Arrow kernel over the code scan, broadcast LUT probe); the
    refine pass re-reads the corpus ONCE more projecting (id, vec) only
    and hash-joins the broadcast shortlist — on a real deployment the
    vectors live in a column the codes table omits, so this is the
    point-lookup read every rerank pays, never a shuffle of the corpus.
    Output matches ``brute_force_topk``: (query_id, id, cosine, rank)
    with EXACT cosine, rank by (cosine desc, id asc)."""
    from flink_1_3_2_hopsworks_spark.functions.vectors import cosine

    short = ivfpq_topk(
        corpus, queries, coarse_centroids, codebooks, id_col, vec_col,
        k=shortlist, nprobe=nprobe, query_id=query_id,
    ).select(query_id, id_col)
    cand = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv")
    ).join(F.broadcast(short), id_col)
    scored = cand.join(
        F.broadcast(
            queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
        ),
        query_id,
    ).withColumn("cosine", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 4).alias("cosine"), "rank")
    )


def ivfpq_append_batch(
    batch: DataFrame,
    store_ids: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Incremental IVF-PQ index maintenance — O(batch), store untouched.

    The 100 TB serving store is the ``_cell``-partitioned code table
    ``pq_encode`` emits (see ``ivfpq_topk``'s deployment note). Ingesting
    a new crawl batch must not re-encode the store: this assigns cells and
    codes for ONLY the batch (the same fused Arrow kernel, so appended
    rows are bit-identical to what a full rebuild would produce — frozen
    models make encoding per-row deterministic), after dropping ids the
    store already holds (re-crawled items; id-level upsert-skip
    semantics).

    Plan shape (the incremental_ingest probe applied to the ANN store):
    the store side is ONLY scanned for its id column — its (tiny,
    batch-bounded) intersection with the broadcast batch-id set comes
    back as a broadcast anti-join, so neither the store nor the batch
    ever shuffles, and the ONE Python crossing is the encode kernel over
    the surviving batch rows. Returns the rows to append, ready for
    ``write_partitioned(..., ["_cell"])``.
    """
    new_ids = batch.select(id_col).distinct()
    collisions = (
        store_ids.select(id_col)
        .join(F.broadcast(new_ids), id_col, "left_semi")
        .distinct()
    )
    fresh = batch.join(F.broadcast(collisions), id_col, "left_anti")
    # The store invariant is ONE code row per id — a batch carrying the
    # same id twice (crawler retry inside one batch) must not append two.
    # min-struct keeps a deterministic representative (arrays order
    # lexicographically in Spark).
    fresh = (
        fresh.groupBy(id_col)
        .agg(F.min(F.struct(vec_col)).alias("_r"))
        .select(id_col, F.col(f"_r.{vec_col}").alias(vec_col))
    )
    return pq_encode(
        fresh, id_col, vec_col, codebooks, cell_centroids=coarse_centroids
    )


def ivfpq_store_topk(
    spark,
    store_path: str,
    queries: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    cell_col: str = "_cell",
) -> DataFrame:
    """Serve IVF-ADC top-k FROM the persisted ``_cell``-partitioned code
    store — the deployment shape ``ivfpq_topk``'s docstring promises:
    partition pruning IS the inverted file. ``ivfpq_topk`` re-runs the
    corpus encode kernel on every call; here cells and codes were paid
    once at ingest (seed_code_store / ingest_vector_batch /
    compact_vector_store all write this layout), so a serve call reads
    ONLY the ≤ ``queries × nprobe`` probed cell directories and never
    touches a raw vector or a Python kernel on the corpus side.

    Plan shape: ONE tiny probe kernel over the queries
    (``ivf_probe_cells``) whose ≤ |queries| × nprobe rows are collected —
    bounded BY CONSTRUCTION by the serve-call query set, the query-side
    twin of the stores' ≤ 64 bucket-id collect — and re-emitted both as a
    static ``cell IN (...)`` scan filter (PartitionFilters at plan time;
    no DPP subquery needed) and as the literal probe frame for the
    per-query cell equi-join. The store scan projects (id, cell, codes)
    only, joins the broadcast query LUTs on ``cell_col``, and the
    codegen'd ADC cosine + WindowGroupLimit top-k tail is shared with
    ``ivfpq_topk`` — results are IDENTICAL to serving the raw corpus
    through ``ivfpq_topk`` under the same frozen models (pytest-pinned,
    and the registry gate's oracle replays the full encode+ADC chain
    from the raw vectors).

    Works unchanged on a seeded store, a multi-epoch ingest store, and a
    ``compact_vector_store`` base: all keep ``cell_col`` as the inner
    partition column, ids are unique store-wide by the ingest loop's
    anti-join invariant, and serving reads every ``batch_id`` present.
    """
    from flink_1_3_2_hopsworks_spark.similarity.ivf import ivf_probe_cells

    store = spark.read.parquet(store_path)
    m = len(codebooks)
    code_cols = [f"code_{s}" for s in range(m)]
    missing = [c for c in (id_col, cell_col, *code_cols)
               if c not in store.columns]
    if missing:
        raise ValueError(
            f"store at {store_path!r} is missing column(s) {missing} — "
            "serve-path stores are written by seed_code_store / "
            "ingest_vector_batch / compact_vector_store with "
            f"{cell_col!r} as the inner partition column and one "
            f"code_0..code_{m - 1} row per id."
        )
    # Bounded collect (|queries| × nprobe rows): one probe-kernel
    # execution feeds BOTH the static partition filter and the join.
    probe = ivf_probe_cells(
        queries, query_id, vec_col, coarse_centroids, nprobe
    )
    probe_rows = probe.collect()
    cells = sorted({r[cell_col] for r in probe_rows})
    probe_df = spark.createDataFrame(probe_rows, probe.schema)
    coded = store.filter(F.col(cell_col).isin(cells)).select(
        id_col, cell_col, *code_cols
    )
    q = _query_luts(queries, query_id, vec_col, codebooks).join(
        probe_df, query_id
    )
    scored = (
        coded.join(F.broadcast(q), cell_col)
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn("cosine", _adc_cosine(codebooks))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )
