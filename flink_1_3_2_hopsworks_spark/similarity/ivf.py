"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path for embedding search (north-star extension, SURVEY.md §2.14).

The classic IVF-Flat layout (Sivic & Zisserman "Video Google" / FAISS IVF):
k-means the corpus into ``num_cells`` Voronoi cells; at query time score
only the vectors in the query's ``nprobe`` nearest cells. Versus
hyperplane-LSH (knn.py), IVF adapts its partitions to the data
distribution — clustered corpora get balanced cells where fixed random
hyperplanes give lopsided buckets.

Spark-first shape:
  - training: ``pyspark.ml`` KMeans over a SAMPLE (centroid quality needs
    thousands of points per cell, not the whole corpus — at 100 TB you
    train on a 0.1% sample and assign everything);
  - assignment: the fitted model's transform — a broadcast of k centroids
    against the corpus scan, no shuffle;
  - the index is just the corpus + a ``_cell`` int column. Persist it
    partitioned by ``_cell`` (write_partitioned) and a query's candidate
    read is ``nprobe`` directory scans — partition pruning IS the inverted
    file;
  - querying: queries × broadcast(centroids) → nprobe nearest cells per
    query → equi-join on ``_cell`` against the index → JVM-side cosine →
    per-query top-k window. The only shuffle is the final per-query top-k.

Vectors are L2-normalized before clustering and scoring, so Euclidean
k-means ≈ spherical k-means and cosine ordering matches the cell geometry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flink_1_3_2_hopsworks_spark.functions.vectors import (
    as_double,
    cosine,
    cosine_with_norms,
    norm,
)


def _normalized(vec) -> Column:
    v = as_double(vec)
    n = norm(v)
    return F.when(n == 0, v).otherwise(
        F.transform(v, lambda x: x / n)
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    num_cells: int = 64,
    sample_fraction: float = 1.0,
    max_iter: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Train the coarse quantizer and assign every corpus vector to a cell.

    Returns ``(index, centroids)``: index = corpus columns + ``_cell`` int;
    centroids = (_cell, _centroid array<double>), k rows — always
    broadcastable. ``sample_fraction`` < 1 trains k-means on a sample (the
    100 TB posture) while still assigning the full corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    normed = corpus.withColumn("_nv", _normalized(F.col(vec_col)))
    train = normed if sample_fraction >= 1.0 else normed.sample(
        fraction=sample_fraction, seed=seed
    )
    km = KMeans(
        k=num_cells,
        maxIter=max_iter,
        seed=seed,
        featuresCol="_features",
        predictionCol="_cell",
    )
    model = km.fit(train.withColumn("_features", array_to_vector("_nv")))

    index = (
        model.transform(normed.withColumn("_features", array_to_vector("_nv")))
        .drop("_features", "_nv")
    )
    centroids = index.sparkSession.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "_cell INT, _centroid ARRAY<DOUBLE>",
    )
    return index, centroids


def ivf_probe_topk(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
) -> DataFrame:
    """Top-k cosine per query over the ``nprobe`` nearest cells.

    Output shape matches brute_force_topk/lsh_topk: (query_id, id, cosine,
    rank). The centroid ranking and the candidate join both broadcast the
    small side; candidates ∝ corpus × nprobe / num_cells."""
    q = queries.select(F.col(query_id), _normalized(F.col(vec_col)).alias("_qv"))

    cell_w = Window.partitionBy(query_id).orderBy(
        F.desc("_cell_sim"), F.asc("_cell")
    )
    probed = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_cell_sim", cosine(F.col("_qv"), F.col("_centroid")))
        .withColumn("_cell_rank", F.row_number().over(cell_w))
        .filter(F.col("_cell_rank") <= nprobe)
        .select(query_id, "_qv", "_cell")
    )

    # Norms hoisted per vector/query (cosine() re-aggregates both norms
    # per candidate; cosine_with_norms is bit-identical — see vectors.py).
    scored = (
        index.withColumnRenamed(vec_col, "_cv")
        .withColumn("_cn", norm(F.col("_cv")))
        .join(
            F.broadcast(probed.withColumn("_qn", norm(F.col("_qv")))),
            "_cell",
        )
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 4).alias("cosine"), "rank")
    )


def ivf_probe_cells(
    queries,
    query_id: str,
    vec_col: str,
    centroids: list[list[float]],
    nprobe: int,
):
    """(query_id, _cell) — one row per (query, probed cell): the query's
    ``nprobe`` nearest cells by cosine (desc, ties → lower cell id),
    computed in ONE Arrow-batched numpy kernel.

    The Column-expression formulation (:func:`ivf_cells_expr`) builds a
    k×dim literal HOF tree whose Catalyst analysis + codegen alone was
    MEASURED at ~27 s per fresh query at the default 16×64 geometry —
    a fixed planning tax every serve call pays regardless of row count
    (5 probe rows). The kernel computes the same cosines with the same
    sequential-accumulation contract (functions/vectors._batch_cosines —
    the audited corpus-side cell path of ``pq_encode``) and the same
    (cosine desc, cell asc) tie order via a stable lexsort, so oracles
    replay it identically; plan cost is one small MapInPandas."""
    import numpy as np
    import pandas as pd

    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        _batch_cosines,
        _seq_norms,
    )

    cents = np.asarray(centroids, dtype=np.float64)
    cnorms = np.asarray(_seq_norms(centroids))
    # nprobe > k cells degrades to probing every cell (the graceful
    # ivf_cells_expr behavior) — unclamped, repeat(nprobe) would yield
    # n*nprobe ids against n*k cells and crash the kernel.
    nprobe = min(nprobe, len(cents))
    id_ddl = queries.schema[query_id].dataType.simpleString()
    schema = f"{query_id} {id_ddl}, _cell int"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            cos = _batch_cosines(x, cents, cnorms)
            # nprobe nearest by (cosine desc, cell asc): argsort on the
            # negated cosines is stable-ascending, ties keep cell order.
            order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    query_id: pdf[query_id].values.repeat(order.shape[1]),
                    "_cell": order.astype("int32").reshape(-1),
                }
            )

    return queries.select(query_id, vec_col).mapInPandas(kernel, schema)


def ivf_cells_expr(vec, centroids: list[list[float]], n: int) -> Column:
    """The ``n`` nearest cell ids to ``vec`` by cosine (desc, ties → lower
    cell id), as a pure Column expression over literal centroids.

    This is the serve-from-a-frozen-model path: at 100 TB you train the
    coarse quantizer once (``ivf_index`` on a sample), freeze the k
    centroids, and assign/probe with THIS expression — the k×dim literal
    rides the plan into every executor, so assignment is part of the scan
    projection: no crossJoin, no shuffle, no per-row Python."""
    scored = F.array(*[
        F.struct(
            (-cosine(vec, F.lit(c))).alias("neg"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ])
    return F.transform(
        F.slice(F.array_sort(scored), 1, n), lambda s: s["cell"]
    )


def ivf_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF top-k against FROZEN centroids (train-once / serve-many).

    Deterministic end-to-end given the centroid literals — assignment,
    probing, scoring, and ranking are all replayable in SQL, which is what
    lets the registry gate hash-match a DuckDB oracle (unlike the sampled
    k-means inside ``ivf_topk``). Plan shape: corpus scan with the cell
    argmax fused in ONE Arrow kernel (``nearest_fixed_vector`` — the
    K×D-literal expression tree is both the Janino interpreted-fallback
    shape at corpus scale AND, measured round 10, ~27 s of fixed
    analysis+codegen tax even on a 5-row query frame) → equi-join
    against the broadcast (query × nprobe) probe set (its cells from the
    same-contract ``ivf_probe_cells`` kernel) → cosine → per-query top-k
    window. The only shuffle is the final top-k."""
    from flink_1_3_2_hopsworks_spark.functions.vectors import (
        nearest_fixed_vector,
    )

    c = nearest_fixed_vector(
        corpus.select(F.col(id_col), F.col(vec_col).alias("_cv")),
        "_cv",
        centroids,
    )
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv")
    ).join(
        ivf_probe_cells(queries, query_id, vec_col, centroids, nprobe),
        query_id,
    )
    # Same norm hoist as ivf_probe_topk: one norm per corpus vector / per
    # probe row instead of two interpreted aggregations per candidate.
    scored = (
        c.withColumn("_cn", norm(F.col("_cv")))
        .join(F.broadcast(q.withColumn("_qn", norm(F.col("_qv")))), "_cell")
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn(
            "cosine",
            cosine_with_norms(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, F.round("cosine", 4).alias("cosine"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
    num_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """End-to-end convenience (build + probe in one call) — same signature
    family as lsh_topk. For repeated querying, build ``ivf_index`` once,
    persist it partitioned by ``_cell``, and call ``ivf_probe_topk``."""
    index, centroids = ivf_index(
        corpus, id_col, vec_col, num_cells=num_cells, seed=seed
    )
    return ivf_probe_topk(
        index, centroids, queries, id_col, vec_col, k=k, nprobe=nprobe,
        query_id=query_id,
    )
