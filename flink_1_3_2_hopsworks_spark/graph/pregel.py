"""Graph algorithms as DataFrame Pregel (Gelly subset).

Reference parity: flink-gelly Graph.java (degrees, subgraph) and its
iteration models (pregel/VertexCentricIteration, spargel/ScatterGather,
gsa/GatherSumApply) built on DataSet delta iterations; library algos
library/{PageRank,ConnectedComponents,SingleSourceShortestPaths}.java.

Spark-first mapping (GraphFrames pattern): vertices/edges are DataFrames;
each superstep is  messages = edges ⋈ state → aggregate by dst → merge into
state  — driver-loop with ``localCheckpoint`` per round (lineage truncation),
exactly the ``operators.iterate`` helpers.

Scale notes: state and edges shuffle on vertex id each round; pre-partition
both on id (``repartition(id)``) so the join co-locates; for billion-edge
graphs use delta-style convergence (only changed vertices emit) — done here
for CC/SSSP, matching the reference's workset semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_1_3_2_hopsworks_spark.operators.iterate import iterate, materialize


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Per-vertex out/in degree (reference Graph#outDegrees/#inDegrees).

    Pass ``vertices`` (an ``id`` column) to compute over an explicit vertex
    set — edge-less vertices then appear with degree 0, matching Gelly's
    coGroup-with-vertices semantics; default derives the set from the edge
    endpoints."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    base = (
        vertices.select("id") if vertices is not None else vertices_from_edges(edges)
    )
    return (
        base.join(out_d, "id", "left")
        .join(in_d, "id", "left")
        .fillna(0, ["out_degree", "in_degree"])
    )


def subgraph(
    vertices: DataFrame, edges: DataFrame, vertex_pred, edge_pred
) -> DataFrame:
    """Edge set induced by vertex+edge predicates (reference Graph#subgraph)."""
    keep = vertices.filter(vertex_pred).select("id")
    return (
        edges.filter(edge_pred)
        .join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )


def connected_components(edges: DataFrame, max_iterations: int = 20) -> DataFrame:
    """Label-propagation CC (reference library/ConnectedComponents.java):
    every vertex adopts the min component id among itself and neighbors,
    iterated to fixpoint. Undirected semantics via symmetrized edges.

    The symmetrized edge list is pinned ONCE (``materialize``) before the
    loop: ``edges`` may be an arbitrarily expensive upstream plan (the
    near-dedup pipeline feeds MinHash-LSH pairs in here) and every
    superstep joins it — without the pin each superstep re-ran the whole
    pair generation."""
    # Symmetrize via explode, not self-union: a union's branches each
    # re-execute the source plan, doubling the (possibly expensive)
    # upstream even inside the single pin job.
    sym = materialize(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("_e")
        ).select("_e.src", "_e.dst")
    )
    # Vertex set from the pinned sym (every endpoint appears as src there),
    # so init doesn't re-execute the upstream edge plan either.
    init = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        msgs = (
            sym.join(state, sym.src == state.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("msg"))
        )
        # `_changed` = a strictly smaller neighbor min arrived (NULL msg →
        # NULL → not counted). Convergence is read off the superstep's own
        # checkpoint action via iterate(changed_col=...) — the pre-r13
        # prev⋈curr isEmpty comparison was a second full job per superstep
        # (guide §5; measured in the ingest-epoch CC tail).
        return (
            state.join(msgs, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("msg", F.col("component"))
                ).alias("component"),
                (F.col("msg") < F.col("component")).alias("_changed"),
            )
        )

    return iterate(init, step, max_iterations, changed_col="_changed")


def pagerank(
    edges: DataFrame, iterations: int = 15, damping: float = 0.85
) -> DataFrame:
    """PageRank (reference library/PageRank.java): power iteration with
    uniform teleport; dangling mass redistributed uniformly so ranks sum
    to 1.

    Loop-invariant frames (edges, vertex set, out-degrees) are pinned once
    — each superstep joins all three, and an unpinned upstream plan would
    re-execute per superstep."""
    edges = materialize(edges.select("src", "dst"))
    verts = materialize(vertices_from_edges(edges))
    n = verts.count()
    out_deg = materialize(
        edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    )
    init = verts.select("id", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, i: int) -> DataFrame:
        with_deg = state.join(out_deg, "id", "left")
        # Dangling mass rides as a broadcast ONE-ROW aggregate cross-joined
        # into the superstep plan (the HITS pattern, graph/library.py) —
        # no per-iteration driver collect/sync; the only action in the loop
        # is iterate()'s localCheckpoint. `or 0.0` semantics (empty/NULL
        # sum) via coalesce.
        dangling_agg = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        contrib = (
            edges.join(with_deg.filter(F.col("deg").isNotNull()), edges.src == F.col("id"))
            .select(
                F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c")
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        base = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * F.col("_dangling") / F.lit(float(n))
        )
        return (
            verts.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling_agg))
            .select(
                "id",
                (base + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias("rank"),
            )
        )

    return iterate(init, step, iterations)


def sssp(edges: DataFrame, source, weight_col: str = "weight",
         max_iterations: int = 20) -> DataFrame:
    """Single-source shortest paths (reference library/
    SingleSourceShortestPaths.java — scatter-gather relaxation to fixpoint)."""
    if weight_col not in edges.columns:
        edges = edges.withColumn(weight_col, F.lit(1.0))
    # Pin the loop-invariant edge list: every relaxation round joins it.
    edges = materialize(edges.select("src", "dst", weight_col))
    init = vertices_from_edges(edges).select(
        "id",
        F.when(F.col("id") == source, 0.0).otherwise(float("inf")).alias("distance"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        relaxed = (
            edges.join(state, edges.src == state.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("distance") + F.col(weight_col)).alias("cand"),
            )
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        # `_changed` = a strictly shorter candidate arrived; convergence
        # rides the checkpoint action (iterate changed_col — one job per
        # relaxation round instead of two).
        return state.join(relaxed, "id", "left").select(
            "id",
            F.least(F.col("distance"), F.coalesce("cand", F.col("distance"))).alias(
                "distance"
            ),
            (F.col("cand") < F.col("distance")).alias("_changed"),
        )

    return iterate(init, step, max_iterations, changed_col="_changed")
