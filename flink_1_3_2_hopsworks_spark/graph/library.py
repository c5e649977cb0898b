"""Gelly library algorithms beyond the core Pregel set (§2.12).

Reference parity: flink-gelly library/{LabelPropagation, TriangleEnumerator,
HITS, JaccardIndex, AdamicAdar, ClusteringCoefficient, Summarization}.java.

Spark-first mapping: everything except the two iterative algorithms
(label propagation, HITS) is PURE relational algebra — self-joins on a
canonicalized edge list — which Catalyst plans as shuffle joins with
pushed-down projections; no driver loop, no UDFs. The iterative pair reuses
the ``operators.iterate`` driver loop (localCheckpoint per round) like
graph/pregel.py.

Scale notes: neighbor-pair enumeration (Jaccard/Adamic-Adar/triangles) is
quadratic in per-vertex degree — the classic skew hazard. The reference
caps it the same way published triangle-listing does: canonical ordering
(src < dst) so each wedge is generated once, from its lowest-degree...
smallest-id endpoint; AQE skew-join handles residual hot vertices.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_3_2_hopsworks_spark.graph.pregel import vertices_from_edges
from flink_1_3_2_hopsworks_spark.operators.iterate import iterate, materialize


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrized (undirected) edge list, self-loops dropped. Explode, not
    self-union — a union's branches each re-execute the source plan."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src").alias("src"), F.col("dst").alias("dst")),
                    F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edges as src < dst (one row per edge)."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def label_propagation(
    edges: DataFrame, labels: DataFrame | None = None, iterations: int = 10
) -> DataFrame:
    """Community detection by label propagation (reference
    library/LabelPropagation.java): each vertex adopts the most frequent
    label among its neighbors (ties → smallest label), for a fixed number
    of supersteps. ``labels``: optional (id, label) seed — defaults to
    label = id."""
    # Pin the loop-invariant symmetrized edge list (see pregel.connected_
    # components): unpinned, every superstep re-executes the upstream plan.
    sym = materialize(_sym(edges))
    init = (
        labels.select("id", "label")
        if labels is not None
        else vertices_from_edges(edges).select("id", F.col("id").alias("label"))
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        votes = (
            sym.join(state, sym.src == state.id)
            .select(F.col("dst").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # max count, ties broken by smallest label: max(struct(cnt, -label)).
        best = votes.groupBy("id").agg(
            (-F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg")))["neg"]).alias(
                "msg"
            )
        )
        return state.join(best, "id", "left").select(
            "id", F.coalesce("msg", "label").alias("label")
        )

    return iterate(init, step, iterations)


def triangle_enumerate(edges: DataFrame) -> DataFrame:
    """All triangles as (a, b, c), a < b < c (reference
    library/TriangleEnumerator.java): wedge join on canonical edges —
    each triangle emitted exactly once."""
    e = _canonical(edges)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle membership count (reference TriangleCount)."""
    tris = triangle_enumerate(edges)
    ids = (
        tris.select(F.col("a").alias("id"))
        .unionAll(tris.select(F.col("b").alias("id")))
        .unionAll(tris.select(F.col("c").alias("id")))
    )
    counted = ids.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        vertices_from_edges(edges)
        .join(counted, "id", "left")
        .fillna(0, ["triangles"])
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient (reference
    library/LocalClusteringCoefficient): triangles_at_v / (deg·(deg−1)/2)
    over the undirected graph."""
    sym_deg = _sym(edges).groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    return (
        triangle_count_per_vertex(edges)
        .join(sym_deg, "id", "left")
        .select(
            "id",
            "triangles",
            F.coalesce("deg", F.lit(0)).alias("degree"),
            F.when(
                F.col("deg") >= 2,
                2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(0.0)
            .alias("coefficient"),
        )
    )


def _shared_neighbors(edges: DataFrame) -> DataFrame:
    """(u, v, w): u < v both adjacent to shared neighbor w (undirected)."""
    sym = _sym(edges)
    left = sym.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    right = sym.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    return left.join(right, "w").filter(F.col("u") < F.col("v"))


def jaccard_index(edges: DataFrame) -> DataFrame:
    """Neighborhood Jaccard similarity for every vertex pair sharing ≥1
    neighbor (reference library/similarity/JaccardIndex.java):
    |N(u)∩N(v)| / |N(u)∪N(v)|."""
    deg = _sym(edges).groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    shared = _shared_neighbors(edges).groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("shared")
    )
    return (
        shared.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            "shared",
            (
                F.col("shared")
                / (F.col("du") + F.col("dv") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
    )


def adamic_adar(edges: DataFrame) -> DataFrame:
    """Adamic-Adar link-prediction score (reference
    library/similarity/AdamicAdar.java): Σ_w 1/ln(deg(w)) over shared
    neighbors w (neighbors of degree 1 contribute nothing and are skipped
    — ln(1)=0 would divide by zero)."""
    deg = _sym(edges).groupBy(F.col("src").alias("w")).agg(
        F.count(F.lit(1)).alias("wdeg")
    )
    return (
        _shared_neighbors(edges)
        .join(deg, "w")
        .filter(F.col("wdeg") >= 2)
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("wdeg"))).alias("adamic_adar"))
    )


def hits(edges: DataFrame, iterations: int = 10) -> DataFrame:
    """HITS hubs & authorities (reference library/linkanalysis/HITS.java):
    auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} auth(v), each L1-normalized
    per half-step, on the DIRECTED graph."""
    edges = materialize(edges.select("src", "dst"))
    verts = materialize(vertices_from_edges(edges))
    init = verts.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))

    def _norm(raw: Column, total: Column) -> Column:
        # Mirror `collect()[0][0] or 1.0`: empty/zero L1 mass divides by 1.
        safe = F.when(total.isNull() | (total == 0.0), F.lit(1.0)).otherwise(total)
        return F.coalesce(raw, F.lit(0.0)) / safe

    def step(state: DataFrame, i: int) -> DataFrame:
        # Per-half-step L1 normalization rides as a broadcast ONE-ROW
        # aggregate cross-joined into the plan (the tfidf_top_terms pattern)
        # instead of a driver collect — the whole superstep is one lazy plan
        # and the only action is iterate()'s localCheckpoint, halving job
        # launches vs the two scalar collects it replaces.
        auth_new = (
            edges.join(state, edges.src == state.id)
            .select(F.col("dst").alias("id"), "hub")
            .groupBy("id")
            .agg(F.sum("hub").alias("auth_raw"))
        )
        auth_sum = auth_new.agg(F.sum("auth_raw").alias("_asum"))
        with_auth = (
            verts.join(auth_new, "id", "left")
            .crossJoin(F.broadcast(auth_sum))
            .select("id", _norm(F.col("auth_raw"), F.col("_asum")).alias("auth"))
        )
        hub_new = (
            edges.join(with_auth, edges.dst == with_auth.id)
            .select(F.col("src").alias("id"), "auth")
            .groupBy("id")
            .agg(F.sum("auth").alias("hub_raw"))
        )
        hub_sum = hub_new.agg(F.sum("hub_raw").alias("_hsum"))
        return (
            with_auth.join(hub_new, "id", "left")
            .crossJoin(F.broadcast(hub_sum))
            .select(
                "id",
                _norm(F.col("hub_raw"), F.col("_hsum")).alias("hub"),
                "auth",
            )
        )

    return iterate(init, step, iterations)


def summarize_graph(
    vertices: DataFrame, edges: DataFrame, group_col: str = "group"
) -> tuple[DataFrame, DataFrame]:
    """Structural graph summarization (reference library/Summarization.java):
    vertices grouped by ``group_col`` collapse into super-vertices; edges
    collapse into super-edges annotated with member counts."""
    v2g = vertices.select("id", group_col)
    super_vertices = v2g.groupBy(group_col).agg(F.count(F.lit(1)).alias("vertex_count"))
    super_edges = (
        edges.join(v2g.withColumnRenamed("id", "src").withColumnRenamed(group_col, "src_group"), "src")
        .join(v2g.withColumnRenamed("id", "dst").withColumnRenamed(group_col, "dst_group"), "dst")
        .groupBy("src_group", "dst_group")
        .agg(F.count(F.lit(1)).alias("edge_count"))
    )
    return super_vertices, super_edges


def k_core(edges: DataFrame, k: int, max_iterations: int = 60) -> DataFrame:
    """Vertices of the k-core — the maximal subgraph in which every vertex
    has undirected degree >= k — with their within-core degree.

    Native extra beyond the reference's Gelly library (the classic
    Matula–Beck peeling): repeatedly delete vertices of degree < k until
    none remain. Each round is two relational ops on the shrinking edge
    set — one explode + hash-aggregate for degrees, two semi-joins to drop
    edges touching a peeled vertex — driven by the ``operators.iterate``
    loop (localCheckpoint per round, early stop when no edge was removed).
    Work per round is proportional to the SURVIVING edge set, so total work
    is bounded by rounds × remaining edges — the peeling analogue of
    delta iterations, never a full-graph recompute.
    """

    def _degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.explode(F.array("src", "dst")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        kept = _degrees(state).filter(F.col("degree") >= k).select("id")
        return (
            state.join(kept.select(F.col("id").alias("src")), "src", "left_semi")
            .join(kept.select(F.col("id").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
        )

    def converged(prev: DataFrame, curr: DataFrame) -> bool:
        # Peeling is monotone (edges only leave) — same count ⇒ fixpoint.
        return prev.count() == curr.count()

    core_edges = iterate(_canonical(edges), step, max_iterations, converged)
    return _degrees(core_edges)
