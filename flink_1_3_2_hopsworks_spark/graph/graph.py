"""Gelly Graph facade: the reference's graph-transform surface.

Reference parity: flink-gelly graph/Graph.java — construction from
vertex/edge DataSets, ``mapVertices/mapEdges``, ``subgraph`` +
``filterOnVertices/filterOnEdges``, set ops (``union/difference/
intersect``), ``reverse``, ``getUndirected``, degree accessors, and
``joinWithVertices`` / ``joinWithEdges``. Each transform is one or two
DataFrame expressions — Catalyst owns the plan; nothing here shuffles
beyond what the underlying relational op requires.

Schema contract: vertices (id, value?), edges (src, dst, value?). The
iterative models live in graph/models.py and the algorithm library in
graph/library.py / graph/pregel.py — this class is the fluent entry the
reference programs expect.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_3_2_hopsworks_spark.graph.pregel import (
    degrees as _degrees,
    vertices_from_edges,
)


class Graph:
    """Immutable (vertices, edges) pair with Gelly's transform surface."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        self.vertices = vertices
        self.edges = edges

    # -- construction (reference Graph.fromDataSet / fromCollection) -------

    @classmethod
    def from_edges(cls, edges: DataFrame) -> "Graph":
        """Vertices induced from the edge endpoints (reference
        Graph.fromDataSet(edges, env))."""
        return cls(vertices_from_edges(edges), edges)

    # -- transforms (reference mapVertices / mapEdges) ----------------------

    def map_vertices(self, value: Column, value_col: str = "value") -> "Graph":
        """New per-vertex value from an expression over the vertex row."""
        keep = [c for c in self.vertices.columns if c != value_col and c != "id"]
        return Graph(
            self.vertices.select("id", *keep, value.alias(value_col)), self.edges
        )

    def map_edges(self, value: Column, value_col: str = "value") -> "Graph":
        keep = [
            c for c in self.edges.columns if c not in ("src", "dst", value_col)
        ]
        return Graph(
            self.vertices,
            self.edges.select("src", "dst", *keep, value.alias(value_col)),
        )

    # -- filters (reference subgraph / filterOnVertices / filterOnEdges) ----

    def filter_on_vertices(self, pred: Column) -> "Graph":
        keep = self.vertices.filter(pred)
        ids = keep.select("id")
        edges = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        return Graph(keep, edges)

    def filter_on_edges(self, pred: Column) -> "Graph":
        return Graph(self.vertices, self.edges.filter(pred))

    def subgraph(self, vertex_pred: Column, edge_pred: Column) -> "Graph":
        return self.filter_on_vertices(vertex_pred).filter_on_edges(edge_pred)

    # -- set ops (reference union / difference / intersect) -----------------

    def union(self, other: "Graph") -> "Graph":
        """Union of vertex and edge sets (reference Graph#union: distinct
        vertices, bag-union edges).

        Divergence note: Gelly distincts vertices on the whole (id, value)
        row, so an id present in both graphs with different values yields
        two vertices. Here an id appears once, and ``self``'s row wins
        deterministically (anti-join keeps only ``other``'s new ids) —
        nondeterministic dropDuplicates survival would break repeatable
        plans at scale. Each input is also deduped on id so the result
        upholds the distinct-vertex-id invariant even for hand-built
        inputs."""
        mine = self.vertices.dropDuplicates(["id"])
        new_ids = other.vertices.dropDuplicates(["id"]).join(
            mine.select("id"), "id", "left_anti"
        )
        return Graph(
            mine.unionByName(new_ids),
            self.edges.unionByName(other.edges),
        )

    def difference(self, other: "Graph") -> "Graph":
        """Remove ``other``'s vertices (and their incident edges) —
        reference Graph#difference."""
        drop = other.vertices.select("id")
        keep = self.vertices.join(drop, "id", "left_anti")
        ids = keep.select("id")
        edges = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )
        return Graph(keep, edges)

    def intersect(self, other: "Graph") -> "Graph":
        """Edges present in both graphs (reference Graph#intersect with
        distinct edges); vertices induced. Gelly pairs edges on
        (src, dst, value), so the intersect key is every column the two
        edge sets share — edge values included — not just the endpoints."""
        key = [c for c in self.edges.columns if c in set(other.edges.columns)]
        common = self.edges.select(*key).intersect(other.edges.select(*key))
        return Graph(vertices_from_edges(common), common)

    # -- orientation (reference reverse / getUndirected) --------------------

    def reverse(self) -> "Graph":
        swapped = self.edges.withColumnRenamed("src", "_t").withColumnRenamed(
            "dst", "src"
        ).withColumnRenamed("_t", "dst")
        return Graph(self.vertices, swapped.select(self.edges.columns))

    def get_undirected(self) -> "Graph":
        """Add the reversed copy of every edge (reference Graph#getUndirected)."""
        return Graph(
            self.vertices, self.edges.unionByName(self.reverse().edges)
        )

    # -- degrees (reference inDegrees / outDegrees / getDegrees) ------------

    def _vertex_degrees(self) -> DataFrame:
        """Degrees over the FULL vertex set: the reference coGroups edges
        with vertices and emits 0 for edge-less vertices (Gelly
        Graph#outDegrees/#inDegrees), so isolated vertices — e.g. after
        filter_on_vertices or union — must not vanish."""
        return _degrees(self.edges, self.vertices)

    def out_degrees(self) -> DataFrame:
        return self._vertex_degrees().select("id", "out_degree")

    def in_degrees(self) -> DataFrame:
        return self._vertex_degrees().select("id", "in_degree")

    def degrees(self) -> DataFrame:
        return self._vertex_degrees().select(
            "id", (F.col("in_degree") + F.col("out_degree")).alias("degree")
        )

    # -- joins (reference joinWithVertices / joinWithEdges) -----------------

    def join_with_vertices(
        self, inputs: DataFrame, merge: Column, value_col: str = "value"
    ) -> "Graph":
        """Merge an (id, <other cols>) DataFrame into the vertex values;
        ``merge`` is an expression over the joined row. Vertices without a
        match keep their value (reference joinWithVertices semantics)."""
        joined = self.vertices.join(inputs, "id", "left")
        keep = [c for c in self.vertices.columns if c not in ("id", value_col)]
        return Graph(
            joined.select(
                "id",
                *keep,
                F.coalesce(merge, F.col(value_col)).alias(value_col),
            ),
            self.edges,
        )

    def join_with_edges(
        self, inputs: DataFrame, merge: Column, value_col: str = "value"
    ) -> "Graph":
        """Merge a (src, dst, <other cols>) DataFrame into edge values."""
        joined = self.edges.join(inputs, ["src", "dst"], "left")
        keep = [
            c for c in self.edges.columns if c not in ("src", "dst", value_col)
        ]
        return Graph(
            self.vertices,
            joined.select(
                "src",
                "dst",
                *keep,
                F.coalesce(merge, F.col(value_col)).alias(value_col),
            ),
        )

    # -- stats (reference numberOfVertices / numberOfEdges) -----------------

    def number_of_vertices(self) -> int:
        return self.vertices.count()

    def number_of_edges(self) -> int:
        return self.edges.count()
