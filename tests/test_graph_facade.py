"""Gelly Graph facade tests (graph/graph.py): transforms, set ops,
orientation, degrees, joinWith* — the reference Graph.java surface."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.graph.graph import Graph


def _g(spark, rows, weighted=False):
    schema = "src long, dst long" + (", value double" if weighted else "")
    return Graph.from_edges(spark.createDataFrame(rows, schema))


def test_from_edges_induces_vertices(spark):
    g = _g(spark, [(1, 2), (2, 3)])
    assert sorted(r["id"] for r in g.vertices.collect()) == [1, 2, 3]
    assert g.number_of_vertices() == 3 and g.number_of_edges() == 2


def test_map_vertices_and_edges(spark):
    g = _g(spark, [(1, 2, 5.0)], weighted=True)
    g2 = g.map_vertices(F.col("id") * 10).map_edges(F.col("value") + 1)
    assert {r["id"]: r["value"] for r in g2.vertices.collect()} == {1: 10, 2: 20}
    assert g2.edges.collect()[0]["value"] == 6.0


def test_subgraph_filters_both(spark):
    g = _g(spark, [(1, 2, 1.0), (2, 3, 9.0), (3, 4, 1.0)], weighted=True)
    sub = g.subgraph(F.col("id") <= 3, F.col("value") < 5)
    assert sorted((r["src"], r["dst"]) for r in sub.edges.collect()) == [(1, 2)]
    assert sorted(r["id"] for r in sub.vertices.collect()) == [1, 2, 3]


def test_union_difference_intersect(spark):
    a = _g(spark, [(1, 2), (2, 3)])
    b = _g(spark, [(2, 3), (3, 4)])
    assert a.union(b).number_of_vertices() == 4
    assert a.union(b).number_of_edges() == 4  # bag union keeps the dup edge
    diff = a.difference(b)  # drops vertices 2,3,4 and incident edges
    assert sorted(r["id"] for r in diff.vertices.collect()) == [1]
    assert diff.number_of_edges() == 0
    inter = a.intersect(b)
    assert [(r["src"], r["dst"]) for r in inter.edges.collect()] == [(2, 3)]


def test_reverse_and_undirected(spark):
    g = _g(spark, [(1, 2)])
    assert [(r["src"], r["dst"]) for r in g.reverse().edges.collect()] == [(2, 1)]
    und = g.get_undirected()
    assert sorted((r["src"], r["dst"]) for r in und.edges.collect()) == [
        (1, 2),
        (2, 1),
    ]


def test_degrees(spark):
    g = _g(spark, [(1, 2), (1, 3), (3, 1)])
    out_d = {r["id"]: r["out_degree"] for r in g.out_degrees().collect()}
    assert out_d == {1: 2, 2: 0, 3: 1}
    total = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert total == {1: 3, 2: 1, 3: 2}


def test_degrees_include_isolated_vertices(spark):
    # A vertex with no incident edges (here: kept by filter_on_vertices
    # after its edges are dropped) must appear with degree 0, matching
    # Gelly's coGroup-with-vertex-set semantics.
    g = _g(spark, [(1, 2), (3, 4)]).filter_on_vertices(F.col("id") != 4)
    out_d = {r["id"]: r["out_degree"] for r in g.out_degrees().collect()}
    assert out_d == {1: 1, 2: 0, 3: 0}
    total = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert total == {1: 1, 2: 1, 3: 0}


def test_union_prefers_self_vertex_value(spark):
    va = spark.createDataFrame([(1, "a1"), (2, "a2")], "id long, value string")
    vb = spark.createDataFrame([(2, "b2"), (3, "b3")], "id long, value string")
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    u = Graph(va, e).union(Graph(vb, e))
    got = {r["id"]: r["value"] for r in u.vertices.collect()}
    assert got == {1: "a1", 2: "a2", 3: "b3"}  # self wins on collision


def test_intersect_keys_on_edge_value(spark):
    a = _g(spark, [(1, 2, 1.0), (2, 3, 5.0)], weighted=True)
    b = _g(spark, [(1, 2, 1.0), (2, 3, 9.0)], weighted=True)
    inter = a.intersect(b)  # (2,3) differs in value → excluded
    assert [(r["src"], r["dst"], r["value"]) for r in inter.edges.collect()] == [
        (1, 2, 1.0)
    ]
    assert sorted(r["id"] for r in inter.vertices.collect()) == [1, 2]


def test_join_with_vertices_keeps_unmatched(spark):
    g = _g(spark, [(1, 2)]).map_vertices(F.lit(0.0))
    inputs = spark.createDataFrame([(1, 7.0)], "id long, bonus double")
    g2 = g.join_with_vertices(inputs, F.col("value") + F.col("bonus"))
    assert {r["id"]: r["value"] for r in g2.vertices.collect()} == {1: 7.0, 2: 0.0}


def test_join_with_edges(spark):
    g = _g(spark, [(1, 2, 1.0), (2, 3, 1.0)], weighted=True)
    inputs = spark.createDataFrame([(1, 2, 10.0)], "src long, dst long, w double")
    g2 = g.join_with_edges(inputs, F.col("value") * F.col("w"))
    got = {(r["src"], r["dst"]): r["value"] for r in g2.edges.collect()}
    assert got == {(1, 2): 10.0, (2, 3): 1.0}
