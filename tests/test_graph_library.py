"""Gelly library algorithm tests (§2.12) on hand-checked mini-graphs."""

from __future__ import annotations

import math

import pytest

from flink_1_3_2_hopsworks_spark.graph.library import (
    adamic_adar,
    clustering_coefficient,
    hits,
    jaccard_index,
    label_propagation,
    summarize_graph,
    triangle_count_per_vertex,
    triangle_enumerate,
)

# Triangle 1-2-3, tail 3-4, separate pair 5-6 (undirected, listed once).
_EDGES = [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)]


def _edges(spark, rows=None):
    return spark.createDataFrame(rows or _EDGES, "src long, dst long")


def test_triangle_enumeration_and_counts(spark):
    e = _edges(spark)
    assert [tuple(r) for r in triangle_enumerate(e).collect()] == [(1, 2, 3)]
    got = {r["id"]: r["triangles"] for r in triangle_count_per_vertex(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0}


def test_clustering_coefficient(spark):
    got = {
        r["id"]: round(r["coefficient"], 4)
        for r in clustering_coefficient(_edges(spark)).collect()
    }
    # deg(1)=deg(2)=2 closed wedge → 1.0; deg(3)=3 with 1 triangle → 1/3.
    assert got[1] == 1.0 and got[2] == 1.0
    assert got[3] == round(1 / 3, 4)
    assert got[4] == 0.0 and got[5] == 0.0


def test_jaccard_index(spark):
    got = {
        (r["u"], r["v"]): (r["shared"], round(r["jaccard"], 4))
        for r in jaccard_index(_edges(spark)).collect()
    }
    assert got[(1, 2)] == (1, round(1 / 3, 4))  # share 3; deg 2+2
    assert got[(1, 3)] == (1, 0.25)  # share 2; deg 2+3
    assert got[(1, 4)] == (1, 0.5)  # share 3; deg 2+1
    assert (5, 6) not in got  # no shared neighbors


def test_adamic_adar(spark):
    got = {
        (r["u"], r["v"]): round(r["adamic_adar"], 6)
        for r in adamic_adar(_edges(spark)).collect()
    }
    assert got[(1, 2)] == round(1 / math.log(3), 6)  # via w=3 (deg 3)
    assert got[(1, 3)] == round(1 / math.log(2), 6)  # via w=2 (deg 2)
    # (5,6): no shared neighbor; degree-1 shared neighbors are skipped.
    assert (5, 6) not in got


def test_label_propagation_majority_vote(spark):
    # Star: center 1 with leaves 2,3,4; two leaves share label 7.
    e = _edges(spark, [(1, 2), (1, 3), (1, 4)])
    seeds = spark.createDataFrame(
        [(1, 1), (2, 7), (3, 7), (4, 9)], "id long, label long"
    )
    got = {
        r["id"]: r["label"]
        for r in label_propagation(e, seeds, iterations=1).collect()
    }
    assert got[1] == 7  # majority of neighbor labels {7,7,9}
    assert got[2] == 1 and got[3] == 1 and got[4] == 1  # leaves see only 1


def test_hits_hubs_and_authorities(spark):
    e = _edges(spark, [(1, 3), (2, 3)])
    got = {r["id"]: (round(r["hub"], 4), round(r["auth"], 4)) for r in hits(e, 3).collect()}
    assert got[3][1] == 1.0  # only authority
    assert got[1][0] == 0.5 and got[2][0] == 0.5  # symmetric hubs
    assert got[3][0] == 0.0 and got[1][1] == 0.0


def test_hits_no_driver_collects_per_superstep(spark, monkeypatch):
    """L1 normalization rides as a broadcast one-row aggregate inside the
    superstep plan — a superstep must not run scalar collect() actions (the
    only actions in the loop are iterate()'s localCheckpoints)."""
    from pyspark.sql import DataFrame

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    e = _edges(spark, [(1, 3), (2, 3)])
    result = hits(e, 3)
    assert calls["n"] == 0  # zero collects during plan construction
    got = {r["id"]: round(r["auth"], 4) for r in result.collect()}
    assert got[3] == 1.0


def test_pagerank_no_driver_collects_per_superstep(spark, monkeypatch):
    """Dangling mass rides as a broadcast one-row aggregate cross-joined
    into the superstep plan (same fix as HITS) — the supersteps must not
    run scalar collect() actions; the only driver sync in the loop is
    iterate()'s localCheckpoint."""
    from pyspark.sql import DataFrame

    from flink_1_3_2_hopsworks_spark.graph.pregel import pagerank

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    # Graph with a dangling vertex (3 has no out-edges) so the dangling
    # aggregate is genuinely non-zero every superstep.
    e = _edges(spark, [(1, 2), (1, 3), (2, 3)])
    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    ranks = pagerank(e, iterations=5)
    assert calls["n"] == 0  # no per-superstep driver sync
    got = {r["id"]: r["rank"] for r in ranks.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    assert got[3] > got[2] > got[1]


def test_summarize_graph(spark):
    verts = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, group string"
    )
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    sv, se = summarize_graph(verts, edges)
    assert {(r["group"], r["vertex_count"]) for r in sv.collect()} == {
        ("a", 2),
        ("b", 2),
    }
    got = {(r["src_group"], r["dst_group"]): r["edge_count"] for r in se.collect()}
    assert got == {("a", "a"): 1, ("a", "b"): 2, ("b", "b"): 1}


def test_k_core_cascading_peel(spark):
    """A tail path hanging off a triangle must peel away one hop per round
    (removing the leaf makes its neighbor a leaf) — the 2-core is exactly
    the triangle; a single-pass degree filter would keep tail vertices."""
    from flink_1_3_2_hopsworks_spark.graph.library import k_core

    edges = spark.createDataFrame(
        # triangle 1-2-3 with a path 3-4-5-6 hanging off
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "src long, dst long",
    )
    got = {(r["id"], r["degree"]) for r in k_core(edges, k=2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_k_core_empty_when_no_core(spark):
    """A tree has no 2-core — peeling must terminate with an empty result,
    not loop or error."""
    from flink_1_3_2_hopsworks_spark.graph.library import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    assert k_core(edges, k=2).count() == 0
