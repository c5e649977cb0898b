"""Tests for hybrid retrieval: reciprocal-rank fusion (similarity/hybrid.py)
and the BM25 self-exclusion convention it builds on."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.similarity.bm25 import bm25_topk
from flink_1_3_2_hopsworks_spark.similarity.hybrid import rrf_fuse

SF = "/root/testdata/sf0.001"


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank int"
    )


def test_rrf_score_is_sum_of_reciprocal_ranks(spark):
    a = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranked(spark, [(1, 10, 3), (1, 12, 1)])
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], id_col="doc_id").collect()
    }
    assert out[10] == (round(round(1 / 61, 6) + round(1 / 63, 6), 6), 2)
    assert out[11] == (round(1 / 62, 6), 1)
    assert out[12] == (round(1 / 61, 6), 1)


def test_rrf_doc_in_both_lists_outranks_single_list_winner(spark):
    """Rank 2 in BOTH lists (2/62) beats rank 1 in one list (1/61) —
    the consensus property that makes RRF the standard fusion."""
    a = _ranked(spark, [(1, 10, 1), (1, 99, 2)])
    b = _ranked(spark, [(1, 20, 1), (1, 99, 2)])
    top = rrf_fuse([a, b], id_col="doc_id", k=1).collect()[0]
    assert top["doc_id"] == 99 and top["n_lists"] == 2


def test_rrf_ties_break_by_id_and_ranks_are_dense(spark):
    a = _ranked(spark, [(1, 30, 1), (1, 20, 2), (2, 5, 1)])
    b = _ranked(spark, [(1, 40, 1), (1, 20, 2), (2, 6, 1)])
    rows = rrf_fuse([a, b], id_col="doc_id").orderBy(
        "query_id", "rank"
    ).collect()
    q1 = [(r["doc_id"], r["rank"]) for r in rows if r["query_id"] == 1]
    # 20 contributes 2/62 > 1/61; 30 and 40 tie at 1/61 -> id asc.
    assert q1 == [(20, 1), (30, 2), (40, 3)]
    q2 = [(r["doc_id"], r["rank"]) for r in rows if r["query_id"] == 2]
    assert q2 == [(5, 1), (6, 2)]


def test_rrf_k_caps_each_query_independently(spark):
    a = _ranked(spark, [(1, i, i) for i in range(1, 6)])
    b = _ranked(spark, [(2, i, i) for i in range(1, 3)])
    out = rrf_fuse([a, b], id_col="doc_id", k=3)
    counts = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 3, 2: 2}


def test_bm25_exclude_self_drops_query_doc_with_dense_ranks(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "alpha epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    queries = docs.filter(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    out = bm25_topk(
        docs, queries, "doc_id", "text", k=3, exclude_self=True
    ).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert 1 not in ids and ids == [2, 3]
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_hybrid_gate_shape_and_consensus(spark):
    from flink_1_3_2_hopsworks_spark.similarity.showcase import (
        sim_hybrid_rrf_topk,
    )

    rows = sim_hybrid_rrf_topk(spark, SF).collect()
    assert rows, "hybrid gate returned no rows"
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 10 and r["n_lists"] in (1, 2)
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_hybrid_gate_matches_underlying_retrievers(spark):
    """Every fused doc must appear in at least one of the two top-10
    lists, and any doc in both lists must carry n_lists == 2."""
    from flink_1_3_2_hopsworks_spark.similarity.knn import brute_force_topk
    from flink_1_3_2_hopsworks_spark.similarity.showcase import (
        _queries_from_corpus,
        sim_hybrid_rrf_topk,
    )

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    probes = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    lex = {
        (r["query_id"], r["doc_id"])
        for r in bm25_topk(
            docs, probes, "doc_id", "text", k=10, exclude_self=True
        ).collect()
    }
    sem = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(
            emb, _queries_from_corpus(emb), "vec_id", "embedding", k=10
        ).collect()
    }
    for r in sim_hybrid_rrf_topk(spark, SF).collect():
        key = (r["query_id"], r["doc_id"])
        assert key in lex or key in sem
        assert r["n_lists"] == (int(key in lex) + int(key in sem))
