"""IVF ANN tests: recall against the exact baseline, candidate validity,
and the index/probe split (the persist-once-query-many path)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.similarity.ivf import (
    ivf_index,
    ivf_probe_topk,
    ivf_topk,
)
from flink_1_3_2_hopsworks_spark.similarity.knn import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_ivf_recall_vs_bruteforce(emb, queries):
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(
            emb, queries, "vec_id", "embedding", k=10, num_cells=8, nprobe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing half the cells of a k-means partition: recall well above chance
    assert recall >= 0.5, f"recall {recall:.2f}"


def test_ivf_scores_match_exact_for_found_pairs(emb, queries):
    """Approximation may MISS neighbors but must never mis-score one: any
    (query, id) pair the IVF path returns carries the exact cosine."""
    exact = {
        (r.query_id, r.vec_id): r.cosine
        for r in brute_force_topk(emb, queries, "vec_id", "embedding", k=50).collect()
    }
    for r in ivf_topk(
        emb, queries, "vec_id", "embedding", k=10, num_cells=8, nprobe=4
    ).collect():
        key = (r.query_id, r.vec_id)
        if key in exact:
            assert abs(r.cosine - exact[key]) < 1e-6


def test_ivf_index_probe_split(emb, queries):
    """ivf_index once + ivf_probe_topk equals the end-to-end call (same
    seed), and every corpus row lands in exactly one cell."""
    index, centroids = ivf_index(emb, "vec_id", "embedding", num_cells=8, seed=42)
    assert index.count() == emb.count()
    assert centroids.count() == 8
    assert index.select("_cell").distinct().count() <= 8

    via_split = ivf_probe_topk(
        index, centroids, queries, "vec_id", "embedding", k=5, nprobe=3
    )
    via_e2e = ivf_topk(
        emb, queries, "vec_id", "embedding", k=5, num_cells=8, nprobe=3, seed=42
    )
    assert sorted(map(tuple, via_split.collect())) == sorted(
        map(tuple, via_e2e.collect())
    )


def test_ivf_fixed_full_probe_equals_exact(emb, queries):
    """ivf_fixed_topk with nprobe = num_cells covers every cell, so it must
    reproduce the exact brute-force top-k regardless of centroid quality."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import FROZEN_CENTROIDS
    from flink_1_3_2_hopsworks_spark.similarity.ivf import ivf_fixed_topk

    exact = sorted(
        map(tuple, brute_force_topk(emb, queries, "vec_id", "embedding", k=10).collect())
    )
    full = sorted(
        map(
            tuple,
            ivf_fixed_topk(
                emb, queries, FROZEN_CENTROIDS, "vec_id", "embedding",
                k=10, nprobe=len(FROZEN_CENTROIDS),
            ).collect(),
        )
    )
    assert full == exact


def test_ivf_fixed_assignment_is_shuffle_free(emb):
    """Frozen-centroid cell assignment must be a scan-side projection:
    no Exchange in the plan before any join/window stage."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import FROZEN_CENTROIDS
    from flink_1_3_2_hopsworks_spark.similarity.ivf import ivf_cells_expr

    assigned = emb.select(
        "vec_id", ivf_cells_expr(F.col("embedding"), FROZEN_CENTROIDS, 1)[0].alias("_cell")
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivf_partitioned_index_prunes_to_probed_cells(emb, queries, spark, tmp_path):
    """Persisting the index partitioned by _cell makes partition pruning the
    inverted file: a candidate read for the probed cells must scan only
    those directories (PartitionFilters on _cell, pruned partition count)."""
    from flink_1_3_2_hopsworks_spark.sources.io import write_partitioned

    index, centroids = ivf_index(emb, "vec_id", "embedding", num_cells=8, seed=42)
    path = str(tmp_path / "ivf_index")
    write_partitioned(index, path, ["_cell"])

    stored = spark.read.parquet(path)
    n_cells = stored.select("_cell").distinct().count()
    probe_cells = [0, 1, 2]
    candidates = stored.filter(F.col("_cell").isin(probe_cells))
    plan = candidates._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan.split("PartitionFilters")[1][:200]
    # pruned read touches exactly the probed directories (input_file_name
    # reflects post-pruning scanned files, unlike DataFrame.inputFiles)
    scanned = [
        r[0] for r in candidates.select(F.input_file_name()).distinct().collect()
    ]
    cells_touched = {f.split("_cell=")[1].split("/")[0] for f in scanned}
    assert cells_touched <= {str(c) for c in probe_cells}
    assert len(cells_touched) < n_cells


def test_ivf_more_probes_more_recall(emb, queries):
    """nprobe = num_cells degenerates to exact search (full coverage)."""
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, "vec_id", "embedding", k=10).collect()
    }
    full = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(
            emb, queries, "vec_id", "embedding", k=10, num_cells=8, nprobe=8
        ).collect()
    }
    assert full == exact


def test_ivf_probe_cells_clamps_nprobe_past_centroid_count(spark):
    """r11 advice: nprobe > len(centroids) must degrade gracefully to
    probing every cell (the old ivf_cells_expr behavior), not crash the
    kernel with a pandas length mismatch."""
    from flink_1_3_2_hopsworks_spark.similarity.ivf import ivf_probe_cells

    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    q = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [-0.5, 0.5])],
        "qid long, vec array<double>",
    )
    rows = ivf_probe_cells(q, "qid", "vec", cents, nprobe=10).collect()
    got = {}
    for r in rows:
        got.setdefault(r["qid"], []).append(r["_cell"])
    # every query probes ALL 3 cells, nearest first
    assert sorted(got[1]) == [0, 1, 2] and got[1][0] == 0
    assert sorted(got[2]) == [0, 1, 2] and got[2][0] == 1
