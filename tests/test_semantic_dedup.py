"""Round-6 SemDeDup semantic dedup — dedup/semantic.py."""

from __future__ import annotations

from flink_1_3_2_hopsworks_spark.dedup.semantic import (
    semantic_dedup,
    semantic_dup_pairs,
)

# Two well-separated directions; centroids frozen to match. Vectors 1,2,3
# cluster around +x (1~2 nearly parallel, 3 at an angle), 4,5 around +y
# (nearly parallel). Transitivity: 1~2 and 2~3 at 0.9 puts 1,2,3 in one
# group even though cos(1,3) < 0.9 is possible.
CENTROIDS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
VECS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.995, 0.1, 0.0]),
    (3, [0.96, 0.28, 0.0]),
    (4, [0.0, 1.0, 0.0]),
    (5, [0.1, 0.995, 0.0]),
    (6, [0.0, 0.0, 1.0]),  # own direction: no cell-mate above threshold
]


def _df(spark):
    return spark.createDataFrame(VECS, "id long, v array<double>")


def test_pairs_within_cell_only(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            _df(spark), "id", "v", CENTROIDS, threshold=0.9
        ).collect()
    }
    # 1-2, 2-3 similar within cell 0; 1-3 = cos 0.96 also >= 0.9; 4-5 in
    # cell 1. 6 sits in whichever cell wins but is near-orthogonal to all.
    assert (1, 2) in pairs and (4, 5) in pairs
    assert all(a < b for a, b in pairs)
    assert not any(6 in p for p in pairs)


def test_dedup_transitive_survivors(spark):
    got = {
        r["id"]: (r["canonical_id"], r["kept"])
        for r in semantic_dedup(
            _df(spark), "id", "v", CENTROIDS, threshold=0.9
        ).collect()
    }
    assert len(got) == 6  # one verdict per input doc
    # Cluster {1,2,3} keeps 1; cluster {4,5} keeps 4; 6 keeps itself.
    assert got[1] == (1, True)
    assert got[2] == (1, False) and got[3] == (1, False)
    assert got[4] == (4, True) and got[5] == (4, False)
    assert got[6] == (6, True)


def test_max_cell_cap_excludes_oversized_cells(spark):
    """An under-provisioned quantizer degrades to capped work: cells over
    max_cell emit no pairs (members keep themselves), smaller cells are
    untouched — mirroring minhash's max_bucket."""
    capped = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            _df(spark), "id", "v", CENTROIDS, threshold=0.9, max_cell=2
        ).collect()
    }
    # cell 0 holds {1,2,3} (+ possibly 6) > 2 -> excluded; cell 1 {4,5}
    # survives the cap.
    assert (4, 5) in capped
    assert not any(p[0] in (1, 2, 3) and p[1] in (1, 2, 3) for p in capped)

    verd = {
        r["id"]: (r["canonical_id"], r["kept"])
        for r in semantic_dedup(
            _df(spark), "id", "v", CENTROIDS, threshold=0.9, max_cell=2
        ).collect()
    }
    # capped-cell members keep themselves; the small cell still dedups
    assert verd[1] == (1, True) and verd[2] == (2, True) and verd[3] == (3, True)
    assert verd[4] == (4, True) and verd[5] == (4, False)

    # a cap no cell exceeds is a no-op
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            _df(spark), "id", "v", CENTROIDS, threshold=0.9
        ).collect()
    }
    roomy = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            _df(spark), "id", "v", CENTROIDS, threshold=0.9, max_cell=100
        ).collect()
    }
    assert roomy == uncapped
