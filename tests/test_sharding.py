"""Round-6 deterministic corpus shuffle + sharding — operators/sharding.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.operators.sharding import corpus_shuffle_shard


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_shards_partition_and_positions_are_contiguous(spark):
    out = corpus_shuffle_shard(_docs(spark), ["doc_id"], n_shards=4).collect()
    assert len(out) == 200
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # Every shard's positions are exactly 1..len (a permutation).
    assert sum(len(v) for v in by_shard.values()) == 200
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_deterministic_and_salt_redraws(spark):
    a = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in corpus_shuffle_shard(
            _docs(spark), ["doc_id"], 4, salt="ep0"
        ).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in corpus_shuffle_shard(
            _docs(spark), ["doc_id"], 4, salt="ep0"
        ).collect()
    }
    assert a == b  # reproducible epoch
    c = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in corpus_shuffle_shard(
            _docs(spark), ["doc_id"], 4, salt="ep1"
        ).collect()
    }
    assert a != c  # a new salt is a new permutation


def test_order_is_shuffled_not_input_order(spark):
    # Within a shard, hash order must not equal doc_id order (the point of
    # the shuffle). 50 docs per shard on average — the probability a salted
    # md5 order coincides with the id order is negligible.
    out = corpus_shuffle_shard(_docs(spark), ["doc_id"], 1).collect()
    ordered_ids = [r["doc_id"] for r in sorted(out, key=lambda r: r["pos"])]
    assert ordered_ids != sorted(ordered_ids)


def test_shard_parallelism_guard(spark):
    import pytest

    from flink_1_3_2_hopsworks_spark.operators.sharding import (
        corpus_shuffle_shard,
    )

    with pytest.raises(ValueError, match="n_shards must be >= 1"):
        corpus_shuffle_shard(_docs(spark), ["doc_id"], 0)
    with pytest.raises(ValueError, match="min_shard_parallelism"):
        corpus_shuffle_shard(
            _docs(spark), ["doc_id"], 4, min_shard_parallelism=32
        )
    # meeting the floor is fine
    corpus_shuffle_shard(_docs(spark), ["doc_id"], 32, min_shard_parallelism=32)
