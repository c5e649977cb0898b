"""Streaming ANN index maintenance (streaming/ann.py): store growth,
re-crawl skip, rebuild equivalence, and restart idempotency."""

from __future__ import annotations

import glob
import os
import shutil

import pyspark.sql.functions as F

from flink_1_3_2_hopsworks_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _stage_files(spark, tmp_path):
    """Two parquet files: vec_ids 0-59 then 40-99 (40-59 re-crawled)."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    src = tmp_path / "src"
    src.mkdir()
    for i, cond in enumerate(
        [F.col("vec_id") < 60, (F.col("vec_id") >= 40) & (F.col("vec_id") < 100)]
    ):
        staging = str(tmp_path / f"stage{i}")
        emb.filter(cond).coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(f"{staging}/part-*.parquet")[0]
        dest = str(src / f"b{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(src)


def _run(spark, src, tmp_path):
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.streaming.ann import ann_ingest_stream

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ann_ingest_stream(
        stream,
        store_path=str(tmp_path / "store"),
        checkpoint=str(tmp_path / "ckpt"),
        coarse_centroids=FROZEN_CENTROIDS,
        codebooks=FROZEN_PQ_CODEBOOKS,
    )
    q.awaitTermination(300)
    q.stop()


def test_ann_ingest_stream_matches_full_rebuild(spark, tmp_path):
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.similarity.pq import pq_encode

    src = _stage_files(spark, tmp_path)
    _run(spark, src, tmp_path)

    store = spark.read.parquet(str(tmp_path / "store"))
    # One row per unique id, re-crawled ids appended once (batch 0 wins).
    assert store.count() == 100
    dup_batches = {
        r["batch_id"]
        for r in store.filter(
            (F.col("vec_id") >= 40) & (F.col("vec_id") < 60)
        ).select("batch_id").distinct().collect()
    }
    assert dup_batches == {0}

    # Bit-identical to a full rebuild over the unique vectors (frozen
    # models make encoding deterministic per row).
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 100)
    rebuilt = pq_encode(
        emb, "vec_id", "embedding", FROZEN_PQ_CODEBOOKS,
        cell_centroids=FROZEN_CENTROIDS,
    )
    code_cols = [c for c in rebuilt.columns if c not in ("vec_id",)]
    got = store.select("vec_id", *code_cols)
    assert got.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(got).count() == 0

    # Restart with no new files: nothing appended.
    _run(spark, src, tmp_path)
    assert spark.read.parquet(str(tmp_path / "store")).count() == 100


def test_ingest_vector_batch_crash_replay_is_idempotent(spark, tmp_path):
    """Crash-after-append replay: epoch N re-runs after its own append is
    already on disk. The store-id read must exclude the epoch's own
    partition — otherwise the anti-probe treats every batch id as a
    re-crawl and overwrites the partition with an EMPTY frame, deleting
    the epoch's vectors."""
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.streaming.ann import ingest_vector_batch

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "store")
    for i, cond in enumerate([F.col("vec_id") < 30, F.col("vec_id") >= 470]):
        ingest_vector_batch(
            emb.filter(cond), i, store, FROZEN_CENTROIDS, FROZEN_PQ_CODEBOOKS
        )
    assert spark.read.parquet(store).count() == 60
    ingest_vector_batch(  # replay epoch 1 with its append already on disk
        emb.filter(F.col("vec_id") >= 470), 1, store,
        FROZEN_CENTROIDS, FROZEN_PQ_CODEBOOKS,
    )
    got = spark.read.parquet(store)
    assert got.count() == 60
    assert got.filter(F.col("batch_id") == 1).count() == 30


def test_seed_code_store_skips_seed_ids_every_epoch(spark, tmp_path):
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
        FROZEN_PQ_CODEBOOKS,
    )
    from flink_1_3_2_hopsworks_spark.streaming.ann import (
        ingest_vector_batch,
        seed_code_store,
    )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    store = str(tmp_path / "store")
    seed_code_store(
        emb.filter(F.col("vec_id") < 20), store,
        FROZEN_CENTROIDS, FROZEN_PQ_CODEBOOKS,
    )
    # Epoch 0 overlaps the seed; epoch 1 overlaps the seed AND epoch 0.
    ingest_vector_batch(
        emb.filter(F.col("vec_id") < 30), 0, store,
        FROZEN_CENTROIDS, FROZEN_PQ_CODEBOOKS,
    )
    ingest_vector_batch(
        emb.filter(F.col("vec_id") < 40), 1, store,
        FROZEN_CENTROIDS, FROZEN_PQ_CODEBOOKS,
    )
    store_df = spark.read.parquet(store)
    assert store_df.count() == 40  # one code row per id, seed included
    by_batch = {
        r["batch_id"]: r["n"]
        for r in store_df.groupBy("batch_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert by_batch == {-1: 20, 0: 10, 1: 10}
