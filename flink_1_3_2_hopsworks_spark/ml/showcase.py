"""Registry showcase queries for the FlinkML adapter layer (§2.13) —
closed-form algorithms whose results DuckDB can recompute exactly, so the
pipeline adapters get a driver hash-match gate on top of their pytest
coverage (tests/test_ml_pipeline.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.catalog import load_table
from flink_1_3_2_hopsworks_spark.ml.pipeline import (
    MultipleLinearRegression,
    StandardScaler,
)


def ml_linreg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple linear regression of extended price on quantity (reference
    ml/regression/MultipleLinearRegression.scala adapter): pyspark.ml's
    normal-equations solution matches the closed form, so DuckDB's
    regr_slope/regr_intercept is an exact oracle (4-decimal round)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.array(F.col("l_quantity").cast("double")).alias("features"),
        F.col("l_extendedprice").cast("double").alias("label"),
    )
    m = MultipleLinearRegression().fit(li, "features", "label")
    return spark.createDataFrame(
        [(round(float(m.weights[0]), 4), round(float(m.intercept), 4))],
        "slope double, intercept double",
    )


def ml_knn_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN (reference ml/nn/KNN.scala, block-nested exact mode): the
    5 nearest training vectors per query by Euclidean distance, ranked
    deterministically (distance, neighbor_id). DuckDB replays the distances
    with LIST_DISTANCE; the LSH mode's recall is pytest-covered."""
    from flink_1_3_2_hopsworks_spark.ml.pipeline import KNN

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("features"),
    )
    train = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    model = KNN(k=5, exact=True).fit(train, "features", "vec_id")
    out = model.predict(queries)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("distance", 4).alias("distance"),
        "rank",
    )


def ml_minmax_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinMaxScaler fit+transform (reference preprocessing/
    MinMaxScaler.scala adapter) on extended price: range-scaled to [0,1],
    replayed per-row by DuckDB from the global min/max."""
    from flink_1_3_2_hopsworks_spark.ml.pipeline import MinMaxScaler

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.array(F.col("l_extendedprice").cast("double")).alias("features"),
    )
    scaled = MinMaxScaler().fit(li, "features").transform(li)
    return scaled.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.element_at("features", 1), 4).alias("scaled_price"),
    ).orderBy("l_orderkey", "l_linenumber").limit(5000)


def ml_poly_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PolynomialFeatures degree-2 expansion (reference preprocessing/
    PolynomialFeatures.scala adapter) of (quantity, discount): Spark's
    PolynomialExpansion term order [x, x², y, x·y, y²], each term
    recomputed arithmetically by the oracle."""
    from flink_1_3_2_hopsworks_spark.ml.pipeline import PolynomialFeatures

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.array(
            F.col("l_quantity").cast("double"),
            F.col("l_discount").cast("double"),
        ).alias("features"),
    )
    out = PolynomialFeatures(degree=2).fit(li).transform(li, "features")
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.element_at("features", 1), 4).alias("x"),
        F.round(F.element_at("features", 2), 4).alias("x2"),
        F.round(F.element_at("features", 3), 4).alias("y"),
        F.round(F.element_at("features", 4), 4).alias("xy"),
        F.round(F.element_at("features", 5), 4).alias("y2"),
    ).orderBy("l_orderkey", "l_linenumber").limit(2000)


def ml_scaled_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler fit+transform (reference preprocessing/
    StandardScaler.scala adapter) on lineitem quantity: z-scores against
    the sample standard deviation, verified per-row by DuckDB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.array(F.col("l_quantity").cast("double")).alias("features"),
    )
    scaled = StandardScaler().fit(li, "features").transform(li)
    return scaled.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.element_at("features", 1), 4).alias("scaled_quantity"),
    ).orderBy("l_orderkey", "l_linenumber").limit(5000)


def ml_kmeans_spherical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means TRAINING on the engine's own primitives
    (ml/kmeans.py): 3 Lloyd iterations from the frozen IVF init — per
    iteration one scan-fused cosine argmax + one k×D mean aggregate,
    centroids L2-normalized and rounded to 6 dp (the quantization that
    makes a float mean engine-portable) — then the final assignment
    (vec_id, cell, cosine). The DuckDB oracle replays all three unrolled
    iterations and the assignment for a full hash-match — iterative model
    training, not just serving, is oracle-audited."""
    from flink_1_3_2_hopsworks_spark.ml.kmeans import (
        spherical_kmeans_assign,
        spherical_kmeans_fit,
    )
    from flink_1_3_2_hopsworks_spark.similarity.gate_model import (
        FROZEN_CENTROIDS,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = spherical_kmeans_fit(
        emb, "embedding", FROZEN_CENTROIDS, iterations=3
    )
    return spherical_kmeans_assign(emb, "vec_id", "embedding", model).orderBy(
        "vec_id"
    )


def ml_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING on engine primitives (ml/bpe.py): 6 merge
    rounds over the corpus word-frequency table — per round one
    vocabulary-sized pair-count aggregate + argmax (the collect is the
    1-row merge rule, the model). The DuckDB oracle replays all 6
    unrolled rounds — including the double-space REPLACE merge algebra —
    for a full hash-match; merge 6 composes merge 1's symbol ('m'+'er'),
    so the audit covers genuine iteration, not 6 independent argmaxes."""
    from flink_1_3_2_hopsworks_spark.ml.bpe import bpe_fit

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit(docs, "text", num_merges=6)
    return spark.createDataFrame(
        [
            (m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "step int, left_sym string, right_sym string, merged string,"
        " pair_count bigint",
    ).orderBy("step")
