"""FlinkML parity layer (§2.13) — see pipeline.py."""

from flink_1_3_2_hopsworks_spark.ml.pipeline import (
    ALS,
    KNN,
    MinMaxScaler,
    MultipleLinearRegression,
    PolynomialFeatures,
    Splitter,
    StandardScaler,
    SVM,
)

__all__ = [
    "ALS",
    "KNN",
    "MinMaxScaler",
    "MultipleLinearRegression",
    "PolynomialFeatures",
    "Splitter",
    "StandardScaler",
    "SVM",
]
