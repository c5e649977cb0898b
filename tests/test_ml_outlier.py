"""StochasticOutlierSelection tests (FlinkML outlier/
StochasticOutlierSelection.scala parity) — the SOS-paper toy dataset:
four clustered points and one far outlier."""

from __future__ import annotations

from flink_1_3_2_hopsworks_spark.ml.outlier import StochasticOutlierSelection


def _toy(spark):
    rows = [
        (0, [1.0, 1.0]),
        (1, [2.0, 1.0]),
        (2, [1.0, 2.0]),
        (3, [2.0, 2.0]),
        (4, [5.0, 8.0]),
    ]
    return spark.createDataFrame(rows, "id long, features array<double>")


def test_sos_flags_the_planted_outlier(spark):
    sos = StochasticOutlierSelection(perplexity=3.0)
    got = {
        r["id"]: r["outlier_probability"]
        for r in sos.transform(_toy(spark)).collect()
    }
    assert len(got) == 5
    # Reference ITSuite expectations for this dataset at h=3: the cluster
    # sits near 0.26-0.28, the outlier at ~0.992.
    assert got[4] > 0.95
    assert all(0.1 < got[i] < 0.4 for i in range(4))
    # Probabilities, not scores.
    assert all(0.0 <= p <= 1.0 for p in got.values())


def test_sos_is_deterministic_and_symmetric_under_shuffle(spark):
    sos = StochasticOutlierSelection(perplexity=3.0)
    a = sos.transform(_toy(spark)).collect()
    b = sos.transform(_toy(spark).repartition(5).orderBy("features")).collect()
    assert {(r["id"], round(r["outlier_probability"], 9)) for r in a} == {
        (r["id"], round(r["outlier_probability"], 9)) for r in b
    }


def test_sos_uniform_cluster_has_no_outlier(spark):
    # A symmetric square: everyone equally (un)bound — equal probabilities.
    rows = [(i, [float(i % 2), float(i // 2)]) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    probs = [
        r["outlier_probability"]
        for r in StochasticOutlierSelection(perplexity=2.0).transform(df).collect()
    ]
    assert max(probs) - min(probs) < 1e-9
