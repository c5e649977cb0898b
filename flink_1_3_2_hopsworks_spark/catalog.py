"""Table catalog over the parquet test corpus.

Reference parity: Flink's ``TableEnvironment`` catalog registration
(flink-libraries/flink-table .../api/TableEnvironment.scala —
``registerTableSource`` / ``registerDataSet``) and the typed input formats of
§2.1 (CsvInputFormat/AvroInputFormat/...). Here every table is a parquet
DataSource-V2 scan, so projection and predicate pushdown (the reference's
``ProjectableTableSource`` / ``FilterableTableSource`` traits) are native.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any scale factor the TPC-H
# generator produces (region/nation are constant-size; supplier/part/customer
# grow but stay orders of magnitude under fact tables).
BROADCASTABLE = {"region", "nation", "supplier"}

# Tables whose scans are spread by default when the input is too small to
# split (see spread_small_input). EMPTY by measurement: an A/B over the
# TPC-H/events suite showed the spread LOSES ~2× on JVM-side relational
# plans at gate scale (q3 0.81→1.61 s, q1 0.56→1.08 s, ev_tumbling
# 0.31→0.89 s) — vectorized scan+partial-agg over ≤600k rows is faster
# single-task than the added exchange + 32-task scheduling. The spread
# pays off only where per-ROW work is heavy (md5 shingle pipelines,
# Arrow decode kernels, Python-bound stages); those operators opt in per
# call site via ``load_table(..., spread=True)``, each A/B-measured.
SPREAD_TABLES: set[str] = set()

# One scan split costs at least spark.sql.files.openCostInBytes (4 MB
# default), so an input under cores × 4 MB can NEVER hand every core a
# split — Spark's own split math proves the scan under-parallelized.
# Only then is the round-robin spread applied; the shuffle it adds is
# bounded by that same ceiling (≤ cores × 4 MB ≈ trivial), and at real
# scale (files ≥ GBs) the condition is provably never true, so plans on
# a cluster are untouched. Guide §2.5: "one huge unsplittable file …
# repartition immediately after the read"; the gate corpus is the
# degenerate case (single-file, single-row-group parquet — unsplittable
# regardless of maxPartitionBytes).
_OPEN_COST_BYTES = 4 * 1024 * 1024


def _table_bytes(path: str) -> int | None:
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
    except OSError:
        return None
    return None


def spread_small_input(
    spark: SparkSession, df: DataFrame, size_bytes: int | None
) -> DataFrame:
    """Round-robin repartition a provably under-parallelized small scan to
    the session's core count; pass through unchanged otherwise (see
    _OPEN_COST_BYTES note — at production scale this is always a no-op).
    Round-robin, not a key: perfectly balanced, deterministic under task
    retry (sortBeforeRepartition), and it leaves statistics untouched so
    downstream broadcast decisions are unchanged."""
    cores = spark.sparkContext.defaultParallelism
    if size_bytes is not None and size_bytes < cores * _OPEN_COST_BYTES:
        return df.repartition(cores)
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | None = None
) -> DataFrame:
    """Load one corpus table as a DataFrame (lazy parquet scan).

    ``spread`` controls the small-input scan spread (spread_small_input):
    ``None`` applies the SPREAD_TABLES default, ``True``/``False`` force
    it per call site (documents/embeddings operators opt in explicitly —
    their audited probe paths keep the bare scan).

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects — read as long nanos, convert to µs)
    and plain TIMESTAMP(MICROS) (read as-is, only normalize NTZ→LTZ so the
    streaming operators see one TimestampType). Detect from the schema.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        import pyspark.sql.functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Integer division: float division could round the µs value up
            # and disagree with DuckDB's ns→µs truncation by 1µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    if spread is None:
        spread = name in SPREAD_TABLES
    if spread:
        df = spread_small_input(spark, df, _table_bytes(path))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register corpus tables as temp views so ``spark.sql`` can see them."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
