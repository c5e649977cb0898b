"""flink_1_3_2_hopsworks_spark — a PySpark-native analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
reference (a Hopsworks fork of Apache Flink 1.3.2), re-expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, Structured Streaming for streams,
Pandas UDFs only where built-ins can't express the semantics.

Layout:
  session     — SparkSession bootstrap (AQE, Arrow, UTC, scale-ready conf)
  catalog     — parquet table registry for the test corpus
  operators/  — batch operator surface (joins, aggs, set ops, sort/limit,
                sampling, iteration)
  functions/  — scalar/text/vector function surface
  plans/      — end-to-end relational query plans (TPC-H-style)
  streaming/  — Structured Streaming layer (windows, watermark, dedup, state)
  dedup/      — exact + near-duplicate detection (MinHash LSH, SimHash, ...)
  similarity/ — embedding similarity search (brute-force + LSH paths)
  multimodal/ — binary-column (image/audio) plumbing with stubbed decoders
  graph/      — DataFrame Pregel (PageRank, connected components, ...)
"""

from flink_1_3_2_hopsworks_spark.session import get_spark
from flink_1_3_2_hopsworks_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
__version__ = "0.1.0"
