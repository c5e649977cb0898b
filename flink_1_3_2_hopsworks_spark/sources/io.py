"""Batch sources and sinks (§2.1).

Reference parity: typed input formats — TextInputFormat (line-delimited),
CsvInputFormat/CsvReader (typed CSV with field selection and quoting),
AvroInputFormat, BinaryInputFormat/TypeSerializerInputFormat (the engine's
native serialized blocks), CollectionInputFormat (env.fromElements),
generateSequence, JDBCInputFormat/JDBCOutputFormat, and the table sinks
(CsvTableSink; BucketingSink's time/size bucketing).

Spark-first mapping: ``spark.read.<fmt>`` with explicit schemas (the
reference is schema-fixed per operator edge — we keep that discipline:
always pass a schema, never infer in production paths). Parquet plays the
native-binary-format role. Writes: ``df.write`` with ``partitionBy`` as the
BucketingSink analogue (directory buckets) and ``bucketBy`` for co-located
join layouts.

Scale notes: explicit schemas skip inference scans; parquet + partitionBy
gives partition pruning on read; bucketBy pre-shuffles once so repeated
joins/aggregations on the bucket key skip their exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited text (reference TextInputFormat) — one `value` column."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = False,
    delimiter: str = ",",
    quote: str = '"',
) -> DataFrame:
    """Typed CSV (reference CsvInputFormat: types fixed up front, quoted
    strings honored). Field selection = .select after read (column pruning
    reaches the reader)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("quote", quote)
        .csv(path)
    )


def read_json_lines(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines with explicit schema (native extra; the reference handled
    JSON only via user UDFs)."""
    return spark.read.schema(schema).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Native binary format (role of the reference's
    TypeSerializerInputFormat blocks) — self-describing, predicate+projection
    pushdown."""
    return spark.read.parquet(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro (reference AvroInputFormat). Requires the spark-avro package on
    the cluster; raises a clear error when absent."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "avro format unavailable — add org.apache.spark:spark-avro to "
            "spark.jars.packages"
        ) from exc


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink (reference AvroOutputFormat). Same jar gate as read_avro."""
    try:
        df.write.format("avro").mode(mode).save(path)
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            "avro format unavailable — add org.apache.spark:spark-avro to "
            "spark.jars.packages"
        ) from exc


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC read (reference JDBCInputFormat with parameter splits):
    partition_column + bounds shard the table across executors."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def from_collection(spark: SparkSession, data: Sequence, schema: StructType | str) -> DataFrame:
    """In-memory elements (reference CollectionInputFormat /
    env.fromElements)."""
    return spark.createDataFrame(data, schema)


def sequence(spark: SparkSession, start: int, end: int, parallelism: int | None = None) -> DataFrame:
    """Numeric range (reference env.generateSequence) — `id` column.
    Inclusive of both endpoints, matching the reference's from..to."""
    return spark.range(start, end + 1, 1, parallelism)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (reference CsvTableSink)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Directory-bucketed sink (reference BucketingSink: one directory per
    bucket; exactly-once comes from Spark's file-commit protocol rather than
    valid-length files)."""
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table: pre-shuffled layout so later joins and
    aggregations on ``bucket_cols`` skip their exchange (the optimizer's
    co-located-join setup, §4.1)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def zorder_value(cols, bits: int = 12):
    """Interleaved-bit (Morton) z-value over normalized rank columns —
    pure codegen'd shift/or terms, no Python. Each input column must
    already be an integer rank in ``[0, 2**bits)``; z-ordering by raw
    values goes through :func:`write_zordered`, which builds the ranks
    from a one-row min/max aggregate.

    ``bits * len(cols)`` must stay within the 63 value bits of a signed
    long: Spark's ``shiftleft`` wraps shift amounts mod 64 (high bits
    would silently collide with low bits) and bit 63 is the sign (rows
    carrying it would sort FIRST) — either way the clustering silently
    degrades, so this raises instead."""
    import pyspark.sql.functions as F

    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_value needs bits*len(cols) <= 63 (got {bits}*{n}="
            f"{bits * n}): Spark shiftleft wraps mod 64 and bit 63 is the "
            "sign bit — lower bits (write_zordered default 12 supports up "
            "to 5 columns) or drop columns."
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    bits: int = 12,
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet layout: rows are range-partitioned and
    sorted by the Morton interleave of the (min/max-normalized) z-order
    columns, so each output file covers a SMALL bounding box in the
    multi-column space and parquet row-group min/max statistics prune
    scans filtered on ANY of the columns — the multi-dimensional
    complement of ``write_bucketed_table`` (which co-locates joins on one
    key set) and the standard big-table layout lever at 100 TB (a sort by
    colA alone leaves colB footprints full-range; the interleave shrinks
    both). Skew note: min/max normalization is distribution-agnostic;
    heavily skewed columns keep pruning on the others because the
    interleave bounds every dimension independently.

    Cost: one slim min/max aggregate (a one-row collect — bounded by
    construction) + one range shuffle on the z-value — the same shuffle
    any clustered write pays. The bounds aggregate runs EAGERLY at call
    time (it parameterizes the interleave literals), so the input plan
    executes twice: materialize upstream results first if they are
    expensive to recompute. NULLs rank 0 (sort first, prune like a
    value). Non-numeric z-order columns raise up front, and an all-NULL
    column on a non-empty frame raises rather than silently collapsing
    that dimension to a constant (which would degrade clustering with no
    error — the silent-degradation mode the bits guard exists to stop).
    Behavior change vs r9: non-numeric / all-NULL z-order columns used to
    write with that dimension silently ranked 0; since r10 they raise —
    intentional hardening (no in-repo caller relied on the silent path).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    rankable = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType,
        T.TimestampType, T.DateType,
    )
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in zorder_cols:
        if c not in by_name:
            raise ValueError(f"z-order column {c!r} not in {df.columns}")
        if not isinstance(by_name[c], rankable):
            raise ValueError(
                f"z-order column {c!r} has non-rankable type "
                f"{by_name[c].simpleString()}: cast it to a numeric/"
                "timestamp type first — a failed double cast would rank "
                "every row 0 and silently collapse that dimension."
            )

    def _rankable(c):
        t = by_name[c]
        col = F.col(c)
        if isinstance(t, T.DateType):
            col = col.cast("timestamp")
        return col.cast("double")

    max_rank = (1 << bits) - 1
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, c in enumerate(zorder_cols):
        aggs += [
            F.min(_rankable(c)).alias(f"mn{i}"),
            F.max(_rankable(c)).alias(f"mx{i}"),
        ]
    row = df.agg(*aggs).collect()[0]
    if row["n"] == 0:
        df.write.mode(mode).parquet(path)
        return
    ranks = []
    for i, c in enumerate(zorder_cols):
        mn, mx = row[f"mn{i}"], row[f"mx{i}"]
        if mn is None or mx is None:
            raise ValueError(
                f"z-order column {c!r} is entirely NULL on a non-empty "
                "frame — its dimension would collapse to a constant. "
                "Drop it from zorder_cols or fill it first."
            )
        span = (mx - mn) if mx > mn else 1.0
        ranks.append(
            F.coalesce(
                F.floor((_rankable(c) - F.lit(mn)) / F.lit(span)
                        * F.lit(max_rank)),
                F.lit(0),
            ).cast("long")
        )
    zcol = "__zord_z"
    if zcol in df.columns:
        raise ValueError(
            f"column name {zcol!r} is reserved by write_zordered; "
            "rename it before writing."
        )
    (
        df.withColumn(zcol, zorder_value(ranks, bits))
        .repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode(mode)
        .parquet(path)
    )


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append",
    batch_size: int = 1000, properties: dict[str, str] | None = None,
) -> None:
    """Batched JDBC writes (reference JDBCOutputFormat)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .options(**(properties or {}))
        .mode(mode)
        .save()
    )
