"""Fluent Flink-shaped API facade — the switchover surface.

A user of the reference writes ``env.fromCollection(...).map(...).groupBy(
...).aggregate(SUM, 1).join(other).where("k").equalTo("k")``; this module
gives that program shape over the engine's Spark-first operator modules
(reference: flink-java api/java/{ExecutionEnvironment,DataSet}.java,
operators/{UnsortedGrouping,JoinOperator,CoGroupOperator}.java; streaming
api/datastream/{DataStream,KeyedStream,WindowedStream}.java).

Design rules:
- every wrapper HOLDS a DataFrame (``.df``) and never materializes — the
  full fluent chain stays one Catalyst plan, so pushdown/pruning/join
  planning see through the facade;
- field references accept names or Flink-style tuple positions (ints);
- transformations prefer Column expressions (JVM/codegen); the row-UDF
  spellings (``map_rows``/``flat_map``/``map_partition``, join/coGroup
  ``apply``) cross to Python via Arrow (``mapInPandas``/``applyInPandas``)
  and are the documented slow path, exactly like the reference's rich
  functions vs Table expressions.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from flink_1_3_2_hopsworks_spark.operators import (
    aggregations as _agg,
    iterate as _iter,
    joins as _joins,
    sampling as _sampling,
    setops as _setops,
    sort_limit as _sort,
)
from flink_1_3_2_hopsworks_spark.session import get_spark
from flink_1_3_2_hopsworks_spark.sources import io as _io


class Aggregations:
    """Reference ``Aggregations`` enum (flink-java aggregation/)."""

    SUM = "SUM"
    MIN = "MIN"
    MAX = "MAX"

    _FNS = {"SUM": F.sum, "MIN": F.min, "MAX": F.max}


class ExecutionEnvironment:
    """Batch entry point (reference ExecutionEnvironment)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "ExecutionEnvironment":
        return cls(spark or get_spark())

    def from_collection(self, data: Sequence, schema) -> "DataSet":
        return DataSet(_io.from_collection(self.spark, data, schema))

    def from_elements(self, *elements, schema) -> "DataSet":
        return DataSet(_io.from_collection(self.spark, list(elements), schema))

    def generate_sequence(self, start: int, end: int) -> "DataSet":
        """Inclusive numeric range (reference generateSequence)."""
        return DataSet(_io.sequence(self.spark, start, end))

    def read_text_file(self, path: str) -> "DataSet":
        return DataSet(_io.read_text(self.spark, path))

    def read_csv_file(self, path: str, schema, **options) -> "DataSet":
        return DataSet(_io.read_csv(self.spark, path, schema, **options))

    def read_parquet(self, path: str) -> "DataSet":
        return DataSet(_io.read_parquet(self.spark, path))

    def execute(self, job_name: str | None = None) -> None:
        """No-op: Spark executes per action (collect/count/write), not per
        program — the reference's deferred-plan-then-execute maps onto
        Spark's lazy DataFrame semantics directly."""


def _cols(df: DataFrame, fields: Sequence[str | int]) -> list[str]:
    """Resolve Flink-style field refs: names, or tuple positions (ints)."""
    return [df.columns[f] if isinstance(f, int) else f for f in fields]


class DataSet:
    """Bounded fluent dataset (reference flink-java DataSet facade)."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- row-level transforms (§2.2) ------------------------------------

    def map(self, *exprs: Column) -> "DataSet":
        """Expression map — the fast (codegen) path; reference map with a
        field-expression function body."""
        return DataSet(self.df.select(*exprs))

    def map_rows(self, func: Callable, schema) -> "DataSet":
        """Arbitrary-Python map, 1→1 per batch (reference MapFunction —
        Arrow slow path)."""
        return DataSet(self.df.mapInPandas(func, schema))

    def flat_map(self, func: Callable, schema) -> "DataSet":
        """0..n output rows per input (reference FlatMapFunction): the
        generator may yield any number of rows per batch."""
        return DataSet(self.df.mapInPandas(func, schema))

    def map_partition(self, func: Callable, schema) -> "DataSet":
        """Whole-partition UDF (reference MapPartitionFunction) —
        ``mapInPandas`` is exactly this (iterator of batches per task)."""
        return DataSet(self.df.mapInPandas(func, schema))

    def filter(self, condition: Column | str) -> "DataSet":
        return DataSet(self.df.filter(condition))

    def project(self, *fields: str | int) -> "DataSet":
        return DataSet(self.df.select(*_cols(self.df, fields)))

    # -- grouping / aggregation (§2.4) ----------------------------------

    def group_by(self, *fields: str | int) -> "UnsortedGrouping":
        return UnsortedGrouping(self.df, _cols(self.df, fields))

    def aggregate(self, op: str, field: str | int) -> "AggregateBuilder":
        return UnsortedGrouping(self.df, []).aggregate(op, field)

    def sum(self, field: str | int) -> "DataSet":
        return UnsortedGrouping(self.df, []).sum(field)

    def min(self, field: str | int) -> "DataSet":
        return UnsortedGrouping(self.df, []).min(field)

    def max(self, field: str | int) -> "DataSet":
        return UnsortedGrouping(self.df, []).max(field)

    def distinct(self, *fields: str | int) -> "DataSet":
        return DataSet(_agg.distinct(self.df, _cols(self.df, fields) or None))

    def summarize(self) -> "DataSet":
        return DataSet(_agg.summarize(self.df))

    # -- joins (§2.3) ----------------------------------------------------

    def join(self, other: "DataSet", hint: str = "OPTIMIZER_CHOOSES") -> "JoinBuilder":
        return JoinBuilder(self, other, "inner", hint)

    def left_outer_join(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "left")

    def right_outer_join(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "right")

    def full_outer_join(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "full")

    def join_with_tiny(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "inner", "BROADCAST_HASH_SECOND")

    def join_with_huge(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "inner", "BROADCAST_HASH_FIRST")

    def cross(self, other: "DataSet") -> "DataSet":
        return DataSet(_joins.cross(self.df, other.df))

    def co_group(self, other: "DataSet") -> "CoGroupBuilder":
        return CoGroupBuilder(self, other)

    # -- set ops / sort / limit / partitioning (§2.8) --------------------

    def union(self, other: "DataSet") -> "DataSet":
        """Bag union — ALL semantics, like the reference's union."""
        return DataSet(_setops.union_all(self.df, other.df))

    def intersect(self, other: "DataSet", all: bool = False) -> "DataSet":
        return DataSet(_setops.intersect(self.df, other.df, all))

    def minus(self, other: "DataSet", all: bool = False) -> "DataSet":
        return DataSet(_setops.minus(self.df, other.df, all))

    def first(self, n: int) -> "DataSet":
        return DataSet(_sort.first_n(self.df, n))

    def sort_partition(self, *fields) -> "DataSet":
        return DataSet(_sort.sort_partition(self.df, *fields))

    def order_by(self, *fields) -> "DataSet":
        return DataSet(_sort.global_sort(self.df, *fields))

    def partition_by_hash(self, *fields: str | int) -> "DataSet":
        return DataSet(_sort.partition_by_hash(self.df, _cols(self.df, fields)))

    def partition_by_range(self, *fields: str | int) -> "DataSet":
        return DataSet(_sort.partition_by_range(self.df, _cols(self.df, fields)))

    def rebalance(self, num_partitions: int) -> "DataSet":
        return DataSet(_sort.rebalance(self.df, num_partitions))

    def partition_custom(self, partition_expr, num_partitions: int) -> "DataSet":
        """Custom routing by expression (reference partitionCustom)."""
        return DataSet(_sort.partition_custom(self.df, partition_expr, num_partitions))

    def rescale(self, num_partitions: int) -> "DataSet":
        """Narrow (no-shuffle) redistribution (reference rescale)."""
        return DataSet(_sort.rescale(self.df, num_partitions))

    def zip_with_index(self, id_col: str = "index") -> "DataSet":
        return DataSet(_sort.zip_with_index(self.df, id_col))

    def zip_with_unique_id(self, id_col: str = "unique_id") -> "DataSet":
        return DataSet(_sort.zip_with_unique_id(self.df, id_col))

    def sample(self, with_replacement: bool, fraction: float, seed: int = 42) -> "DataSet":
        return DataSet(_sampling.sample(self.df, fraction, with_replacement, seed))

    def sample_with_size(self, n: int, seed: int = 42) -> "DataSet":
        return DataSet(_sampling.sample_with_size(self.df, n, seed))

    # -- iterations (§2.8) ----------------------------------------------

    def iterate(
        self,
        max_iterations: int,
        step: Callable[["DataSet", int], "DataSet"],
        converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    ) -> "DataSet":
        return DataSet(
            _iter.iterate(
                self.df,
                lambda df, i: step(DataSet(df), i).df,
                max_iterations,
                converged,
            )
        )

    def iterate_delta(
        self,
        workset: "DataSet",
        key_fields: Sequence[str],
        max_iterations: int,
        step: Callable[["DataSet", "DataSet", int], tuple["DataSet", "DataSet"]],
    ) -> "DataSet":
        def _step(sol, ws, i):
            d, w = step(DataSet(sol), DataSet(ws), i)
            return d.df, w.df

        return DataSet(
            _iter.iterate_delta(
                self.df, workset.df, _step, list(key_fields), max_iterations
            )
        )

    # -- actions / sinks -------------------------------------------------

    def collect(self) -> list:
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()

    def print_(self, n: int = 20) -> None:
        self.df.show(n)

    def write_csv(self, path: str, mode: str = "overwrite") -> None:
        _io.write_csv(self.df, path, mode)

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).parquet(path)


class UnsortedGrouping:
    """Keyed grouping (reference operators/UnsortedGrouping.java)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def aggregate(self, op: str, field: str | int) -> "AggregateBuilder":
        """``aggregate(SUM, f).and_agg(MIN, g)`` chaining (reference
        AggregateOperator.and)."""
        return AggregateBuilder(self._df, self._keys).and_agg(op, field)

    def sum(self, field: str | int) -> DataSet:
        return self.aggregate(Aggregations.SUM, field).done()

    def min(self, field: str | int) -> DataSet:
        return self.aggregate(Aggregations.MIN, field).done()

    def max(self, field: str | int) -> DataSet:
        return self.aggregate(Aggregations.MAX, field).done()

    def min_by(self, field: str | int) -> DataSet:
        """Whole-row argmin (reference minBy)."""
        [c] = _cols(self._df, [field])
        return DataSet(_agg.min_by(self._df, self._keys, c))

    def max_by(self, field: str | int) -> DataSet:
        [c] = _cols(self._df, [field])
        return DataSet(_agg.max_by(self._df, self._keys, c))

    def reduce_group(self, func: Callable, schema) -> DataSet:
        """Full-group UDF (reference reduceGroup) — applyInPandas."""
        return DataSet(_agg.group_reduce(self._df, self._keys, func, schema))

    def first(self, n: int) -> DataSet:
        """First-n per group (reference FirstReducer). Deterministic order
        requires a prior sort_partition on the key — documented caveat,
        same as the reference."""
        return DataSet(
            _sort.first_n_per_group(self._df, self._keys, n, self._df.columns)
        )

    def count(self) -> DataSet:
        return DataSet(
            self._df.groupBy(*self._keys).agg(F.count(F.lit(1)).alias("count"))
        )


class AggregateBuilder:
    """Chained field aggregation (reference AggregateOperator: ``aggregate(
    SUM, 1).and(MIN, 2)`` — ONE hash-aggregate for the whole chain)."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys
        self._aggs: list[Column] = []

    def and_agg(self, op: str, field: str | int) -> "AggregateBuilder":
        fn = Aggregations._FNS.get(op.upper())
        if fn is None:
            raise ValueError(f"unknown aggregation: {op}")
        [c] = _cols(self._df, [field])
        self._aggs.append(fn(c).alias(c))
        return self

    def done(self) -> DataSet:
        return DataSet(_agg.aggregate(self._df, self._keys, *self._aggs))

    # Every DataSet method works on the implicit result: .done() is only
    # needed when you want the wrapper explicitly.
    def __getattr__(self, name):
        return getattr(self.done(), name)


class JoinBuilder:
    """``a.join(b).where(k).equal_to(k)`` (reference JoinOperator +
    JoinOperatorSets): produces a DataSet with both sides' columns (right
    clashes suffixed ``_r`` — the reference's Tuple2<L,R> flattened)."""

    def __init__(
        self,
        left: DataSet,
        right: DataSet,
        how: str,
        hint: str = "OPTIMIZER_CHOOSES",
    ):
        self._left = left
        self._right = right
        self._how = how
        self._hint = hint
        self._lkeys: list[str] | None = None

    def where(self, *fields: str | int) -> "JoinBuilder":
        self._lkeys = _cols(self._left.df, fields)
        return self

    def equal_to(self, *fields: str | int) -> "JoinedDataSet":
        if self._lkeys is None:
            raise ValueError("call .where(...) before .equal_to(...)")
        rkeys = _cols(self._right.df, fields)
        if len(rkeys) != len(self._lkeys):
            raise ValueError("where/equal_to key counts differ")
        l, r = self._left.df.alias("_L"), self._right.df.alias("_R")
        cond = None
        for lk, rk in zip(self._lkeys, rkeys):
            eq = F.col(f"_L.{lk}") == F.col(f"_R.{rk}")
            cond = eq if cond is None else (cond & eq)
        joined = _joins.join(l, r, cond, how=self._how, hint=self._hint)
        lcols = self._left.df.columns
        out = joined.select(
            *[F.col(f"_L.{c}").alias(c) for c in lcols],
            *[
                F.col(f"_R.{c}").alias(c if c not in lcols else f"{c}_r")
                for c in self._right.df.columns
            ],
        )
        return JoinedDataSet(out)


class JoinedDataSet(DataSet):
    """Join result; ``apply`` ≈ reference JoinFunction (slow path)."""

    def apply(self, func: Callable, schema) -> DataSet:
        return DataSet(self.df.mapInPandas(func, schema))


class CoGroupBuilder:
    """``a.co_group(b).where(k).equal_to(k).apply(f, schema)`` (reference
    CoGroupOperator): f sees both FULL groups per key."""

    def __init__(self, left: DataSet, right: DataSet):
        self._left = left
        self._right = right
        self._lkeys: list[str] | None = None
        self._rkeys: list[str] | None = None

    def where(self, *fields: str | int) -> "CoGroupBuilder":
        self._lkeys = _cols(self._left.df, fields)
        return self

    def equal_to(self, *fields: str | int) -> "CoGroupBuilder":
        self._rkeys = _cols(self._right.df, fields)
        return self

    def apply(self, func: Callable, schema) -> DataSet:
        if self._lkeys is None or self._rkeys is None:
            raise ValueError("call .where(...).equal_to(...) before .apply(...)")
        return DataSet(
            _joins.co_group(
                self._left.df, self._right.df, self._lkeys, self._rkeys, func, schema
            )
        )


# ---------------------------------------------------------------------------
# Streaming facade (§2.6/§2.7): DataStream / KeyedStream / WindowedStream.
# ---------------------------------------------------------------------------


class TumblingEventTimeWindows:
    def __init__(self, size: str):
        self.size = size

    @classmethod
    def of(cls, size: str) -> "TumblingEventTimeWindows":
        return cls(size)


class SlidingEventTimeWindows:
    def __init__(self, size: str, slide: str):
        self.size, self.slide = size, slide

    @classmethod
    def of(cls, size: str, slide: str) -> "SlidingEventTimeWindows":
        return cls(size, slide)


class EventTimeSessionWindows:
    def __init__(self, gap: str):
        self.gap = gap

    @classmethod
    def with_gap(cls, gap: str) -> "EventTimeSessionWindows":
        return cls(gap)


class StreamExecutionEnvironment:
    """Streaming entry point (reference StreamExecutionEnvironment)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "StreamExecutionEnvironment":
        return cls(spark or get_spark())

    def file_source(self, path: str, schema, fmt: str = "parquet") -> "DataStream":
        from flink_1_3_2_hopsworks_spark.streaming.sources import file_stream

        return DataStream(file_stream(self.spark, path, schema, fmt))

    def rate_source(self, rows_per_second: int = 1000) -> "DataStream":
        from flink_1_3_2_hopsworks_spark.streaming.sources import rate_stream

        return DataStream(rate_stream(self.spark, rows_per_second))

    def socket_text_stream(self, host: str, port: int) -> "DataStream":
        from flink_1_3_2_hopsworks_spark.streaming.sources import socket_stream

        return DataStream(socket_stream(self.spark, host, port))


class DataStream:
    """Unbounded fluent stream (reference DataStream)."""

    def __init__(self, df: DataFrame):
        self.df = df

    def map(self, *exprs: Column) -> "DataStream":
        return DataStream(self.df.select(*exprs))

    def filter(self, condition: Column | str) -> "DataStream":
        return DataStream(self.df.filter(condition))

    def assign_timestamps_and_watermarks(
        self, ts_col: str, max_out_of_orderness: str
    ) -> "DataStream":
        """BoundedOutOfOrdernessTimestampExtractor ≈ withWatermark."""
        return DataStream(self.df.withWatermark(ts_col, max_out_of_orderness))

    def union(self, other: "DataStream") -> "DataStream":
        return DataStream(self.df.unionByName(other.df))

    def connect(self, other: "DataStream", key_cols: list[str]) -> "DataStream":
        """Tagged union on a shared key schema (reference ConnectedStreams /
        CoProcessFunction encoding — branch on ``_source`` downstream)."""
        from flink_1_3_2_hopsworks_spark.operators.routing import connect

        return DataStream(connect(self.df, other.df, key_cols))

    def split(self, **routes: Column) -> dict[str, "DataStream"]:
        """Named predicate routes (reference split/select): each branch is a
        filter off the SAME plan — one scan, N outputs."""
        from flink_1_3_2_hopsworks_spark.operators.routing import split

        return {k: DataStream(v) for k, v in split(self.df, routes).items()}

    def side_output(self, main_cond: Column) -> tuple["DataStream", "DataStream"]:
        """(main, side) pair (reference OutputTag side outputs)."""
        from flink_1_3_2_hopsworks_spark.operators.routing import side_output

        main, side = side_output(self.df, main_cond)
        return DataStream(main), DataStream(side)

    def key_by(self, *fields: str | int) -> "KeyedStream":
        return KeyedStream(self.df, _cols(self.df, fields))

    def to_sink(self, **writer_options):
        """Escape hatch to ``writeStream`` for sink wiring (the engine's
        streaming/sinks.py has the reference sink catalogue)."""
        return self.df.writeStream


class KeyedStream:
    """Keyed stream (reference KeyedStream): windows + stateful process."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def window(self, assigner, ts_col: str = "ts") -> "WindowedStream":
        return WindowedStream(self._df, self._keys, assigner, ts_col)

    def count_window(
        self, size: int, slide: int | None = None, ts_col: str = "ts"
    ) -> "CountWindowedStream":
        """countWindow(size) tumbling, or countWindow(size, slide) sliding
        (reference KeyedStream#countWindow one/two-arg)."""
        return CountWindowedStream(self._df, self._keys, size, slide, ts_col)

    def process(
        self,
        on_event,
        on_timer,
        out_fields: str,
        value_cols: list[str],
        ts_col: str = "ts",
        watermark_delay_seconds: float = 5.0,
    ) -> DataStream:
        """ProcessFunction with keyed state + multi-timer TimerService
        (reference KeyedProcessOperator) — applyInPandasWithState underneath.
        ``on_event(state, event, ctx)`` / ``on_timer(state, timer_ms, ctx)``
        return rows matching ``out_fields``; ``value_cols`` are the input
        columns passed through to ``on_event``."""
        from flink_1_3_2_hopsworks_spark.streaming.process import keyed_process_stream

        return DataStream(
            keyed_process_stream(
                self._df,
                self._keys,
                on_event,
                on_timer,
                out_fields,
                value_cols,
                ts_col=ts_col,
                watermark_delay_seconds=watermark_delay_seconds,
            )
        )


class WindowedStream:
    """Windowed keyed stream (reference WindowedStream): ``aggregate`` is
    the incremental (no-buffer) path, exactly like reference reduce/
    aggregate — Spark's windowed agg is incremental by construction."""

    def __init__(self, df: DataFrame, keys: list[str], assigner, ts_col: str):
        self._df = df
        self._keys = keys
        self._assigner = assigner
        self._ts = ts_col

    def aggregate(self, *aggs: Column, watermark: str | None = None) -> DataStream:
        from flink_1_3_2_hopsworks_spark.streaming import windows as _w

        a = self._assigner
        if isinstance(a, TumblingEventTimeWindows):
            out = _w.tumbling_window_agg(
                self._df, self._ts, a.size, self._keys, list(aggs), watermark
            )
        elif isinstance(a, SlidingEventTimeWindows):
            out = _w.sliding_window_agg(
                self._df, self._ts, a.size, a.slide, self._keys, list(aggs), watermark
            )
        elif isinstance(a, EventTimeSessionWindows):
            out = _w.session_window_agg(
                self._df, self._ts, a.gap, self._keys, list(aggs), watermark
            )
        else:
            raise TypeError(f"unknown window assigner: {a!r}")
        return DataStream(out)

    reduce = aggregate  # reference reduce == incremental aggregate


class CountWindowedStream:
    """countWindow(n[, slide]) (reference KeyedStream#countWindow —
    GlobalWindows + CountTrigger(slide or n) [+ CountEvictor(n)]): custom
    stateful op, no Spark built-in. ``aggregate(value_col)`` emits
    (keys..., window_id, n, sum_value) per fired window."""

    def __init__(
        self,
        df: DataFrame,
        keys: list[str],
        size: int,
        slide: int | None,
        ts_col: str,
    ):
        self._df = df
        self._keys = keys
        self._size = size
        self._slide = slide
        self._ts = ts_col

    def aggregate(self, value_col: str) -> DataStream:
        from flink_1_3_2_hopsworks_spark.streaming.process import (
            count_window_agg_stream,
        )

        return DataStream(
            count_window_agg_stream(
                self._df,
                self._keys,
                self._size,
                value_col,
                ts_col=self._ts,
                slide=self._slide,
            )
        )

    sum = aggregate  # reference countWindow(...).sum(field)
