"""Table API facade — the reference's relational program surface.

A user of the reference writes ``tEnv.registerTable("t", t); tEnv.sql(
"SELECT ...")`` or ``t.filter("a > 1").groupBy("k").select("k, b.sum as
total")`` with group windows ``t.window(Tumble over 1.hour on 'ts as 'w)``;
this module gives that program shape over Spark SQL / DataFrame (reference:
flink-table api/{TableEnvironment,BatchTableEnvironment,
StreamTableEnvironment}.scala, api/table.scala, api/windows.scala).

SURVEY.md §3.1: the reference's whole parse→validate→optimize→codegen
pipeline maps 1:1 onto Catalyst + whole-stage codegen, so ``sql()`` is
literally ``spark.sql()`` and every fluent method is one DataFrame call —
the facade never materializes, keeping pushdown/pruning/join planning
intact across the full chain.

Expression strings: reference Table API accepts string expressions
(``"a, b as c"``); here ``select``/``filter`` accept either
``pyspark.sql.Column`` objects or SQL expression strings (routed through
``expr``/``selectExpr`` — same Catalyst parser as ``sql()``).

Streaming: a Table wrapping a streaming DataFrame flows through the same
methods (group windows apply watermarks exactly like streaming/windows.py);
``to_append_stream`` / ``to_retract_stream`` map to append vs update output
mode — update emits upserts rather than explicit (false, row) retractions,
the documented divergence (no retract channel in Structured Streaming).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as SparkWindow

from flink_1_3_2_hopsworks_spark.session import get_spark


def _to_cols(exprs: Sequence[Column | str]) -> list[Column]:
    return [F.expr(e) if isinstance(e, str) else e for e in exprs]


def _sort_expr(field: str) -> Column:
    """Parse a reference-style sort string: "v desc" / "v asc" / "v"."""
    parts = field.strip().rsplit(None, 1)
    if len(parts) == 2 and parts[1].lower() in ("asc", "desc"):
        col = F.expr(parts[0])
        return col.desc() if parts[1].lower() == "desc" else col.asc()
    return F.expr(field)


def _split_fields(fields: str) -> list[str]:
    """Split a reference-style field list string ("a, b, c") — names only,
    used by group_by/as_; full expressions go through Catalyst's parser."""
    return [f.strip() for f in fields.split(",") if f.strip()]


class TableEnvironment:
    """Catalog + SQL entry point (reference TableEnvironment.scala:
    registerTable / registerTableSource / registerFunction / sql / scan)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def create(cls, spark: SparkSession | None = None) -> "TableEnvironment":
        return cls(spark or get_spark())

    # -- catalog ---------------------------------------------------------

    def register_table(self, name: str, table: "Table | DataFrame") -> None:
        df = table.df if isinstance(table, Table) else table
        df.createOrReplaceTempView(name)

    def register_table_source(
        self, name: str, path: str, fmt: str = "parquet", schema=None, **options
    ) -> None:
        """File-backed source registration (reference registerTableSource —
        CsvTableSource/ParquetTableSource): a lazy DSv2 scan, so projection
        and filter pushdown reach the file format natively."""
        reader = self.spark.read.format(fmt).options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        reader.load(path).createOrReplaceTempView(name)

    def scan(self, name: str) -> "Table":
        return Table(self.spark.table(name))

    def register_function(self, name: str, fn: Callable, return_type=None) -> None:
        """Scalar UDF registration (reference registerFunction). ``fn`` may
        already be a ``pandas_udf``/``udf`` — registered as-is (Arrow fast
        path); plain callables become row UDFs (the documented slow path)."""
        self.spark.udf.register(name, fn, return_type)

    # -- SQL -------------------------------------------------------------

    def sql(self, query: str) -> "Table":
        """``tEnv.sql(...)`` — the reference's Calcite parse→validate→
        optimize pipeline is Catalyst here (SURVEY §3.1 step map)."""
        return Table(self.spark.sql(query))

    def from_data_frame(self, df: DataFrame, fields: str | None = None) -> "Table":
        t = Table(df)
        return t.as_(fields) if fields else t

    # -- conversions (reference BatchTableEnvironment.toDataSet /
    #    StreamTableEnvironment.toAppendStream/toRetractStream) -----------

    def to_data_set(self, table: "Table"):
        from flink_1_3_2_hopsworks_spark.api import DataSet

        return DataSet(table.df)

    def to_append_stream(self, table: "Table"):
        """Append-only result stream: ``writeStream.outputMode("append")``."""
        return table.df.writeStream.outputMode("append")

    def to_retract_stream(self, table: "Table"):
        """Retract stream ≈ update mode: changed aggregate rows re-emit
        (upsert) instead of (false, oldRow)/(true, newRow) pairs."""
        return table.df.writeStream.outputMode("update")


# Reference has BatchTableEnvironment / StreamTableEnvironment subclasses;
# Spark needs no split — same DataFrame surface both modes.
BatchTableEnvironment = TableEnvironment
StreamTableEnvironment = TableEnvironment


class Table:
    """Fluent relational table (reference api/table.scala). Holds a lazy
    DataFrame; every method is a single Catalyst plan node."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- projections / filters ------------------------------------------

    def select(self, *exprs: Column | str) -> "Table":
        return Table(self.df.select(*_to_cols(exprs)))

    def as_(self, fields: str) -> "Table":
        """Positional rename (reference ``as('a, 'b)``)."""
        return Table(self.df.toDF(*_split_fields(fields)))

    def filter(self, predicate: Column | str) -> "Table":
        return Table(self.df.filter(predicate))

    where = filter

    def add_columns(self, **named_exprs: Column | str) -> "Table":
        out = self.df
        for name, e in named_exprs.items():
            out = out.withColumn(name, F.expr(e) if isinstance(e, str) else e)
        return Table(out)

    def rename_columns(self, **renames: str) -> "Table":
        out = self.df
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return Table(out)

    def drop_columns(self, fields: str) -> "Table":
        return Table(self.df.drop(*_split_fields(fields)))

    # -- aggregations ----------------------------------------------------

    def group_by(self, *fields: Column | str) -> "GroupedTable":
        keys: list[Column | str] = []
        for f in fields:
            keys.extend(_split_fields(f) if isinstance(f, str) else [f])
        return GroupedTable(self.df, keys)

    def distinct(self) -> "Table":
        return Table(self.df.distinct())

    # -- joins (reference table.scala join/leftOuterJoin/...; condition is
    #    an expression — both Tables' columns visible) --------------------

    def _join(self, other: "Table", on, how: str) -> "Table":
        cond = F.expr(on) if isinstance(on, str) else on
        return Table(self.df.join(other.df, cond, how))

    def join(self, other: "Table", on: Column | str) -> "Table":
        return self._join(other, on, "inner")

    def left_outer_join(self, other: "Table", on: Column | str) -> "Table":
        return self._join(other, on, "left")

    def right_outer_join(self, other: "Table", on: Column | str) -> "Table":
        return self._join(other, on, "right")

    def full_outer_join(self, other: "Table", on: Column | str) -> "Table":
        return self._join(other, on, "full")

    # -- set ops (reference union/unionAll/intersect/minus[All]) ----------

    def union(self, other: "Table") -> "Table":
        return Table(self.df.unionByName(other.df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self.df.unionByName(other.df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self.df.intersect(other.df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self.df.intersectAll(other.df))

    def minus(self, other: "Table") -> "Table":
        # subtract == set EXCEPT: a row present in BOTH sides is removed
        # entirely (exceptAll().distinct() would keep it when the left
        # multiplicity exceeds the right's — not Flink minus semantics).
        return Table(self.df.subtract(other.df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self.df.exceptAll(other.df))

    # -- sort / page (reference orderBy/offset/fetch) ---------------------

    def order_by(self, *fields: Column | str) -> "Table":
        cols = [_sort_expr(f) if isinstance(f, str) else f for f in fields]
        return Table(self.df.orderBy(*cols))

    def fetch(self, n: int) -> "Table":
        return Table(self.df.limit(n))

    limit = fetch

    def offset(self, n: int) -> "Table":
        return Table(self.df.offset(n))

    # -- group windows (reference table.window(Tumble/Slide/Session ...)) -

    def window(self, w: "GroupWindow") -> "GroupWindowedTable":
        return GroupWindowedTable(self.df, w)

    # -- actions ---------------------------------------------------------

    def to_data_frame(self) -> DataFrame:
        return self.df

    def collect(self) -> list:
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()

    def explain(self, mode: str = "formatted") -> None:
        self.df.explain(mode)

    def insert_into(self, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
        self.df.write.mode(mode).format(fmt).save(path)


class GroupedTable:
    """Post-groupBy table (reference GroupedTable): ``select`` holds the
    aggregate expressions — ONE hash-aggregate."""

    def __init__(self, df: DataFrame, keys: list[Column | str]):
        self._df = df
        self._keys = keys

    def select(self, *aggs: Column | str) -> Table:
        # Reference GroupedTable.select lists the keys alongside aggregates;
        # Spark's agg() auto-prepends groupBy keys, so drop bare key names.
        key_names = {k for k in self._keys if isinstance(k, str)}
        exprs = [a for a in aggs if not (isinstance(a, str) and a.strip() in key_names)]
        return Table(self._df.groupBy(*self._keys).agg(*_to_cols(exprs)))


# ---------------------------------------------------------------------------
# Group windows (reference api/windows.scala: Tumble / Slide / Session) —
# builder shape mirrors `Tumble over 1.hour on 'ts as 'w`.
# ---------------------------------------------------------------------------


class GroupWindow:
    """Common shape: produces the Spark grouping column + its struct name."""

    alias_name = "w"
    ts_col: str

    def with_alias(self, name: str) -> "GroupWindow":
        self.alias_name = name
        return self

    # subclass contract
    def grouping_column(self) -> Column:
        raise NotImplementedError

    window_struct = "window"


class Tumble:
    @staticmethod
    def over(size: str) -> "TumbleWindow":
        return TumbleWindow(size)


class TumbleWindow(GroupWindow):
    def __init__(self, size: str):
        self.size = size

    def on(self, ts_col: str) -> "TumbleWindow":
        self.ts_col = ts_col
        return self

    def grouping_column(self) -> Column:
        return F.window(self.ts_col, self.size)


class Slide:
    @staticmethod
    def over(size: str) -> "SlideWindow":
        return SlideWindow(size)


class SlideWindow(GroupWindow):
    def __init__(self, size: str):
        self.size = size
        self.slide = size

    def every(self, slide: str) -> "SlideWindow":
        self.slide = slide
        return self

    def on(self, ts_col: str) -> "SlideWindow":
        self.ts_col = ts_col
        return self

    def grouping_column(self) -> Column:
        return F.window(self.ts_col, self.size, self.slide)


class Session:
    @staticmethod
    def with_gap(gap: str) -> "SessionWindow":
        return SessionWindow(gap)


class SessionWindow(GroupWindow):
    window_struct = "session_window"

    def __init__(self, gap: str):
        self.gap = gap

    def on(self, ts_col: str) -> "SessionWindow":
        self.ts_col = ts_col
        return self

    def grouping_column(self) -> Column:
        return F.session_window(self.ts_col, self.gap)


class GroupWindowedTable:
    """``t.window(w).group_by("w, k").select(aggs)`` (reference
    WindowedTable/WindowGroupedTable). Output carries
    ``<alias>_start`` / ``<alias>_end`` (≈ 'w.start / 'w.end window
    properties). Works identically on batch and streaming input; pass
    ``watermark=`` for event-time streams."""

    def __init__(self, df: DataFrame, w: GroupWindow):
        self._df = df
        self._w = w

    def group_by(self, fields: str) -> "WindowGroupedTable":
        names = _split_fields(fields)
        if self._w.alias_name not in names:
            raise ValueError(
                f"group_by must include the window alias {self._w.alias_name!r} "
                "(reference WindowedTable.groupBy requires 'w)"
            )
        keys = [n for n in names if n != self._w.alias_name]
        return WindowGroupedTable(self._df, self._w, keys)


class WindowGroupedTable:
    def __init__(self, df: DataFrame, w: GroupWindow, keys: list[str]):
        self._df = df
        self._w = w
        self._keys = keys

    def select(self, *aggs: Column | str, watermark: str | None = None) -> Table:
        df = self._df
        if watermark is not None and df.isStreaming:
            df = df.withWatermark(self._w.ts_col, watermark)
        out = df.groupBy(self._w.grouping_column(), *self._keys).agg(*_to_cols(aggs))
        a, struct = self._w.alias_name, self._w.window_struct
        agg_cols = [c for c in out.columns if c != struct and c not in self._keys]
        return Table(
            out.select(
                F.col(f"{struct}.start").alias(f"{a}_start"),
                F.col(f"{struct}.end").alias(f"{a}_end"),
                *self._keys,
                *agg_cols,
            )
        )


# ---------------------------------------------------------------------------
# OVER windows (reference api/windows.scala Over + table.scala overWindows):
# builder yields a pyspark WindowSpec, used as `F.sum("v").over(w.spec)`.
# ---------------------------------------------------------------------------

UNBOUNDED = SparkWindow.unboundedPreceding
CURRENT_ROW = SparkWindow.currentRow


class Over:
    """``Over.partition_by("k").order_by("ts").preceding(3).rows()`` →
    ``.spec`` is a WindowSpec (reference Over partitionBy orderBy
    preceding). ``rows()``/``range_()`` pick ROWS vs RANGE frames; default
    frame is UNBOUNDED PRECEDING → CURRENT ROW, like the reference."""

    def __init__(self):
        self._partition: list = []
        self._order: list = []
        self._preceding = UNBOUNDED
        self._mode = "rows"

    @staticmethod
    def partition_by(*fields: Column | str) -> "Over":
        o = Over()
        o._partition = list(fields)
        return o

    def order_by(self, *fields: Column | str) -> "Over":
        self._order = [_sort_expr(f) if isinstance(f, str) else f for f in fields]
        return self

    def preceding(self, n) -> "Over":
        self._preceding = -abs(n) if isinstance(n, int) else n
        return self

    def rows(self) -> "Over":
        self._mode = "rows"
        return self

    def range_(self) -> "Over":
        self._mode = "range"
        return self

    @property
    def spec(self):
        s = SparkWindow.partitionBy(*self._partition).orderBy(*self._order)
        if self._mode == "rows":
            return s.rowsBetween(self._preceding, CURRENT_ROW)
        return s.rangeBetween(self._preceding, CURRENT_ROW)
