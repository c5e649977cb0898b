"""Key-schema helpers for stateful streaming operators.

The reference's keyed operators carry the key type through keyBy's
TypeInformation (flink-streaming-java KeyedStream); the Spark analogues
here build an explicit output-schema DDL for applyInPandasWithState, so
key field types must be DERIVED from the input DataFrame's schema rather
than assumed integer (r1 advice: string / non-integer keys crashed the
hard-coded ``{k} long`` schemas).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FLOATING = (FloatType, DoubleType)


def key_fields_ddl(df: DataFrame, keys: Sequence[str]) -> str:
    """``"k1 bigint, k2 string"`` — key columns typed from ``df.schema``."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [k for k in keys if k not in by_name]
    if missing:
        raise KeyError(f"key column(s) {missing} not in {list(by_name)}")
    return ", ".join(f"{k} {by_name[k].simpleString()}" for k in keys)


def _py_cast(dt: DataType):
    if isinstance(dt, _INTEGRAL):
        return int
    if isinstance(dt, _FLOATING):
        return float
    if isinstance(dt, StringType):
        return str
    if isinstance(dt, BooleanType):
        return bool
    return lambda v: v


def key_casters(df: DataFrame, keys: Sequence[str]):
    """Per-key converters numpy-scalar → plain-python value (JSON/pandas
    safe), typed from the schema instead of a blanket ``int``."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    return [_py_cast(by_name[k]) for k in keys]


def key_py_values(casters, key_tuple) -> tuple:
    """Apply ``key_casters`` output to a groupBy key tuple (or its prefix)."""
    return tuple(c(v) for c, v in zip(casters, key_tuple))
