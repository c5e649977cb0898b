"""Scalar function surface (Table API / SQL, Flink 1.3 §2.9).

Reference parity: expression ASTs in flink-table expressions/*.scala
(stringExpressions, mathExpressions, time, arithmetic, comparison, logic,
array, composite), registered in validate/FunctionCatalog.scala and
code-generated via codegen/calls/ScalarOperators.scala. Every function below
maps to a built-in Catalyst expression (JVM-side, whole-stage codegen) — no
Python in the hot path.

This module gives the reference's SQL-standard spellings as thin wrappers
where Spark's name differs; everything else is used directly from
``pyspark.sql.functions`` (see the showcase queries for the exercised set).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def char_length(s: Column | str) -> Column:
    """CHAR_LENGTH(s)."""
    return F.length(s)


def init_cap(s: Column | str) -> Column:
    """INIT_CAP(s)."""
    return F.initcap(s)


def position(sub: Column | str, s: Column | str) -> Column:
    """POSITION(sub IN s) — 1-based, 0 when absent."""
    return F.locate(sub if isinstance(sub, str) else sub, F.col(s) if isinstance(s, str) else s)


def substring_sql(s: Column | str, start: int, length: int | None = None) -> Column:
    """SUBSTRING(s FROM start [FOR length]) — 1-based."""
    if length is None:
        return F.substring(s, start, 2**31 - 1)
    return F.substring(s, start, length)


def overlay_sql(s: Column | str, replace: Column | str, pos: int, length: int | None = None) -> Column:
    """OVERLAY(s PLACING replace FROM pos [FOR length])."""
    if length is None:
        return F.overlay(s, replace, pos)
    return F.overlay(s, replace, pos, length)


def trim_sql(s: Column | str, mode: str = "BOTH", chars: str = " ") -> Column:
    """TRIM(BOTH|LEADING|TRAILING chars FROM s)."""
    mode = mode.upper()
    col = F.col(s) if isinstance(s, str) else s
    if chars == " ":
        return {"LEADING": F.ltrim, "TRAILING": F.rtrim}.get(mode, F.trim)(col)
    if mode == "BOTH":
        return F.btrim(col, F.lit(chars))
    # LEADING/TRAILING with custom chars: strip the other side's work via regex.
    pat = "".join(f"\\x{ord(c):02x}" for c in chars)
    regex = f"^[{pat}]+" if mode == "LEADING" else f"[{pat}]+$"
    return F.regexp_replace(col, regex, "")


def similar_to(s: Column | str, pattern: str) -> Column:
    """SIMILAR TO — SQL regex match (anchored, like Spark rlike with anchors)."""
    col = F.col(s) if isinstance(s, str) else s
    return col.rlike(f"^(?:{pattern})$")


def element(arr: Column) -> Column:
    """ELEMENT(a): unwrap a single-element array (error semantics relaxed to
    null-on-empty, first element otherwise)."""
    return F.element_at(arr, 1)


def cardinality(arr: Column) -> Column:
    """CARDINALITY(a)."""
    return F.size(arr)


def temporal_overlaps(
    start1: Column, end1: Column, start2: Column, end2: Column
) -> Column:
    """temporalOverlaps((s1, e1), (s2, e2)) — SQL OVERLAPS semantics:
    half-open interval intersection test."""
    return (start1 < end2) & (start2 < end1)


def quarter(ts: Column | str) -> Column:
    """QUARTER(date) (1.3)."""
    return F.quarter(ts)


def floor_to_unit(ts: Column | str, unit: str) -> Column:
    """FLOOR(t TO unit) — date_trunc."""
    return F.date_trunc(unit, ts)
