"""DuckDB-oracle parity harness.

Mirrors the driver's correctness gate: run the Spark plan and the DuckDB
oracle SQL on the same parquet tables, then compare row count, column names,
and values order-insensitively (columns sorted by name, rows sorted by their
stringified tuple). Used by tests so parity failures surface locally before
the driver's per-round check.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from flink_1_3_2_hopsworks_spark.catalog import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list[str] = field(default_factory=list)


def _norm_cell(v):
    """Normalize one cell for cross-engine comparison (mirrors a value-hash:
    exact, not tolerance-based — queries must round unstable floats)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _norm_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    query_fn,
    oracle: str | None,
    con: duckdb.DuckDBPyConnection | None = None,
    max_mismatches: int = 5,
) -> ParityResult:
    df = query_fn(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    if oracle is None:
        return ParityResult(name, True, len(s_rows), -1, detail="rows-only (no oracle)")

    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    finally:
        if own_con:
            con.close()

    if sorted(s_cols) != sorted(o_cols):
        return ParityResult(
            name, False, len(s_rows), len(o_rows),
            detail=f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    _, ns = _norm_rows(s_cols, s_rows)
    cols, no = _norm_rows(o_cols, o_rows)
    if ns == no:
        return ParityResult(name, True, len(s_rows), len(o_rows))

    mismatches = []
    for i, (a, b) in enumerate(zip(ns, no)):
        if a != b:
            mismatches.append(f"row {i}: spark={a} oracle={b}")
            if len(mismatches) >= max_mismatches:
                break
    if len(ns) != len(no):
        mismatches.append(f"row-count: spark={len(ns)} oracle={len(no)}")
    return ParityResult(
        name, False, len(s_rows), len(o_rows),
        detail=f"value mismatch (cols={cols})", mismatches=mismatches,
    )
