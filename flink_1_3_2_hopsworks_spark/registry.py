"""Central query registry — the contract surface for ``__spark_entry__``.

Every implemented operator/query from SURVEY.md §2 registers here with
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first plan), and
  - optionally a DuckDB-runnable ANSI-SQL oracle string (omitted only for
    genuinely non-SQL-expressible ops, which get a rows-only check).

Domain modules each expose their own ``QUERIES``/``ORACLE`` pair; this module
merges them. Names are globally unique.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def register_module(module, oracle_map: dict[str, str]) -> None:
    """Register every public ``(spark, sf_dir)`` function in ``module``."""
    for name, fn in inspect.getmembers(module, inspect.isfunction):
        if name.startswith("_") or fn.__module__ != module.__name__:
            continue
        params = list(inspect.signature(fn).parameters)
        if params[:2] == ["spark", "sf_dir"]:
            register(name, fn, oracle_map.get(name))


def _load_all() -> None:
    if _QUERIES:
        return
    from flink_1_3_2_hopsworks_spark.plans import (
        tpch,
        tpch_extra,
        tpch_extra_oracle,
        tpch_full,
        tpch_full_oracle,
        tpch_oracle,
    )

    register_module(tpch, tpch_oracle.ORACLE)
    register_module(tpch_extra, tpch_extra_oracle.ORACLE)
    register_module(tpch_full, tpch_full_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.operators import showcase, showcase_oracle

    register_module(showcase, showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.functions import showcase as fn_showcase
    from flink_1_3_2_hopsworks_spark.functions import (
        showcase_oracle as fn_showcase_oracle,
    )

    register_module(fn_showcase, fn_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.dedup import showcase as dd_showcase
    from flink_1_3_2_hopsworks_spark.dedup import (
        showcase_oracle as dd_showcase_oracle,
    )

    register_module(dd_showcase, dd_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.similarity import showcase as sim_showcase
    from flink_1_3_2_hopsworks_spark.similarity import (
        showcase_oracle as sim_showcase_oracle,
    )

    register_module(sim_showcase, sim_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.graph import showcase as gr_showcase
    from flink_1_3_2_hopsworks_spark.graph import (
        showcase_oracle as gr_showcase_oracle,
    )

    register_module(gr_showcase, gr_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.streaming import showcase as st_showcase
    from flink_1_3_2_hopsworks_spark.streaming import (
        showcase_oracle as st_showcase_oracle,
    )

    register_module(st_showcase, st_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark import table_showcase, table_showcase_oracle

    register_module(table_showcase, table_showcase_oracle.ORACLE)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
