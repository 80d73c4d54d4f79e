"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped aggregate at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 Part B, merged from the per-module registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reactor_window_like_flink_spark.contract import merge
from reactor_window_like_flink_spark.operators.relational import REG as _RELATIONAL

_ALL_REGS = [_RELATIONAL]

try:  # scalar-function + UDF/UDAF/UDTF surface (keys 34-39, 51)
    from reactor_window_like_flink_spark.functions import (
        EXTENSIONS_REG as _EXTENSIONS,
    )
    from reactor_window_like_flink_spark.functions import SCALAR_REG as _SCALAR

    _ALL_REGS.extend([_SCALAR, _EXTENSIONS])
except ImportError:
    pass

try:  # streaming window surface (keys 40-45)
    from reactor_window_like_flink_spark.streaming.joins import (
        REG as _STREAMING_JOINS,
    )
    from reactor_window_like_flink_spark.streaming.windows import REG as _STREAMING

    _ALL_REGS.extend([_STREAMING, _STREAMING_JOINS])
except ImportError:
    pass

try:  # LLM-pipeline surface (keys 46-50 + training-data extras)
    from reactor_window_like_flink_spark.llm import REGS as _LLM_REGS

    _ALL_REGS.extend(_LLM_REGS)
except ImportError:
    pass

_QUERIES, _ORACLE = merge(*_ALL_REGS)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_agg_group, TPC-H Q1 shape) on sf0.001."""
    return _QUERIES["q_agg_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part B."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key; keys absent here are
    verified rows-only (non-SQL-expressible per SURVEY.md §2)."""
    return dict(_ORACLE)
