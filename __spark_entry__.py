"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped aggregate at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 Part B, merged from the per-module registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Imports propagate on failure deliberately: a broken module must fail the
# whole contract loudly, not silently shrink queries() (a vanished registry
# group would read as "unimplemented" downstream, which is worse than a
# traceback naming the module).
from reactor_window_like_flink_spark.contract import merge
from reactor_window_like_flink_spark.functions import (
    EXTENSIONS_REG as _EXTENSIONS,
)
from reactor_window_like_flink_spark.functions import SCALAR_REG as _SCALAR
from reactor_window_like_flink_spark.llm import REGS as _LLM_REGS
from reactor_window_like_flink_spark.operators.relational import REG as _RELATIONAL
from reactor_window_like_flink_spark.streaming.joins import (
    REG as _STREAMING_JOINS,
)
from reactor_window_like_flink_spark.streaming.windows import REG as _STREAMING

# Registration order = the order a budget-limited sweep visits keys. The
# streaming/LLM/extension groups go first: the relational+scalar groups were
# fully verified in an earlier sweep that stopped at key 50, so
# front-loading the previously-unrecorded groups makes any prefix of this
# order maximally informative. Within that, the Python-extension group
# (grouped-agg pandas UDF / UDTF) runs after the pure-JVM groups so an
# environment-specific Python-worker failure can't mask them.
_ALL_REGS = [
    _STREAMING,
    _STREAMING_JOINS,
    *_LLM_REGS,
    _EXTENSIONS,
    _RELATIONAL,
    _SCALAR,
]

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
