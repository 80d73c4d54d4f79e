"""Query-key registry shared by all operator modules.

Every operator from SURVEY.md §2 Part B registers a PySpark builder and
(where SQL-expressible) a DuckDB oracle string under the same key. The
driver contract (``__spark_entry__.py``) merges the per-module registries.

Determinism rules (so the driver's order-insensitive value-hash matches):
  * round every order-of-summation-dependent double aggregate (SUM/AVG over
    doubles) — per-row arithmetic is IEEE-deterministic and needs no rounding;
  * cast DuckDB ``count``/``sum`` of integers to BIGINT (DuckDB widens to
    HUGEINT, Spark stays at LongType);
  * emit computed timestamps as epoch-seconds BIGINT or formatted strings
    (Spark TIMESTAMP_LTZ vs DuckDB naive timestamps hash differently);
  * break every window/sort ordering tie with a unique key column;
  * NO bare array/map/struct columns in contract outputs — the driver's
    canonicalizer sorts raw cells and list cells are unhashable there
    (pandas ``sort_values`` raises ``TypeError: unhashable type``). Encode
    lists as CSV strings: sort in the element type first (numeric sort,
    THEN stringify), e.g. Spark
    ``array_join(transform(array_sort(xs), x -> string(x)), ',')`` vs
    DuckDB ``array_to_string(list_transform(list_sort(xs), x ->
    CAST(x AS VARCHAR)), ',')``. Enforced by
    ``tests/test_contract.py::test_no_bare_container_columns``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class Registry:
    """Per-module collection of (query builder, oracle SQL) pairs."""

    def __init__(self) -> None:
        self.queries: dict[str, QueryFn] = {}
        self.oracle: dict[str, str] = {}

    def add(self, name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            self.queries[name] = fn
            if sql is not None:
                self.oracle[name] = sql
            return fn

        return deco


def merge(*registries: Registry) -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, Any] = {}
    oracle: dict[str, str] = {}
    for reg in registries:
        overlap = queries.keys() & reg.queries.keys()
        if overlap:
            raise ValueError(f"duplicate query keys across modules: {sorted(overlap)}")
        queries.update(reg.queries)
        oracle.update(reg.oracle)
    return queries, oracle
