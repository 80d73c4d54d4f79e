"""Query-key registry shared by all operator modules.

Every operator from SURVEY.md §2 Part B registers a PySpark builder and
(where SQL-expressible) a DuckDB oracle string under the same key. The
driver contract (``__spark_entry__.py``) merges the per-module registries.

Determinism rules (so the driver's order-insensitive value-hash matches):
  * round every order-of-summation-dependent double aggregate (SUM/AVG over
    doubles) — per-row arithmetic is IEEE-deterministic and needs no rounding;
  * ...but ROUND(x, n) at n >= 1 is NOT engine-identical at representation
    boundaries: Spark rounds the SHORTEST DECIMAL REPR (BigDecimal.valueOf)
    while DuckDB rounds the BINARY double, and they disagree when the repr
    sits on the other side of a half from the binary value (first caught by
    the r14 sf0.1 sweep: q_quality_score off by 1e-4 on 8 of 50k rows, and
    q_tpch_q11_shape one cent off in a SUM). For exact-rational-derived
    values that can land on decimal halves, use ``ROUND(x * 10^n, 0) / 10^n``
    (at 0 decimals both engines agree on every double, including exact
    halves — both go away from zero), or quantize to scaled BIGINT before
    aggregating (the q11 integer-cents pattern) when the value also feeds a
    threshold compare;
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
