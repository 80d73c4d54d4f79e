"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-shaped aggregate at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 Part B, merged from the per-module registries.
"""

from __future__ import annotations

import glob
import json
import os
import re
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
from reactor_window_like_flink_spark.operators.analytics import (
    REG as _ANALYTICS,
)
from reactor_window_like_flink_spark.operators.relational import REG as _RELATIONAL
from reactor_window_like_flink_spark.operators.sketches import REG as _SKETCHES
from reactor_window_like_flink_spark.streaming.joins import (
    REG as _STREAMING_JOINS,
)
from reactor_window_like_flink_spark.streaming.windows import REG as _STREAMING

# Within a registry group, the Python-extension group (grouped-agg pandas
# UDF / UDTF) runs after the pure-JVM groups so an environment-specific
# Python-worker failure can't mask them.
_ALL_REGS = [
    _STREAMING,
    _STREAMING_JOINS,
    *_LLM_REGS,
    _EXTENSIONS,
    _RELATIONAL,
    _ANALYTICS,
    _SKETCHES,
    _SCALAR,
]

_QUERIES, _ORACLE = merge(*_ALL_REGS)


def _last_recorded_round() -> dict[str, int]:
    """Newest CORRECTNESS_r*.json round in which each key has any record.
    The driver's per-round sweep visits keys in ``queries()`` order and
    stops at a budget cap (50 keys in r2/r3), so no single round records
    everything; sorting keys stalest-first below makes every round's
    prefix re-verify exactly the keys whose green record is oldest, and
    the rotation maintains itself as new rounds land."""
    here = os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                records = json.load(f)
        except (OSError, ValueError):
            continue
        for key, rec in records.items():
            if not isinstance(rec, dict):
                continue
            # A harness-error record (err set, other than the rows-only
            # marker "no_oracle") is NOT a verification: the key must
            # sort as stale as a never-recorded one so it re-sweeps
            # immediately (r5's canonicalizer error left two green-coded
            # keys with only an error record for two rounds). Likewise a
            # FAILED comparison (rows/schema/hash false) is not a
            # verification — without this, r12's q_degree_assortativity
            # hash-FAIL would count as its newest record and push the
            # key to the BACK of the rotation just when its fix needs
            # immediate re-verification.
            err = rec.get("err")
            if err is not None and err != "no_oracle":
                continue
            if any(
                rec.get(field) is False
                for field in ("rows_match", "schema_match", "hash_match")
            ):
                continue
            seen[key] = max(seen.get(key, -1), rnd)
    return seen


# Sweep order: never-recorded keys first, then by oldest newest-record
# round, ties broken by registration order (pure-JVM groups before pandas).
_SEEN = _last_recorded_round()
_REG_INDEX = {key: i for i, key in enumerate(_QUERIES)}
_QUERIES = {
    key: _QUERIES[key]
    for key in sorted(_QUERIES, key=lambda k: (_SEEN.get(k, -1), _REG_INDEX[k]))
}


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
