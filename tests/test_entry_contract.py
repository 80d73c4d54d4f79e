"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() are
consistent, and every query key builds and executes at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "l_returnflag" in df.columns
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 58


@pytest.mark.parametrize("key", sorted(entry_mod.queries()))
def test_query_executes(spark, sf_dir, key):
    df = entry_mod.queries()[key](spark, sf_dir)
    # limit(5) keeps this a smoke pass; full-result correctness is the
    # DuckDB oracle differential (tools/verify_oracle.py, driver-run).
    df.limit(5).collect()
