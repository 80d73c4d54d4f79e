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


def test_sweep_rotation_puts_unrecorded_keys_first():
    """The driver verifies a budget-capped prefix of queries() per round;
    never-recorded keys (this round's additions) must sort before any
    key with a green record, and recorded keys must sort stalest-first,
    so the rotation is self-maintaining."""
    qs = list(entry_mod.queries())
    seen = entry_mod._SEEN
    rounds = [seen.get(k, -1) for k in qs]
    assert rounds == sorted(rounds), "queries() must be stalest-first"
    if -1 in rounds and max(rounds) > -1:
        last_new = max(i for i, r in enumerate(rounds) if r == -1)
        first_old = min(i for i, r in enumerate(rounds) if r > -1)
        assert last_new < first_old


def test_no_unsafe_round_anywhere():
    """Contract determinism rule (contract.py): ``ROUND(x, n)`` at n >= 1
    is not engine-identical at representation boundaries — Spark rounds
    the shortest decimal repr, DuckDB the binary double. The r15 audit
    migrated every site (364 rewrites) to ``ROUND(x * 10^n, 0) / 10^n``;
    this guard greps BOTH every registered oracle string and the package
    source (Spark-side ``F.round`` + SQL strings) with the same
    paren-matching detector the migration used, so the class is extinct
    by construction, not by review."""
    import glob
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from round_migrate import find_unsafe, find_unsafe_sql_strings

    bad: list[str] = []
    for key, sql in entry_mod.oracle_sql().items():
        bad += [f"oracle[{key}]: {h}" for h in find_unsafe(sql, sql_only=True)]
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reactor_window_like_flink_spark",
    )
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        with open(path) as f:
            src = f.read()
        bad += [f"{os.path.basename(path)}: {h}" for h in find_unsafe(src)]
        # embedded spark.sql bodies: in pure SQL, lowercase round( is the
        # engine function — scan string literals that look like SQL with
        # the sql_only detector too (r15 ADVICE: the q_scalar_math gap)
        bad += [
            f"{os.path.basename(path)} [sql-string]: {h}"
            for h in find_unsafe_sql_strings(src)
        ]
    assert not bad, f"unsafe ROUND(x, n>=1) sites: {bad[:10]} (+{max(0, len(bad)-10)} more)"


def test_no_bare_container_columns(spark, sf_dir):
    """Contract determinism rule (contract.py): oracle-checked outputs
    must not emit bare array/map/struct columns — the driver's
    canonicalizer sorts raw cells and container cells are unhashable in
    pandas. List outputs must be CSV-encoded (q_agg_collect pattern).
    Rows-only keys are exempt: the driver never canonicalizes them."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    oracles = entry_mod.oracle_sql()
    bad = []
    for key in sorted(oracles):
        schema = entry_mod.queries()[key](spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{key}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"bare container columns in contract outputs: {bad}"


def test_every_oracle_sql_binds_in_duckdb(sf_dir):
    """Static contract guard: each registered oracle string must parse
    AND bind (tables, columns, functions) against the fixture views —
    catching oracle typos without waiting for the driver's full
    differential."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for key, sql in entry_mod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover - failure reporting
            raise AssertionError(f"{key}: oracle does not bind: {ex}") from ex
