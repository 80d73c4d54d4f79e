"""Bloom-filtered join: the properties the DuckDB oracle cannot see.

The oracle proves q_join_bloom's RESULT equals the plain join; these
tests pin the physical contract that makes the bloom worth shipping —
no false negatives at the pre-filter, and a real probe-side reduction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.operators.relational import (
    BLOOM_SEEDS,
    _bloom_probe_sql,
    build_bloom_bitmap,
    q_tpch_q18_shape,
    Q18_QTY_THRESHOLD,
)
from reactor_window_like_flink_spark.sources.tables import load


def _probed(spark, sf_dir):
    """Lineitem rows surviving the bloom pre-filter (before the join)."""
    dim = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .select("o_orderkey")
    )
    dense = build_bloom_bitmap(dim, "o_orderkey")
    bloom_df = spark.createDataFrame([(dense,)], "bloom array<bigint>")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    pred = " AND ".join(_bloom_probe_sql("l_orderkey", s) for s in BLOOM_SEEDS)
    return dim, li, li.crossJoin(F.broadcast(bloom_df)).filter(F.expr(pred))


def test_bloom_prefilter_no_false_negatives_and_reduces(spark, sf_dir):
    dim, li, probed = _probed(spark, sf_dir)
    dim_keys = {r[0] for r in dim.collect()}
    passed = [r[0] for r in probed.collect()]
    total = li.count()
    matching = li.filter(F.col("l_orderkey").isin(dim_keys)).count()
    # no false negatives: every truly-matching row survives the filter
    assert sum(1 for k in passed if k in dim_keys) == matching
    # real reduction: the pre-filter kills the overwhelming non-match mass
    # (m=2^20 bits over O(100) keys -> FPR ~ 0; selectivity ~ matching/total)
    assert len(passed) < total * 0.2
    assert len(passed) >= matching


def test_bloom_result_equals_plain_join(spark, sf_dir):
    plain = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").filter(
                (F.col("o_orderpriority") == "1-URGENT")
                & (
                    F.col("o_orderdate")
                    >= F.lit("1995-01-01").cast("timestamp")
                )
                & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
    got = {
        tuple(r)
        for r in entry_mod.queries()["q_join_bloom"](spark, sf_dir).collect()
    }
    assert got == {tuple(r) for r in plain.collect()}


def test_q18_outputs_only_qualifying_orders(spark, sf_dir):
    rows = q_tpch_q18_shape(spark, sf_dir).collect()
    assert rows, "fixture should contain orders above the threshold"
    assert all(r["sum_qty"] > Q18_QTY_THRESHOLD for r in rows)
    # one row per qualifying order, cross-checked by an independent agg
    li = load(spark, sf_dir, "lineitem")
    expect = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > Q18_QTY_THRESHOLD)
        .count()
    )
    assert len(rows) == expect
    assert len({r["o_orderkey"] for r in rows}) == expect
