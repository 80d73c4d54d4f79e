"""Mergeable pre-aggregation invariants: HLL sketch rollup accuracy and
continuous-aggregate (daily -> monthly) equivalence."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.sources.tables import load


def test_hll_rollup_estimate_close_to_exact(spark, sf_dir):
    est = {
        r["event_type"]: r["est_users"]
        for r in entry_mod.queries()["q_hll_rollup"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        # lgConfigK=12 -> relative error ~1.6%; allow 5%
        assert abs(e - exact[k]) <= max(2, 0.05 * exact[k]), (k, e, exact[k])


def test_reagg_rollup_equals_direct_monthly(spark, sf_dir):
    """Sum-of-daily-sums must equal the direct monthly aggregation — the
    contract that lets coarse windows be served from a materialized daily
    rollup."""
    got = {
        (r["event_type"], r["month"]): (r["n_events"], r["sum_value"])
        for r in entry_mod.queries()["q_reagg_rollup"](spark, sf_dir).collect()
    }
    direct = {
        (r["event_type"], r["month"]): (r["n"], r["s"])
        for r in load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == direct
