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


def test_quantile_rollup_error_bound_and_degenerate(spark, sf_dir):
    """The merged-histogram quantile estimate is within one bin width of
    the exact percentile (the fixed-bin guarantee), and an all-equal
    value column collapses to the constant without dividing by zero."""
    import reactor_window_like_flink_spark.operators.relational as rel
    from reactor_window_like_flink_spark.operators.relational import (
        QROLLUP_BINS,
    )

    events = load(spark, sf_dir, "events")
    mn, mx = events.agg(F.min("value"), F.max("value")).collect()[0]
    bin_w = (mx - mn) / QROLLUP_BINS
    vals: dict = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    out = entry_mod.queries()["q_quantile_rollup"](spark, sf_dir).collect()
    assert {r["event_type"] for r in out} == set(vals)
    for r in out:
        v = vals[r["event_type"]]
        n = len(v)
        # the inversion lands in the bin holding the ceil(q*n)-th order
        # statistic; within-bin interpolation bounds the estimate to one
        # bin width around the bracketing order statistics (the exact
        # percentile_cont value can drift further when it interpolates
        # across empty bins — that gap is data sparsity, not estimator
        # error, so the guarantee is stated against the order stats)
        k = max(1, min(n, -(-int(r["q"] * n * 1e9) // int(1e9))))  # ceil
        lo = v[max(0, k - 2)]
        hi = v[min(n - 1, k)]
        assert lo - bin_w - 1e-9 <= r["est"] <= hi + bin_w + 1e-9, (
            r["event_type"], r["q"], r["est"], lo, hi, bin_w
        )

    # degenerate: all values equal -> every quantile is the constant
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    const = spark.createDataFrame(
        [(i, t0, 1, "click", 7.5, "{}") for i in range(20)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = rel.load
    rel.load = lambda s, d, t: const
    try:
        rows = entry_mod.queries()["q_quantile_rollup"](
            spark, "unused"
        ).collect()
    finally:
        rel.load = orig
    assert len(rows) == 3
    assert all(r["est"] == 7.5 and r["n_events"] == 20 for r in rows)


def test_bitmap_rollup_exact_across_bucket_boundaries(spark, sf_dir):
    """q_bitmap_rollup equals COUNT(DISTINCT) exactly (driver oracle
    covers the fixture; this pins the bucket math on ids that straddle
    the 32768-bit bucket boundary and on duplicates)."""
    from pyspark.sql import functions as F

    ids = [1, 2, 32768, 32769, 70000, 70000, 1]  # 5 distinct, 2 buckets+
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    got = (
        df.groupBy(F.expr("bitmap_bucket_number(user_id)").alias("b"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
            .alias("bm")
        )
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        .first()["n"]
    )
    assert got == len(set(ids))
    # merge property: two half-streams OR-merged == one pass
    half_a, half_b = ids[:4], ids[4:]
    def bitmaps(vals):
        return (
            spark.createDataFrame([(i,) for i in vals], "user_id long")
            .groupBy(F.expr("bitmap_bucket_number(user_id)").alias("b"))
            .agg(
                F.expr(
                    "bitmap_construct_agg(bitmap_bit_position(user_id))"
                ).alias("bm")
            )
        )
    merged = (
        bitmaps(half_a).unionByName(bitmaps(half_b))
        .groupBy("b")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        .first()["n"]
    )
    assert merged == len(set(ids))

    # and the registered key agrees with a direct COUNT(DISTINCT)
    import __spark_entry__ as entry_mod
    from reactor_window_like_flink_spark.sources.tables import load

    got_rows = {
        (r["event_type"], r["month"]): r["n_users"]
        for r in entry_mod.queries()["q_bitmap_rollup"](spark, sf_dir).collect()
    }
    want_rows = {
        (r["event_type"], r["month"]): r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("month"),
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got_rows == want_rows


def test_agg_approx_distinct_close_to_exact(spark, sf_dir):
    """q_agg_approx_distinct's rows-only evidence (SURVEY §5 table):
    the HLL++ estimate per event_type lands within the configured rsd
    (0.01 -> allow 5%) of the exact distinct-user count."""
    est = {
        r["event_type"]: r["approx_users"]
        for r in entry_mod.queries()["q_agg_approx_distinct"](
            spark, sf_dir
        ).collect()
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
        assert abs(e - exact[k]) <= max(2, 0.05 * exact[k]), (k, e, exact[k])
