"""KLL mergeable-quantile rollup (``operators/sketches.py``):
distributed == sequential reference, distribution-free rank error on
adversarial (Zipf) values, merge-path error, determinism, empties."""

from __future__ import annotations

from _round import rhalf

import numpy as np
import pytest

import __spark_entry__ as entry_mod
from reactor_window_like_flink_spark.operators.sketches import (
    KLL_K,
    KLL_QS,
    KLLSketch,
)


def _rank_error(values_sorted: np.ndarray, est: float, q: float) -> float:
    """Distance from q to the normalized rank INTERVAL [F(est-), F(est)]
    of the estimate — the quantity KLL bounds. The interval form handles
    heavy ties (Zipf mass on small integers): a value holding 38% of the
    mass is a correct answer for every q inside its rank span."""
    n = len(values_sorted)
    lo = np.searchsorted(values_sorted, est, side="left") / n
    hi = np.searchsorted(values_sorted, est, side="right") / n
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


# Deterministic compactor + geometric capacities: the classic analysis
# gives rank error O(log(n/k)/k); at k=200, n=50k the constant-free
# bound is ~0.04. Assert a fixed 0.03 envelope (everything here is
# deterministic, so this is a regression pin, not a flaky sample).
RANK_ERR_BOUND = 0.03


def test_kll_rank_error_on_zipf_values():
    rng = np.random.default_rng(42)
    vals = rng.zipf(1.5, size=50_000).astype("float64")  # heavy tail
    s = KLLSketch(KLL_K)
    s.extend(vals)
    vs = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.95, 0.99):
        err = _rank_error(vs, s.quantile(q), q)
        assert err <= RANK_ERR_BOUND, (q, err)


def test_kll_merge_of_chunks_holds_rank_error():
    """Merging 30 'daily' sketches must keep the same error class as the
    direct build — the mergeability property the rollup depends on."""
    rng = np.random.default_rng(7)
    vals = rng.zipf(1.8, size=60_000).astype("float64")
    chunks = np.array_split(vals, 30)
    acc = KLLSketch(KLL_K)
    for c in chunks:
        day = KLLSketch(KLL_K)
        day.extend(c)
        acc.merge(day)
    assert acc.n == len(vals)
    vs = np.sort(vals)
    for q in (0.5, 0.95, 0.99):
        err = _rank_error(vs, acc.quantile(q), q)
        assert err <= RANK_ERR_BOUND, (q, err)


def test_kll_is_deterministic():
    """Same data, same order -> bit-identical sketch and estimates (no
    RNG anywhere — the driver-contract requirement)."""
    rng = np.random.default_rng(3)
    vals = rng.zipf(2.0, size=20_000).astype("float64")
    a, b = KLLSketch(KLL_K), KLLSketch(KLL_K)
    a.extend(vals)
    b.extend(vals)
    assert a.to_row() == b.to_row()
    assert [a.quantile(q) for q in KLL_QS] == [b.quantile(q) for q in KLL_QS]


def test_kll_rollup_matches_sequential_reference(spark, sf_dir):
    """The registered key must equal a sequential single-process run of
    the SAME canonical schedule: per-(event_type, day) build in
    (ts, event_id) order, merge in day order — so the Spark grouping,
    ordering, and serialization add nothing to the math."""
    from reactor_window_like_flink_spark.sources.tables import load

    events = (
        load(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    events["day"] = events["ts"].dt.floor("D")

    want = {}
    for et, g in events.groupby("event_type"):
        acc = KLLSketch(KLL_K)
        for _, gd in sorted(g.groupby("day"), key=lambda kv: kv[0]):
            gd = gd.sort_values(["ts", "event_id"], kind="mergesort")
            day = KLLSketch(KLL_K)
            day.extend(gd["value"].to_numpy())
            acc.merge(day)
        for q in KLL_QS:
            want[(et, q)] = (rhalf(acc.quantile(q), 4), acc.n)

    got = {
        (r["event_type"], r["q"]): (r["est"], r["n_events"])
        for r in entry_mod.queries()["q_quantile_rollup_kll"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_kll_rollup_tracks_exact_percentiles(spark, sf_dir):
    """Estimates must sit within the rank-error envelope of the exact
    per-type percentiles on the fixture."""
    from reactor_window_like_flink_spark.sources.tables import load

    pdf = (
        load(spark, sf_dir, "events")
        .select("event_type", "value")
        .toPandas()
    )
    got = entry_mod.queries()["q_quantile_rollup_kll"](spark, sf_dir).collect()
    for r in got:
        vs = np.sort(
            pdf.loc[pdf["event_type"] == r["event_type"], "value"].to_numpy()
        )
        assert _rank_error(vs, r["est"], r["q"]) <= RANK_ERR_BOUND, r


def test_kll_rollup_empty_events(spark, tmp_path):
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(
        0
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = entry_mod.queries()["q_quantile_rollup_kll"](spark, str(tmp_path))
    assert out.collect() == []


def test_kll_empty_sketch_raises():
    with pytest.raises(ValueError):
        KLLSketch().quantile(0.5)
