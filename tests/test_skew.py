"""Join-side skew resilience for the dedup family.

The LSH candidate joins (``q_dedup_near``/``q_dedup_embedding``/SimHash
chunk join) self-join on bucket keys; real corpora produce hot buckets
(boilerplate, templated pages), so one (band_id, band_hash) key can carry
orders of magnitude more rows than the median. The engine's posture
(``session.py``: AQE + skewJoin enabled) is that Spark splits such a
partition across tasks at runtime instead of funneling it through one
straggler. These tests prove that posture on a deliberately hot bucket:
the executed plan must show the skew-split sort-merge join AND the pair
output must stay exact.

Aggregation-side skew is covered separately by ``q_agg_salted``
(`operators/relational.py:450`); this file is the join-side counterpart
the round-3 verdict asked for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def skew_conf(spark):
    """Force the hot bucket through AQE's skew-split path at test scale:
    tiny split thresholds (the defaults target 256 MB partitions), no
    broadcast (a broadcast join would hide the skew entirely — valid at
    test scale, impossible when both sides are 100 TB-shaped), and
    forceOptimizeSkewedJoin so an extra shuffle doesn't veto the split."""
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    yield
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _bands(spark, hot_n: int, cold_buckets: int):
    """A bands table shaped like the LSH candidate input: one hot
    (band_id, band_hash) bucket with ``hot_n`` docs, ``cold_buckets``
    singleton buckets, and an incompressible payload standing in for the
    carried columns so the hot shuffle partition has real bytes."""
    hot = spark.range(hot_n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_id"),
        F.lit(7777777).alias("band_hash"),
    )
    cold = spark.range(10_000_000, 10_000_000 + cold_buckets).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_id"),
        F.col("id").alias("band_hash"),
    )
    return (
        hot.unionAll(cold)
        # ~16 mapper tasks: AQE splits a skewed reduce partition along
        # mapper-output boundaries, so the hot bucket must come from >1 map
        .repartition(16)
        .withColumn(
            "payload",
            F.concat(*[F.sha2(F.concat_ws("-", "doc_id", F.lit(i)), 256)
                       for i in range(4)]),
        )
    )


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hot_lsh_bucket_splits_not_straggles(spark, skew_conf):
    """One bucket holding 1,500 of 2,500 docs: the candidate self-join
    (same shape as q_dedup_near's band join) must run as a skew-split
    sort-merge join — the hot partition fans out across tasks — and emit
    exactly C(hot_n, 2) pairs (singleton buckets emit none). Summing the
    payload lengths keeps the payload columns in the shuffled rows
    (count(*) alone would let the optimizer prune them to nothing) and
    pins the exact bytes surviving the split."""
    hot_n, cold_buckets = 1500, 1000
    bands = _bands(spark, hot_n, cold_buckets)
    a, b = bands.alias("a"), bands.alias("b")
    res = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.payload").alias("pa"),
            F.col("b.payload").alias("pb"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.length("pa") + F.length("pb")).alias("payload_chars"),
        )
    )
    row = res.collect()[0]
    expected = hot_n * (hot_n - 1) // 2
    assert row["n_pairs"] == expected  # exact under the split
    assert row["payload_chars"] == expected * 2 * 4 * 64  # no row lost/duped
    plan = _executed_plan(res)
    assert "skew=true" in plan, (
        "hot bucket did not take the AQE skew-split path:\n" + plan
    )


def test_skew_split_off_means_single_task_funnel(spark, skew_conf):
    """Control for the test above: with skewJoin disabled the same join
    keeps the hot bucket in one reduce partition (no skew=true in the
    plan) — i.e. the split in the main test is genuinely AQE's doing,
    not an artifact of the fixture."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        bands = _bands(spark, 800, 200)
        a, b = bands.alias("a"), bands.alias("b")
        res = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.length(F.col("a.payload"))).alias("payload_chars"),
        )
        assert res.collect()[0]["n_pairs"] == 800 * 799 // 2
        assert "skew=true" not in _executed_plan(res)
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
