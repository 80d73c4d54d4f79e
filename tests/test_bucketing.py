"""Bucketed co-located join: pre-bucketing both sides on the join key
removes the shuffle entirely — the repeated-join lever at 100 TB (pay the
shuffle once at write time, never again per query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reactor_window_like_flink_spark.plans import formatted_plan
from reactor_window_like_flink_spark.sources.tables import load


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the exchange elision is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    joined = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = formatted_plan(joined)
    assert "Exchange" not in plan  # co-located: no shuffle on either side
    # and the result is identical to the shuffled join
    want = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    assert joined.count() == want
