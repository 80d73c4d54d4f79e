"""Source/sink roundtrips: parquet (partitioned → pruned), CSV, JSON,
memory table, and a streaming console/memory sink smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactor_window_like_flink_spark.plans import formatted_plan
from reactor_window_like_flink_spark.sources.formats import read_csv, read_json
from reactor_window_like_flink_spark.sources.sinks import (
    to_memory_table,
    write_csv,
    write_json,
    write_parquet,
)
from reactor_window_like_flink_spark.sources.tables import load


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # equality filter on the partition column must become partition pruning
    pruned = back.filter(F.col("o_orderstatus") == "O")
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "O").count()
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(
        spark,
        path,
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    write_json(region, path)
    back = read_json(spark, path, "r_regionkey bigint, r_name string")
    assert back.count() == region.count()


def test_memory_table(spark, sf_dir):
    top = load(spark, sf_dir, "orders").orderBy(F.desc("o_totalprice")).limit(5)
    out = to_memory_table(spark, top, "t_top_orders")
    assert out.count() == 5
    assert spark.sql("SELECT count(*) FROM t_top_orders").first()[0] == 5


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from reactor_window_like_flink_spark.sources.formats import read_orc
    from reactor_window_like_flink_spark.sources.sinks import write_orc

    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "customer_orc")
    write_orc(customer, path)
    back = read_orc(
        spark, path, "c_custkey bigint, c_name string, c_acctbal double"
    )
    assert back.count() == customer.count()
    # predicate pushdown + column pruning reach the ORC scan, like parquet
    filtered = back.filter(F.col("c_acctbal") > 0).select("c_custkey")
    plan = formatted_plan(filtered)
    assert "PushedFilters" in plan and "c_acctbal" in plan
    assert filtered.count() == customer.filter(F.col("c_acctbal") > 0).count()


def test_register_views_enables_spark_sql_surface(spark, sf_dir):
    """The SQL-first entry point: after register_views, users can run
    plain spark.sql text against every fixture table."""
    from reactor_window_like_flink_spark.sources.tables import (
        TABLES,
        register_views,
    )

    register_views(spark, sf_dir)
    for t in TABLES:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0]["n"] > 0
    out = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert sum(r["n"] for r in out) == spark.table("customer").count()


def test_memory_table_cap_raises_instead_of_collecting(spark, sf_dir):
    import pytest

    from reactor_window_like_flink_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="max_rows"):
        to_memory_table(spark, li, "t_too_big", max_rows=100)
    # under the cap: works as before
    out = to_memory_table(spark, li.limit(5), "t_small", max_rows=100)
    assert out.count() == 5
