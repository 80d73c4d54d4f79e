"""SparkSession factory.

One place for every scale-relevant config so local tests and the 100 TB
posture share a single tuning surface. The reference engine's physical
knobs (queue capacity, consumer pool size — ``WindowPublisher.java:46-56``)
map here to Spark resource/shuffle configs per SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "reactor-window-like-flink-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Scale posture (SURVEY.md §4.2 item 4):
      - AQE on: runtime coalescing of small shuffle partitions, skew-join
        splitting, and dynamic join-strategy switching — the knobs that keep
        a plan healthy when data is 1000x the test scale.
      - shuffle.partitions sized to cores locally; on a real cluster this is
        overridden (or left to AQE's coalescing with a high initial value).
      - Arrow enabled: every pandas_udf / toPandas crosses the JVM<->Python
        boundary in columnar batches, not row-at-a-time pickles.
      - UTC session timezone: deterministic timestamp semantics vs the
        DuckDB oracle and any parquet writer.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffledHashJoinFactor", "3")
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
