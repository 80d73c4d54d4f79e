"""Batch table registry over the driver-generated parquet fixtures.

The reference's only "table" is a bounded in-memory SPSC queue
(``WindowPublisher.java:66-68``); our engine's at-rest model is columnar
parquet read through Spark's vectorized reader, with column pruning and
predicate pushdown reaching the scan (SURVEY.md §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any scale.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Keep this a plain ``spark.read.parquet`` so
    Catalyst sees a pushdown-capable scan (no caching layer in the way).

    ``events.ts`` has shipped as two physical layouts across fixture
    generations: parquet TIMESTAMP(NANOS) — which Spark 4 rejects outright
    (PARQUET_TYPE_ILLEGAL) unless read as raw nanos via the legacy conf —
    and plain TIMESTAMP(MICROS), which Spark reads natively as
    TIMESTAMP_NTZ. Normalize both to a session-TZ TIMESTAMP (micros): the
    nanos path rebuilds with exact integer division (``ts / 1000`` in
    double would lose ~7 bits of sub-second precision); the native path is
    a wall-clock-identity cast under the engine's UTC session timezone, so
    downstream ``unix_micros``/``window()`` semantics match the DuckDB
    oracle reading the same file.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":  # legacy TIMESTAMP(NANOS) fixture
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
