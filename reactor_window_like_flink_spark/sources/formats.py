"""Additional source formats: schema-explicit CSV and JSON readers.

The engine is schema-explicit by design (SURVEY.md §1.2: inference only at
load); these readers take a mandatory schema so a malformed file fails the
row, not the pipeline, and the scan never pays the double-read of schema
inference — which at 100 TB is a full extra pass."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """ORC source — the other columnar format with predicate pushdown and
    column pruning built into Spark's scan (same PushedFilters/ReadSchema
    machinery as parquet; self-describing, so the schema here is a
    contract check rather than an inference-avoidance necessity)."""
    return spark.read.schema(schema).orc(path)
