"""Scalar-function and UDF/UDAF/UDTF surface (SURVEY.md §2 Part B keys
34-39, 51)."""

from reactor_window_like_flink_spark.functions.extensions import (
    REG as EXTENSIONS_REG,
)
from reactor_window_like_flink_spark.functions.scalar import REG as SCALAR_REG

__all__ = ["SCALAR_REG", "EXTENSIONS_REG"]
