"""Relational operator surface (SURVEY.md §2 Part B keys 1-33)."""

from reactor_window_like_flink_spark.operators.relational import REG as RELATIONAL_REG

__all__ = ["RELATIONAL_REG"]
