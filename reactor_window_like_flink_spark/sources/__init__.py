from reactor_window_like_flink_spark.sources.layout import (
    compact,
    partitioned_write,
    zorder_value,
    zorder_write,
)
from reactor_window_like_flink_spark.sources.tables import TABLES, load, register_views

__all__ = [
    "TABLES",
    "compact",
    "load",
    "partitioned_write",
    "register_views",
    "zorder_value",
    "zorder_write",
]
