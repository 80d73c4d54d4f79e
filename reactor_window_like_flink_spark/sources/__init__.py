from reactor_window_like_flink_spark.sources.layout import zorder_value, zorder_write
from reactor_window_like_flink_spark.sources.tables import TABLES, load, register_views

__all__ = ["TABLES", "load", "register_views", "zorder_value", "zorder_write"]
